"""euler_tpu — a TPU-native graph learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference graph-learning system (alibaba/euler): a device-resident sharded
property-graph store, jit-compiled weighted sampling / random walks /
message passing, a GNN model zoo, KG embeddings, and SPMD multi-chip
scaling over jax.sharding meshes.
"""

__version__ = "0.1.0"

from euler_tpu.graph import (Graph, GraphMeta, GraphTensors, convert_json_file,
                             convert_json_graph, default_graph,
                             initialize_graph, load_graph)
from euler_tpu.query import Query, register_udf, udf, udf_max, \
    udf_mean, udf_min
