from euler_tpu.graph.meta import BINARY, DENSE, SPARSE, FeatureSpec, GraphMeta
from euler_tpu.graph.convert import (convert_json_file, convert_json_graph,
                                     build_csr)
from euler_tpu.graph.store import (AliasTables, Graph, GraphTensors,
                                   default_graph, initialize_graph, load_graph)
from euler_tpu.graph.stream_convert import (StreamWriter,  # noqa: F401
                                            convert_edge_list,
                                            convert_ndjson)
