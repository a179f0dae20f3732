"""Mesh + sharding helpers.

TPU-native counterpart of the reference's distribution config
(reference: ZooKeeper shard discovery zk_server_monitor.h:30 + TF_CONFIG
PS/worker in base_estimator.py:164-166). On TPU the membership problem
disappears: the device set is the static ``jax.sharding.Mesh`` and
placement is a PartitionSpec. Axes:

  'data'  — batch (data parallel)
  'graph' — graph-store shards (the reference's storage partitioning,
            id_split_op.cc:46-48)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * graph
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. GraphTensors of a small graph) on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh):
    """Shard leading batch dim over the 'data' axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def graph_sharding(mesh: Mesh):
    """Sharding for stacked per-shard graph arrays (leading dim = shard)."""
    return NamedSharding(mesh, P("graph"))
