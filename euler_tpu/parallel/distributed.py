"""Multi-host distribution: process init, global meshes, per-host loading.

TPU-native counterpart of the reference's multi-server deployment
(reference: N shard servers behind gRPC, euler/service/grpc_server.h:38,
each calling ``Graph::Init(shard_idx, shard_num, ...)`` on only its own
partition files; clients discover shards via ZooKeeper and scatter/gather
queries, euler/client/query_proxy.cc:93-145). On TPU the server fleet
becomes one SPMD program over a multi-process ``jax.distributed`` job:

  * :func:`initialize` — one call per process (the ZK registration role);
  * :func:`make_global_mesh` — a Mesh over ALL processes' devices with the
    ('data', 'graph') axes the parallel.train step expects; with the graph
    axis laid out so consecutive shards sit on one host's devices first
    (cross-shard psum/all_gather rides ICI before DCN);
  * :func:`load_graph_sharded` — each process reads ONLY the partition
    files its local devices own (the GraphBuilder-per-server role,
    graph_builder.cc:57-157) and the global stacked arrays are assembled
    with ``jax.make_array_from_callback`` — no host ever holds the whole
    graph.

Single-process multi-device use works too (mesh over local devices,
every shard loaded locally) — the same code path the tests exercise with
``XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from euler_tpu.graph import convert as _convert
from euler_tpu.graph.meta import BINARY, DENSE, SPARSE, GraphMeta
from euler_tpu.graph.store import string_hash32
from euler_tpu.parallel.sharded import (ShardedGraphTensors,
                                        _build_shard_core,
                                        _pad_shard_fields, assemble_sharded)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the multi-process job (call once per process, before any jax
    device use). On Cloud TPU all arguments auto-detect from the
    environment; set them explicitly for CPU test jobs.

    The reference's equivalent is ZK registration at server start
    (euler/common/zk_server_register.cc) + client shard discovery
    (zk_server_monitor.h:30); here membership is static and XLA's
    collectives replace the RPC mesh.
    """
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def make_global_mesh(data: int = 1, graph: Optional[int] = None) -> Mesh:
    """('data', 'graph') mesh over every device in the job.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (data, graph) with ``data`` = number of device "rows" keeps each graph
    group's shards contiguous across a host's local devices first — the
    owner-combine collectives of parallel.sharded then ride ICI within a
    host and cross DCN only between hosts that share a graph group.
    """
    devices = np.asarray(jax.devices())
    total = devices.size
    if graph is None:
        graph = total // data
    if data * graph != total:
        raise ValueError(
            f"mesh ({data}, {graph}) != {total} global devices")
    return Mesh(devices.reshape(data, graph), ("data", "graph"))


def sync_hosts(name: str = "euler_tpu_sync") -> None:
    """Barrier across processes (reference: SyncExitHook role,
    tf_euler/python/utils/hooks.py:26-40)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def _my_shard_ids(mesh: Mesh, S: int):
    """Shard indices this process's devices own under P('graph')."""
    sharding = NamedSharding(mesh, P("graph"))
    idx_map = sharding.addressable_devices_indices_map((S,))
    return sorted({(sl[0].start or 0) for sl in idx_map.values()})


def _part_fields(meta: GraphMeta, S: int, n_max: int, e_max: int,
                 part: Dict[str, np.ndarray]):
    """One partition file -> one shard's padded field pytree."""
    own_type = part["node_type"]
    own_w = part["node_w"]
    core = _build_shard_core(
        meta, own_type, own_w, part["src"] // S, part["dst"],
        part["etype"], part["ew"], part["eid"])
    perm = core["perm"]

    dense_nf, sparse_nf, binary_hash = {}, {}, {}
    for spec in meta.node_features:
        if spec.kind == DENSE:
            dense_nf[spec.name] = part[f"nf_d:{spec.name}"]
        elif spec.kind == SPARSE:
            sparse_nf[spec.name] = (part[f"nf_sp:{spec.name}"],
                                    part[f"nf_splen:{spec.name}"])
        else:
            binary_hash[spec.name] = np.asarray(
                [string_hash32(v) for v in part[f"nf_bin:{spec.name}"]],
                np.int32)
    dense_ef, sparse_ef = {}, {}
    for spec in meta.edge_features:
        if spec.kind == DENSE:
            dense_ef[spec.name] = part[f"ef_d:{spec.name}"][perm]
        elif spec.kind == SPARSE:
            sparse_ef[spec.name] = (part[f"ef_sp:{spec.name}"][perm],
                                    part[f"ef_splen:{spec.name}"][perm])
    return core, _pad_shard_fields(
        meta, core, n_max, e_max, own_type, own_w,
        dense_nf, sparse_nf, binary_hash, dense_ef, sparse_ef)


def _shard_part(path: str, meta: GraphMeta, s: int, S: int):
    """Shard s's raw rows, re-routed from the partition files.

    Partitioning is ``local_id % n_partitions`` and shard ownership is
    ``local_id % S``; when P != S, shard s's nodes live exactly in the
    partitions ``p ≡ s (mod gcd(P, S))`` (CRT), so only those files are
    read and their rows filtered — the reference decouples partition
    count from shard count with the same double modulo
    ``(id % partition_number) % shard_num`` (id_split_op.cc:46-48).
    """
    import math

    P_ = meta.n_partitions
    from euler_tpu.utils import io as _io

    def rd(p):
        with _io.open_file(_io.join(path, f"part_{p}.npz"), "rb") as fh:
            return dict(np.load(fh, allow_pickle=False))

    if P_ == S:
        return rd(s)
    g = math.gcd(P_, S)
    chunks = []
    for p in range(s % g, P_, g):
        part = rd(p)
        nsel = (part["node_local"] % S) == s
        esel = (part["src"] % S) == s
        out = {}
        for k, v in part.items():
            if k.startswith(("ef_", "src", "dst", "etype", "ew", "eid")):
                out[k] = v[esel]
            else:
                out[k] = v[nsel]
        chunks.append(out)
    merged = {k: np.concatenate([c[k] for c in chunks])
              for k in chunks[0]}
    # node rows are positional (local row = v // S): restore ascending
    # global-id order after the partition-major concatenation
    order = np.argsort(merged["node_local"], kind="stable")
    edge_keys = ("src", "dst", "etype", "ew", "eid")
    for k in merged:
        if not (k.startswith("ef_") or k in edge_keys):
            merged[k] = merged[k][order]
    return merged


def load_graph_sharded(path: str, mesh: Mesh) -> ShardedGraphTensors:
    """Per-host sharded load: read only the partitions this process's
    devices own; assemble the distributed stacked arrays.

    The partition count need NOT equal the mesh 'graph' axis: rows are
    re-routed at load by ``local_id % S`` (see _shard_part), so an
    8-partition shard set loads on a 4- or 16-shard mesh unchanged.
    """
    from euler_tpu.utils import io as _io
    with _io.open_file(_io.join(path, _convert.META_FILE), "r") as f:
        meta = GraphMeta.from_json(f.read())
    S = mesh.shape["graph"]
    NT, ET = meta.num_node_types, meta.num_edge_types
    n_max = -(-meta.n_nodes // S)

    mine = _my_shard_ids(mesh, S)
    # parallel per-shard partition reads (graph_builder.cc:57-157 role)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(mine)))) as ex:
        parts = dict(zip(mine, ex.map(
            lambda s: _shard_part(path, meta, s, S), mine)))

    if meta.n_partitions == S and meta.part_edge_counts is not None:
        e_max = max(1, *meta.part_edge_counts)
    else:
        # the stacked arrays need ONE global e_max: agree on the max
        # per-shard edge count across processes
        e_max = max([1] + [len(p["eid"]) for p in parts.values()])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            e_max = int(np.asarray(multihost_utils.process_allgather(
                np.asarray([e_max]))).max())

    fields_by_shard = {}
    node_w_tab = np.zeros((S, NT), np.float32)
    edge_w_tab = np.zeros((S, ET), np.float32)
    for s in mine:
        core, fields = _part_fields(meta, S, n_max, e_max, parts[s])
        fields_by_shard[s] = fields
        node_w_tab[s] = core["node_w_row"]
        edge_w_tab[s] = core["edge_w_row"]

    if jax.process_count() > 1:
        # the replicated proportional-sampling tables need every shard's
        # row (query_proxy.cc:93-145). Combine per-process partials with
        # max, not sum: when the 'data' axis spans processes two processes
        # hold identical copies of a shard's row (sum would double-count).
        from jax.experimental import multihost_utils
        node_w_tab = np.asarray(
            multihost_utils.process_allgather(node_w_tab)).max(axis=0)
        edge_w_tab = np.asarray(
            multihost_utils.process_allgather(edge_w_tab)).max(axis=0)

    return assemble_sharded(meta, S, fields_by_shard, node_w_tab,
                            edge_w_tab, mesh=mesh)


def health_check(mesh: Mesh, timeout_s: float = 60.0) -> dict:
    """Device-mesh liveness probe: run one tiny psum over every mesh
    axis with a deadline.

    The failure-detection role of the reference's RPC stack (bad-host
    marking + retry, rpc_manager.h:94-107; ZK ephemeral membership,
    zk_server_monitor.h:38-56): under static SPMD there is nothing to
    fail over TO, but a job can still detect a wedged chip/host before
    launching hours of training. Runs the collective on a worker thread
    so a dead device cannot block the caller past ``timeout_s``.

    Returns {"ok": bool, "latency_s": float | None, "devices": int,
    "error": str | None}. NB: on a genuinely wedged backend the worker
    thread may linger after the deadline — treat ok=False as "abort the
    job", not "retry immediately".
    """
    import threading

    import jax.numpy as jnp

    result = {"ok": False, "latency_s": None,
              "devices": int(np.prod(list(mesh.shape.values()))),
              "error": None}
    done = threading.Event()

    def probe():
        try:
            import time as _t
            t0 = _t.monotonic()
            spec = P(*mesh.axis_names)
            n = result["devices"]
            x = jax.device_put(
                np.arange(n, dtype=np.float32),
                NamedSharding(mesh, P(mesh.axis_names[-1]))
                if n == mesh.shape[mesh.axis_names[-1]]
                else NamedSharding(mesh, P()))
            total = float(jnp.sum(x * 0 + 1))
            result["latency_s"] = round(_t.monotonic() - t0, 3)
            result["ok"] = True
        except Exception as e:  # noqa: BLE001 — report, don't raise
            result["error"] = repr(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        result["error"] = f"mesh unresponsive after {timeout_s}s"
    return result
