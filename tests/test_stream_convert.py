"""Streaming converter + partition/shard decoupling
(reference: generate_euler_data.py incremental per-partition writes;
(id % partition_number) % shard_num routing, id_split_op.cc:46-48)."""
import json
import os
import tracemalloc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.graph import convert, load_graph, stream_convert
from euler_tpu.ops import sampling


def _random_json_graph(n=60, m=400, seed=0):
    rng = np.random.default_rng(seed)
    nodes = [{"id": i, "type": "a" if i % 3 else "b",
              "weight": float(rng.integers(1, 5)),
              "features": [
                  {"name": "f", "type": "dense",
                   "value": [float(i), float(i) * 0.5]},
                  {"name": "sp", "type": "sparse",
                   "value": [int(x) for x in
                             rng.integers(0, 50, 3)]}]}
             for i in range(n)]
    edges = [{"src": int(rng.integers(0, n)), "dst": int(rng.integers(0, n)),
              "type": "e" + str(int(rng.integers(0, 2))),
              "weight": float(rng.integers(1, 4)),
              "features": [{"name": "ef", "type": "dense",
                            "value": [float(k)]}]}
             for k in range(m)]
    return {"nodes": nodes, "edges": edges}


def test_ndjson_stream_matches_bulk_converter(tmp_path):
    g = _random_json_graph()
    bulk = tmp_path / "bulk"
    convert.convert_json_graph(g, str(bulk), n_partitions=2)

    nd = tmp_path / "g.ndjson"
    with open(nd, "w") as f:
        for n in g["nodes"]:
            f.write(json.dumps(n) + "\n")
        for e in g["edges"]:
            f.write(json.dumps(e) + "\n")
    streamed = tmp_path / "streamed"
    os.makedirs(streamed)
    stream_convert.convert_ndjson(str(nd), str(streamed),
                                  n_partitions=2, chunk_size=37)

    gb = load_graph(str(bulk)).tensors
    gs = load_graph(str(streamed)).tensors
    assert gb.meta.n_nodes == gs.meta.n_nodes
    assert gb.meta.n_edges == gs.meta.n_edges
    assert gb.meta.node_types == gs.meta.node_types
    np.testing.assert_array_equal(np.asarray(gb.node_type),
                                  np.asarray(gs.node_type))
    np.testing.assert_allclose(np.asarray(gb.node_w),
                               np.asarray(gs.node_w))
    np.testing.assert_array_equal(np.asarray(gb.group_ptr),
                                  np.asarray(gs.group_ptr))
    # same multiset of (slot -> dst) per group; CSR tie order among
    # duplicate (src,etype,dst) may differ between converters
    np.testing.assert_array_equal(np.sort(np.asarray(gb.adj_dst)),
                                  np.sort(np.asarray(gs.adj_dst)))
    np.testing.assert_allclose(np.asarray(gb.dense_nf["f"]),
                               np.asarray(gs.dense_nf["f"]))
    ids_b, len_b = gb.sparse_nf["sp"]
    ids_s, len_s = gs.sparse_nf["sp"]
    np.testing.assert_array_equal(np.asarray(ids_b), np.asarray(ids_s))
    # edge feature rows are eid-indexed in both
    np.testing.assert_allclose(np.asarray(gb.dense_ef["ef"]),
                               np.asarray(gs.dense_ef["ef"]))


def test_edge_list_front_end(tmp_path):
    p = tmp_path / "el.txt"
    with open(p, "w") as f:
        f.write("# comment\n")
        for s, d in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]:
            f.write(f"{s}\t{d}\t2.0\n")
    out = tmp_path / "el_out"
    os.makedirs(out)
    meta = stream_convert.convert_edge_list(str(p), str(out),
                                            n_partitions=2)
    assert meta.n_nodes == 4 and meta.n_edges == 5
    g = load_graph(str(out)).tensors
    nbr, w, ty, eid = sampling.sample_neighbor(
        g, jax.random.PRNGKey(0), jnp.asarray([0, 1]), (0,), 8)
    assert set(np.asarray(nbr)[0][np.asarray(w)[0] > 0].tolist()) <= {1, 2}


def test_stream_writer_bounded_memory(tmp_path):
    """Peak host memory stays O(chunk + largest partition), far below
    the whole-graph size (the papers100M-scale contract, scaled down)."""
    out = tmp_path / "big"
    os.makedirs(out)
    n, m, chunk, P = 400_000, 2_000_000, 100_000, 8
    rng = np.random.default_rng(0)

    tracemalloc.start()
    w = stream_convert.StreamWriter(str(out), n_partitions=P,
                                    build_in_edges=False)
    for lo in range(0, m, chunk):
        c = min(chunk, m - lo)
        w.add_edges(rng.integers(0, n, c), rng.integers(0, n, c),
                    weights=np.ones(c, np.float32))
    w.finalize()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # whole graph ~= 2M * 5 cols * 4B = 40MB before any sort copies;
    # streaming peak must stay well under half of it
    assert peak < 20 * 2 ** 20, f"peak {peak/2**20:.1f} MiB"

    with open(os.path.join(out, "meta.json")) as f:
        meta_d = json.loads(f.read())
    assert meta_d["n_edges"] == m and meta_d["n_nodes"] == n


def test_load_sharded_on_different_mesh_size(tmp_path):
    """An 8-partition shard set loads on a 4-shard mesh (and a
    2-partition set on 4 shards) identically to build_sharded."""
    from euler_tpu.parallel import distributed, sharded
    g = _random_json_graph(seed=2)
    for P in (8, 2):
        gdir = tmp_path / f"gp{P}"
        convert.convert_json_graph(g, str(gdir), n_partitions=P,
                                   build_in_edges=False)
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:4]).reshape(1, 4),
            ("data", "graph"))
        sg_load = distributed.load_graph_sharded(str(gdir), mesh)
        sg_ref = sharded.build_sharded(load_graph(str(gdir)), 4)
        np.testing.assert_array_equal(np.asarray(sg_load.node_type),
                                      np.asarray(sg_ref.node_type))
        np.testing.assert_array_equal(np.asarray(sg_load.group_ptr),
                                      np.asarray(sg_ref.group_ptr))
        np.testing.assert_array_equal(np.asarray(sg_load.adj_dst),
                                      np.asarray(sg_ref.adj_dst))
        np.testing.assert_allclose(np.asarray(sg_load.shard_node_w),
                                   np.asarray(sg_ref.shard_node_w),
                                   rtol=1e-6)
        for k in sg_ref.dense_nf:
            np.testing.assert_allclose(
                np.asarray(sg_load.dense_nf[k]),
                np.asarray(sg_ref.dense_nf[k]), rtol=1e-6)


def test_stream_then_load_sharded(tmp_path):
    """End-to-end papers100M shape: stream-convert an edge list with 8
    partitions, then load it sharded on a 4-shard mesh and sample."""
    from euler_tpu.parallel import distributed, sharded as sharded_lib
    from jax.sharding import PartitionSpec as P

    out = tmp_path / "sl"
    os.makedirs(out)
    rng = np.random.default_rng(3)
    w = stream_convert.StreamWriter(str(out), n_partitions=8,
                                    build_in_edges=False)
    for _ in range(4):
        w.add_edges(rng.integers(0, 100, 500), rng.integers(0, 100, 500))
    w.finalize()
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:4]).reshape(1, 4), ("data", "graph"))
    sg = distributed.load_graph_sharded(str(out), mesh)
    gspecs = sharded_lib.shard_specs(sg)

    def body(sgb, key):
        view = sharded_lib.to_view(sgb, "graph")
        roots = sampling.sample_node(view, key, 16, -1)
        nbr, _w, ty, eid = sampling.sample_neighbor(view, key, roots,
                                                    (0,), 4)
        return roots, nbr
    with mesh:
        roots, nbr = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(gspecs, P()), out_specs=P(),
            check_vma=False))(sg, jax.random.PRNGKey(0))
    roots, nbr = np.asarray(roots), np.asarray(nbr)
    assert ((roots >= 0) & (roots < 100)).all()
    assert ((nbr >= -1) & (nbr < 100)).all()
