"""Graph converter + store round-trip tests.

Mirrors the coverage of the reference's graph store tests
(reference: euler/core/graph/graph_test.cc:92-140 asserts neighbors,
features and sampler distributions on the shared fixture).
"""
import numpy as np
import pytest

from tests import fixtures


def test_meta_roundtrip(toy_graph):
    from euler_tpu.graph import GraphMeta
    meta = toy_graph.meta
    meta2 = GraphMeta.from_json(meta.to_json())
    assert meta2 == meta
    assert meta.n_nodes == 8 and meta.n_edges == 11
    assert meta.node_types == ("item", "user")
    assert meta.edge_types == ("buy", "click")


def test_local_id_compaction(toy_graph):
    assert list(toy_graph.ext_ids) == fixtures.EXT_IDS
    assert toy_graph.local_id(104) == 4
    np.testing.assert_array_equal(toy_graph.local_ids([107, 100]), [7, 0])


def test_csr_groups(toy_graph):
    g = toy_graph.tensors
    meta = toy_graph.meta
    et = {name: i for i, name in enumerate(meta.edge_types)}
    gp = np.asarray(g.group_ptr)
    col = np.asarray(g.adj_dst)
    ET = meta.num_edge_types

    def nbrs(ext_src, etname):
        r = toy_graph.local_id(ext_src)
        t = et[etname]
        lo, hi = gp[r * ET + t], gp[r * ET + t + 1]
        return sorted(toy_graph.ext_ids[col[lo:hi]])

    assert nbrs(100, "click") == [101, 103]
    assert nbrs(100, "buy") == [105]
    assert nbrs(104, "buy") == [101]
    assert nbrs(107, "click") == []
    assert nbrs(107, "buy") == []
    # within-group sorted by dst (membership binary-search invariant)
    for r in range(8):
        for t in range(ET):
            seg = col[gp[r * ET + t]:gp[r * ET + t + 1]]
            assert np.all(np.diff(seg) >= 0)


def test_group_weights(toy_graph):
    g = toy_graph.tensors
    gws = np.asarray(g.group_w_sum)
    r = toy_graph.local_id(100)
    et_click = toy_graph.meta.edge_types.index("click")
    et_buy = toy_graph.meta.edge_types.index("buy")
    assert gws[r, et_click] == pytest.approx(4.0)  # 1 + 3
    assert gws[r, et_buy] == pytest.approx(2.0)
    # total weight conserved
    assert gws.sum() == pytest.approx(sum(w for *_, w in fixtures.EDGES))


def test_features(toy_graph):
    g = toy_graph.tensors
    d = np.asarray(g.dense_nf["dense2"])
    assert d.shape == (8, 2)
    np.testing.assert_allclose(d[toy_graph.local_id(102)], [102.0, 10.2],
                               rtol=1e-6)
    sp, ln = g.sparse_nf["sparse_ids"]
    sp, ln = np.asarray(sp), np.asarray(ln)
    i = toy_graph.local_id(103)  # idx 3 -> 1 + 3%3 = 1 id
    assert ln[i] == 1 and sp[i, 0] == 1030 and sp[i, 1] == -1
    # binary features stay on host
    tags = toy_graph.get_binary_feature([0, 7], ["tag"])[0]
    assert list(tags) == ["n100", "n107"]


def test_edge_features(toy_graph):
    g = toy_graph.tensors
    ed = np.asarray(g.dense_ef["edense"])
    assert ed.shape == (11, 1)
    # edge rows are in original insertion order
    np.testing.assert_allclose(ed[:, 0],
                               [w * 10.0 for *_, w in fixtures.EDGES])
    # adj_eid maps CSR slots back to original rows
    eid = np.asarray(g.adj_eid)
    src = np.asarray(g.adj_src)
    for slot in range(11):
        orig = fixtures.EDGES[eid[slot]]
        assert toy_graph.ext_ids[src[slot]] == orig[0]


def test_alias_tables_distribution():
    from euler_tpu.ops.alias import build_alias_table
    rng = np.random.default_rng(0)
    w = np.array([1.0, 2.0, 3.0, 4.0])
    prob, alias = build_alias_table(w)
    n = 200_000
    u1 = rng.random(n)
    u2 = rng.random(n)
    slot = np.minimum((u1 * 4).astype(int), 3)
    pick = np.where(u2 < prob[slot], slot, alias[slot])
    freq = np.bincount(pick, minlength=4) / n
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)


def test_typed_alias_tables(toy_graph):
    g = toy_graph.tensors
    na = g.node_alias
    ptr = np.asarray(na.type_ptr)
    # 4 items (even ext), 4 users
    assert ptr.tolist() == [0, 4, 8]
    wsum = np.asarray(na.w_sum)
    # item weights: idx 0,2,4,6 -> 1+3+5+7; users: 2+4+6+8
    assert wsum.tolist() == [16.0, 20.0]


def test_partition_roundtrip_matches_single(tmp_path):
    """n_partitions must not change the loaded graph."""
    from euler_tpu.graph import convert_json_graph, load_graph
    d1, d2 = tmp_path / "p1", tmp_path / "p3"
    convert_json_graph(fixtures.toy_graph_json(), str(d1), n_partitions=1)
    convert_json_graph(fixtures.toy_graph_json(), str(d2), n_partitions=3)
    g1, g2 = load_graph(str(d1)), load_graph(str(d2))
    np.testing.assert_array_equal(np.asarray(g1.tensors.group_ptr),
                                  np.asarray(g2.tensors.group_ptr))
    np.testing.assert_array_equal(np.asarray(g1.tensors.adj_dst),
                                  np.asarray(g2.tensors.adj_dst))
    np.testing.assert_allclose(np.asarray(g1.tensors.dense_nf["dense2"]),
                               np.asarray(g2.tensors.dense_nf["dense2"]))
    np.testing.assert_array_equal(np.asarray(g1.tensors.adj_eid),
                                  np.asarray(g2.tensors.adj_eid))


def test_feature_dtype_bf16(toy_dir):
    """feature_dtype stores dense features half-width in HBM; lookups
    return the cast values."""
    import jax.numpy as jnp

    from euler_tpu.graph import load_graph
    from euler_tpu.ops import feature_ops
    g32 = load_graph(toy_dir)
    g16 = load_graph(toy_dir, feature_dtype=jnp.bfloat16)
    for k, v in g16.tensors.dense_nf.items():
        assert v.dtype == jnp.bfloat16
    (a,) = feature_ops.get_dense_feature(g32.tensors, jnp.arange(4),
                                         ["dense2"])
    (b,) = feature_ops.get_dense_feature(g16.tensors, jnp.arange(4),
                                         ["dense2"])
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(b, np.float32),
                               rtol=1e-2, atol=1e-2)
