"""Sampling op tests: shapes, masks, and empirical distributions.

Mirrors the reference's sampler assertions
(reference: euler/core/graph/graph_test.cc:92-140 distribution checks,
tf_euler/python/euler_ops/{sample,neighbor}_ops_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.ops import feature_ops, sampling
from tests import fixtures


def _et(g, name):
    return g.meta.edge_types.index(name)


def test_sample_node_distribution(toy_graph):
    g = toy_graph.tensors
    key = jax.random.PRNGKey(0)
    item = g.meta.node_types.index("item")
    ids = np.asarray(sampling.sample_node(g, key, 40_000, item))
    assert ids.min() >= 0
    # items are local ids 0,2,4,6 with weights 1,3,5,7
    exts = toy_graph.ext_ids[ids]
    assert set(exts.tolist()) <= {100, 102, 104, 106}
    freq = np.bincount(ids, minlength=8)[[0, 2, 4, 6]] / len(ids)
    np.testing.assert_allclose(freq, np.array([1, 3, 5, 7]) / 16, atol=0.01)


def test_sample_node_all_types(toy_graph):
    g = toy_graph.tensors
    ids = np.asarray(sampling.sample_node(g, jax.random.PRNGKey(1), 40_000,
                                          -1))
    freq = np.bincount(ids, minlength=8) / len(ids)
    np.testing.assert_allclose(freq, np.arange(1, 9) / 36, atol=0.01)


def test_sample_node_with_src(toy_graph):
    g = toy_graph.tensors
    src = jnp.asarray(toy_graph.local_ids([100, 101]))
    out = np.asarray(sampling.sample_node_with_src(
        g, jax.random.PRNGKey(2), src, 50))
    nt = np.asarray(g.node_type)
    assert (nt[out[0]] == nt[src[0]]).all()
    assert (nt[out[1]] == nt[src[1]]).all()


def test_sample_node_with_src_padded_rows(toy_graph):
    # padded (-1) src rows yield -1, matching the sharded path
    # (parallel/sharded.sample_node_with_src_sharded)
    g = toy_graph.tensors
    src = jnp.asarray([toy_graph.local_id(100), -1], jnp.int32)
    out = np.asarray(sampling.sample_node_with_src(
        g, jax.random.PRNGKey(2), src, 8))
    assert (out[0] >= 0).all()
    assert (out[1] == -1).all()


def test_get_full_in_neighbor(toy_graph):
    # in-neighbors of 101: click from 100 (w1), 102 (w2); buy from 104 (w4)
    g = toy_graph.tensors
    nodes = jnp.asarray(toy_graph.local_ids([101, 100, 106]), jnp.int32)
    nbr, w, ty, eid, ok = sampling.get_full_in_neighbor(g, nodes, (0, 1), 6)
    nbr, w, ty, ok = map(np.asarray, (nbr, w, ty, ok))
    exts = toy_graph.ext_ids
    got = {(int(exts[n]), float(wt)) for n, wt, o in
           zip(nbr[0], w[0], ok[0]) if o}
    assert got == {(100, 1.0), (102, 2.0), (104, 4.0)}
    got1 = {(int(exts[n]), float(wt)) for n, wt, o in
            zip(nbr[1], w[1], ok[1]) if o}
    assert got1 == {(101, 1.0), (103, 1.0)}
    assert not ok[2].any()          # 106 has no in-edges
    # types come from the owning group
    et_click = _et(g, "click")
    l100 = toy_graph.local_id(100)
    click_rows = [i for i in range(6) if ok[0][i] and nbr[0][i] == l100]
    assert all(ty[0][i] == et_click for i in click_rows)


def test_sample_in_neighbor_distribution(toy_graph):
    g = toy_graph.tensors
    node = jnp.asarray([toy_graph.local_id(101)], jnp.int32)
    nbr, w, ty, eid = sampling.sample_in_neighbor(
        g, jax.random.PRNGKey(5), node, (0, 1), 30_000)
    nbr = np.asarray(nbr)[0]
    exts = toy_graph.ext_ids[nbr]
    freq = {e: (exts == e).mean() for e in (100, 102, 104)}
    np.testing.assert_allclose([freq[100], freq[102], freq[104]],
                               np.array([1, 2, 4]) / 7, atol=0.01)


def test_get_top_k_in_neighbor(toy_graph):
    g = toy_graph.tensors
    node = jnp.asarray([toy_graph.local_id(101)], jnp.int32)
    nbr, w, ty, eid, ok = sampling.get_top_k_in_neighbor(g, node, (0, 1), 2)
    exts = toy_graph.ext_ids[np.asarray(nbr)[0]]
    np.testing.assert_array_equal(exts, [104, 102])
    np.testing.assert_allclose(np.asarray(w)[0], [4.0, 2.0])


def test_in_neighbor_requires_in_csr():
    from euler_tpu.datasets.random_graph import random_graph
    g = random_graph(20, 3, build_in_edges=False).tensors
    with pytest.raises(ValueError, match="has_in_edges"):
        sampling.sample_in_neighbor(g, jax.random.PRNGKey(0),
                                    jnp.asarray([0]), (0,), 4)


def test_sample_edge(toy_graph):
    g = toy_graph.tensors
    et_buy = _et(g, "buy")
    src, dst, ty, eid = sampling.sample_edge(g, jax.random.PRNGKey(3),
                                             20_000, et_buy)
    src, dst, ty, eid = map(np.asarray, (src, dst, ty, eid))
    assert (ty == et_buy).all()
    # (104->101, w4) should be the most frequent buy edge (4 of 10 weight)
    pair = src * 100 + dst
    l104, l101 = toy_graph.local_id(104), toy_graph.local_id(101)
    frac = (pair == l104 * 100 + l101).mean()
    np.testing.assert_allclose(frac, 0.4, atol=0.02)
    # eids consistent with the fixture edge list
    for s, d, e in zip(src[:50], dst[:50], eid[:50]):
        es, ed, _, _ = fixtures.EDGES[e]
        assert toy_graph.ext_ids[s] == es and toy_graph.ext_ids[d] == ed


def test_sample_neighbor_weighted(toy_graph):
    g = toy_graph.tensors
    et = _et(g, "click")
    nodes = jnp.asarray([toy_graph.local_id(100)])
    nbr, w, ty, eid = sampling.sample_neighbor(
        g, jax.random.PRNGKey(4), nodes, (et,), 20_000)
    nbr = np.asarray(nbr)[0]
    exts = toy_graph.ext_ids[nbr]
    freq103 = (exts == 103).mean()
    np.testing.assert_allclose(freq103, 0.75, atol=0.02)  # w3 vs w1


def test_sample_neighbor_union_of_types(toy_graph):
    g = toy_graph.tensors
    ets = (_et(g, "click"), _et(g, "buy"))
    nodes = jnp.asarray([toy_graph.local_id(100)])
    nbr, w, ty, eid = sampling.sample_neighbor(
        g, jax.random.PRNGKey(5), nodes, ets, 30_000)
    exts = toy_graph.ext_ids[np.asarray(nbr)[0]]
    # weights: 101:1, 103:3 (click), 105:2 (buy) => total 6
    np.testing.assert_allclose((exts == 103).mean(), 3 / 6, atol=0.02)
    np.testing.assert_allclose((exts == 105).mean(), 2 / 6, atol=0.02)


def test_sample_neighbor_empty_pads_default(toy_graph):
    g = toy_graph.tensors
    nodes = jnp.asarray([toy_graph.local_id(107), -1])
    nbr, w, ty, eid = sampling.sample_neighbor(
        g, jax.random.PRNGKey(6), nodes, (0, 1), 5, default_id=-1)
    assert (np.asarray(nbr) == -1).all()
    assert (np.asarray(w) == 0).all()
    assert (np.asarray(eid) == -1).all()


def test_get_full_neighbor(toy_graph):
    g = toy_graph.tensors
    ets = (_et(g, "click"), _et(g, "buy"))
    nodes = jnp.asarray(toy_graph.local_ids([100, 107]))
    nbr, w, ty, eid, mask = sampling.get_full_neighbor(g, nodes, ets, cap=8)
    nbr, mask = np.asarray(nbr), np.asarray(mask)
    got = sorted(toy_graph.ext_ids[nbr[0][mask[0]]].tolist())
    assert got == [101, 103, 105]
    assert mask[1].sum() == 0
    # sorted variant orders by id
    nbr_s, *_, mask_s = sampling.get_full_neighbor(g, nodes, ets, cap=8,
                                                   sorted_by_id=True)
    valid = np.asarray(nbr_s)[0][np.asarray(mask_s)[0]]
    assert list(valid) == sorted(valid.tolist())


def test_get_top_k_neighbor(toy_graph):
    g = toy_graph.tensors
    ets = (_et(g, "click"), _et(g, "buy"))
    nodes = jnp.asarray([toy_graph.local_id(100)])
    nbr, w, ty, eid, mask = sampling.get_top_k_neighbor(g, nodes, ets, k=2,
                                                        cap=8)
    exts = sorted(toy_graph.ext_ids[np.asarray(nbr)[0]].tolist())
    assert exts == [103, 105]  # weights 3 and 2 beat 1


def test_sample_fanout_shapes(toy_graph):
    g = toy_graph.tensors
    nodes = jnp.asarray(toy_graph.local_ids([100, 102, 104]))
    hop_nodes, hop_w, hop_ty, hop_eid = sampling.sample_fanout(
        g, jax.random.PRNGKey(7), nodes, [(0, 1), (0, 1)], [3, 2])
    assert hop_nodes[0].shape == (3,)
    assert hop_nodes[1].shape == (9,)
    assert hop_nodes[2].shape == (18,)
    assert hop_w[0].shape == (9,)


def test_sample_fanout_jit(toy_graph):
    g = toy_graph.tensors
    f = jax.jit(lambda g, k, n: sampling.sample_fanout(
        g, k, n, [(0, 1)], [4]))
    hop_nodes, *_ = f(g, jax.random.PRNGKey(8),
                      jnp.asarray([0, 1], jnp.int32))
    assert hop_nodes[1].shape == (8,)


def test_node_type(toy_graph):
    g = toy_graph.tensors
    nodes = jnp.asarray([0, 1, -1], jnp.int32)
    ty = np.asarray(sampling.get_node_type(g, nodes))
    item = g.meta.node_types.index("item")
    user = g.meta.node_types.index("user")
    assert ty.tolist() == [item, user, -1]


def test_dense_feature(toy_graph):
    g = toy_graph.tensors
    nodes = jnp.asarray([toy_graph.local_id(102), -1], jnp.int32)
    (d,) = feature_ops.get_dense_feature(g, nodes, ["dense2"])
    np.testing.assert_allclose(np.asarray(d),
                               [[102.0, 10.2], [0.0, 0.0]], rtol=1e-5)


def test_sparse_feature(toy_graph):
    g = toy_graph.tensors
    nodes = jnp.asarray([toy_graph.local_id(103)], jnp.int32)
    ((ids, mask),) = feature_ops.get_sparse_feature(g, nodes, ["sparse_ids"])
    ids, mask = np.asarray(ids), np.asarray(mask)
    assert ids[0, 0] == 1030 and mask[0, 0] and not mask[0, 1]


def test_edge_features_via_eid(toy_graph):
    g = toy_graph.tensors
    src, dst, ty, eid = sampling.sample_edge(g, jax.random.PRNGKey(9), 32, -1)
    (d,) = feature_ops.get_edge_dense_feature(g, eid, ["edense"])
    d, eid = np.asarray(d), np.asarray(eid)
    for i in range(32):
        assert d[i, 0] == fixtures.EDGES[eid[i]][3] * 10.0


def test_sample_neighbor_fast_weighted(toy_graph):
    """Fast fan-row path reproduces the exact weighted distribution for
    small groups (deg <= FAN_D, exact in-row alias tables)."""
    g = toy_graph.tensors
    et = _et(g, "click")
    nodes = jnp.asarray([toy_graph.local_id(100)])
    nbr, valid = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(4), nodes, (et,), 20_000)
    assert bool(np.asarray(valid).all())
    exts = toy_graph.ext_ids[np.asarray(nbr)[0]]
    np.testing.assert_allclose((exts == 103).mean(), 0.75, atol=0.02)


def test_sample_neighbor_fast_union_and_padding(toy_graph):
    g = toy_graph.tensors
    ets = (_et(g, "click"), _et(g, "buy"))
    nodes = jnp.asarray([toy_graph.local_id(100), toy_graph.local_id(107),
                         -1])
    nbr, valid = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(5), nodes, ets, 30_000)
    nbr, valid = np.asarray(nbr), np.asarray(valid)
    # node 107 has no out-edges; -1 is padding
    assert not valid[1].any() and (nbr[1] == -1).all()
    assert not valid[2].any()
    # node 100: click w(101)=1, w(103)=3; buy w(105)=2 -> total 6
    exts = toy_graph.ext_ids[nbr[0]]
    freq = {e: (exts == e).mean() for e in (101, 103, 105)}
    np.testing.assert_allclose(
        [freq[101], freq[103], freq[105]], [1 / 6, 3 / 6, 2 / 6], atol=0.02)


def test_sample_neighbor_fast_return_types(toy_graph):
    """typed fast path: each draw's reported edge type is a true type of
    a (root -> nbr) edge, -1 exactly on invalid draws, and the drawn
    (nbr, type) frequencies follow the union-weighted distribution —
    matching the payload verb with zero payload gathers."""
    from tests.fixtures import EDGES
    g = toy_graph.tensors
    ets = (_et(g, "click"), _et(g, "buy"))
    nodes = jnp.asarray([toy_graph.local_id(100), toy_graph.local_id(107),
                         -1])
    nbr, valid, ty = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(6), nodes, ets, 30_000, return_types=True)
    nbr, valid, ty = np.asarray(nbr), np.asarray(valid), np.asarray(ty)
    assert ((ty == -1) == ~valid).all()
    # legal (dst_ext, type_name) pairs out of node 100
    legal = {(d, t) for s, d, t, w in EDGES if s == 100}
    names = toy_graph.meta.edge_types
    exts = toy_graph.ext_ids[np.maximum(nbr[0], 0)]
    pairs = {(int(e), names[int(t)]) for e, t in zip(exts, ty[0])}
    assert pairs <= legal
    # weighted across the union: click(101 w1, 103 w3) + buy(105 w2)
    freq_buy = (ty[0] == _et(g, "buy")).mean()
    np.testing.assert_allclose(freq_buy, 2 / 6, atol=0.02)
    # single-type call broadcasts that type
    _, v1, t1 = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(7), nodes, (_et(g, "click"),), 8,
        return_types=True)
    t1, v1 = np.asarray(t1), np.asarray(v1)
    assert (t1[v1] == _et(g, "click")).all() and (t1[~v1] == -1).all()


def test_fan_pack_reservoir_marginal():
    """Groups with deg > FAN_D use reservoir rows; per-draw marginal stays
    the exact weighted distribution, and refresh_fan_pack redraws them."""
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.ops.alias import FAN_D

    # one hub node with 4*FAN_D neighbors of linear weights via direct build
    import euler_tpu.graph.convert as convert
    from euler_tpu.graph.meta import GraphMeta
    from euler_tpu.graph.store import Graph

    deg = 4 * FAN_D
    nodes = [{"id": i, "type": "n", "weight": 1.0, "features": []}
             for i in range(deg + 1)]
    edges = [{"src": 0, "dst": j + 1, "type": "e", "weight": float(j + 1),
              "features": []} for j in range(deg)]
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "out")
        convert.convert_json_graph({"nodes": nodes, "edges": edges}, out,
                                   n_partitions=1)
        from euler_tpu.graph.store import load_graph
        graph = load_graph(out)
    g = graph.tensors
    n0 = jnp.asarray([graph.local_id(0)], jnp.int32)
    nbr, valid = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(6), n0, (0,), 50_000)
    assert bool(np.asarray(valid).all())
    exts = graph.ext_ids[np.asarray(nbr)[0]]
    w = np.arange(1, deg + 1, dtype=np.float64)
    expect = w / w.sum()
    # reservoir of FAN_D draws -> empirical freq matches within reservoir
    # noise; refresh and accumulate to tighten the estimate
    freqs = np.zeros(deg)
    K = 48
    for i in range(K):
        g = sampling.refresh_fan_pack(g, jax.random.PRNGKey(100 + i))
        nbr, _ = sampling.sample_neighbor_fast(
            g, jax.random.PRNGKey(7 + i), n0, (0,), 50_000)
        exts = graph.ext_ids[np.asarray(nbr)[0]]
        freqs += np.bincount(exts - 1, minlength=deg) / len(exts)
    freqs /= K
    # aggregate over refreshes converges to the exact distribution
    # (noise ~ sqrt(p/ (K*FAN_D)) ~ 0.0024 at p=0.012; 4-sigma bound)
    np.testing.assert_allclose(freqs, expect, atol=0.01)


def test_union_fan_pack_distribution_and_refresh(toy_graph):
    """'fanu' pack: one union row per node; multi-type draws decode
    (type, id) from packed lanes with the exact union-weighted
    distribution; the payload verb's types/ids agree; reservoir rows
    refresh."""
    import jax
    from euler_tpu.graph.store import Graph
    from tests.fixtures import EDGES, toy_graph_json
    from euler_tpu.graph import convert
    import tempfile, os
    d = tempfile.mkdtemp()
    convert.convert_json_graph(toy_graph_json(), d, n_partitions=1)
    from euler_tpu.graph.store import load_graph
    gph = load_graph(d, packs=("group", "fanu"))
    g = gph.tensors
    assert g.fanu_pack is not None and g.fan_pack is None
    ets = (0, 1)
    nodes = jnp.asarray([gph.local_id(100), gph.local_id(107), -1],
                        jnp.int32)
    nbr, valid, ty = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(8), nodes, ets, 30_000, return_types=True)
    nbr, valid, ty = np.asarray(nbr), np.asarray(valid), np.asarray(ty)
    assert not valid[1].any() and not valid[2].any()
    assert ((ty == -1) == ~valid).all()
    # node 100 union: click w(101)=1, w(103)=3; buy w(105)=2 -> total 6
    exts = gph.ext_ids[np.maximum(nbr[0], 0)]
    names = gph.meta.edge_types
    legal = {(d_, t) for s, d_, t, w in EDGES if s == 100}
    assert {(int(e), names[int(t)])
            for e, t in zip(exts, ty[0])} <= legal
    freq = {e: (exts == e).mean() for e in (101, 103, 105)}
    np.testing.assert_allclose(
        [freq[101], freq[103], freq[105]], [1 / 6, 3 / 6, 2 / 6],
        atol=0.02)
    # refresh runs and keeps the pack shape (toy groups are all exact,
    # so values are unchanged; just exercise the path)
    g2 = sampling.refresh_fan_pack(g, jax.random.PRNGKey(9))
    assert g2.fanu_pack.shape == g.fanu_pack.shape
    n2, v2, t2 = sampling.sample_neighbor_fast(
        g2, jax.random.PRNGKey(10), nodes, ets, 64, return_types=True)
    assert np.asarray(v2)[0].all()
