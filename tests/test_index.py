"""Attribute-index / conditional-sampling tests (reference coverage:
euler/core/index/*_test.cc — hash/range search, union/intersection,
weighted sampling of results)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.ops.index import (Pred, dnf_mask, query_index_ids,
                                 sample_node_with_condition)


def test_range_predicates(toy_graph):
    g = toy_graph.tensors
    # price = idx*2.5 for idx 0..7
    m = np.asarray(dnf_mask(g, [[Pred("price", "gt", 10.0)]]))
    np.testing.assert_array_equal(np.nonzero(m)[0], [5, 6, 7])
    m = np.asarray(dnf_mask(g, [[Pred("price", "ge", 10.0),
                                 Pred("price", "lt", 16.0)]]))
    np.testing.assert_array_equal(np.nonzero(m)[0], [4, 5, 6])


def test_hash_eq_on_binary(toy_graph):
    g = toy_graph.tensors
    m = np.asarray(dnf_mask(g, [[Pred("tag", "eq", "n103")]]))
    np.testing.assert_array_equal(np.nonzero(m)[0],
                                  [toy_graph.local_id(103)])


def test_in_and_dnf_or(toy_graph):
    g = toy_graph.tensors
    dnf = [[Pred("node_type", "eq", "item"), Pred("price", "lt", 5.0)],
           [Pred("tag", "in", ("n105", "n107"))]]
    m = np.asarray(dnf_mask(g, dnf))
    # items with price<5: idx 0 (0.0), 2? price idx2=5.0 not <5 -> idx 0;
    # wait items are idx 0,2,4,6 with price 0,5,10,15 -> only idx 0
    assert set(np.nonzero(m)[0].tolist()) == {0, 5, 7}


def test_conditional_sampling_distribution(toy_graph):
    g = toy_graph.tensors
    # nodes with price > 5 -> idx 3..7, weights 4..8
    dnf = [[Pred("price", "gt", 5.0)]]
    ids = np.asarray(sample_node_with_condition(
        g, jax.random.PRNGKey(0), 40_000, dnf))
    assert set(ids.tolist()) <= {3, 4, 5, 6, 7}
    freq = np.bincount(ids, minlength=8)[3:] / len(ids)
    np.testing.assert_allclose(freq, np.arange(4, 9) / 30, atol=0.01)


def test_conditional_sampling_empty(toy_graph):
    g = toy_graph.tensors
    ids = np.asarray(sample_node_with_condition(
        g, jax.random.PRNGKey(1), 16, [[Pred("price", "gt", 1e9)]]))
    assert (ids == -1).all()


def test_query_index_ids(toy_graph):
    g = toy_graph.tensors
    ids, mask = query_index_ids(g, [[Pred("node_type", "eq", "user")]],
                                cap=8)
    got = sorted(np.asarray(ids)[np.asarray(mask)].tolist())
    assert got == [1, 3, 5, 7]


def test_condition_under_jit(toy_graph):
    g = toy_graph.tensors
    dnf = [[Pred("price", "le", 7.5)]]
    f = jax.jit(lambda g, k: sample_node_with_condition(g, k, 64, dnf))
    ids = np.asarray(f(g, jax.random.PRNGKey(2)))
    assert set(ids.tolist()) <= {0, 1, 2, 3}


def test_attr_index_sampling_matches_mask_path(toy_graph):
    """Prebuilt AttrIndex (sorted ids + weight prefix sums) must
    reproduce the mask path's conditional distribution for every
    operator — the device-resident Hash/RangeSampleIndex
    (hash_sample_index.h:41-68, range_sample_index.h)."""
    from euler_tpu.ops.index import build_attr_index, indexed_sample
    g = build_attr_index(toy_graph.tensors, ["price", "node_type"])
    assert "price:0" in g.node_index
    cases = [Pred("price", "gt", 5.0), Pred("price", "le", 10.0),
             Pred("price", "eq", 7.5), Pred("price", "ne", 7.5),
             Pred("price", "in", (2.5, 12.5)),
             Pred("price", "not_in", (2.5, 12.5)),
             Pred("node_type", "eq", "item")]
    for p in cases:
        want_mask = np.asarray(dnf_mask(g, [[p]]))
        ids = np.asarray(indexed_sample(g, jax.random.PRNGKey(3),
                                        30_000, p))
        assert (ids >= 0).all() == want_mask.any()
        drawn = set(ids[ids >= 0].tolist())
        assert drawn == set(np.nonzero(want_mask)[0].tolist()), p
        # weighted: node weights are 1..8 (idx+1)
        w = np.asarray(g.node_w) * want_mask
        freq = np.bincount(ids[ids >= 0], minlength=8) / max(
            1, (ids >= 0).sum())
        np.testing.assert_allclose(freq, w / w.sum(), atol=0.015,
                                   err_msg=str(p))
    # sample_node_with_condition auto-routes single predicates through
    # the index; parity with the scan path on the same graph
    ids = np.asarray(sample_node_with_condition(
        g, jax.random.PRNGKey(4), 20_000, [[Pred("price", "gt", 5.0)]]))
    assert set(ids.tolist()) == {3, 4, 5, 6, 7}


def test_edge_predicates_and_conditional_edge_sampling(toy_graph):
    """Edge-attribute predicates: e(...).has(...) filters an edge
    frontier, and sampleE honors conditions through the O(E) mask and
    the prebuilt edge AttrIndex (reference indexes edges too)."""
    from euler_tpu.ops.index import (build_attr_index,
                                     sample_edge_with_condition)
    from euler_tpu.query import Query
    from tests.fixtures import EDGES
    g = toy_graph.tensors
    # edense = 10 * edge weight (fixture contract, eid order)
    dnf = [[Pred("edense", "ge", 20.0)]]
    src, dst, ty, eid = sample_edge_with_condition(
        g, jax.random.PRNGKey(0), 20_000, dnf)
    eid = np.asarray(eid)
    assert (eid >= 0).all()
    legal = {i for i, (s, d, t, w) in enumerate(EDGES) if w * 10 >= 20.0}
    assert set(eid.tolist()) == legal
    # weighted among matches
    w = np.asarray([EDGES[i][3] for i in sorted(legal)])
    freq = np.bincount(eid, minlength=len(EDGES))[sorted(legal)] \
        / len(eid)
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)

    # prebuilt edge index path gives the same set/distribution
    g2 = build_attr_index(g, ["edense"], target="edge")
    _, _, _, eid2 = sample_edge_with_condition(
        g2, jax.random.PRNGKey(1), 20_000, dnf)
    eid2 = np.asarray(eid2)
    assert set(eid2.tolist()) == legal
    freq2 = np.bincount(eid2, minlength=len(EDGES))[sorted(legal)] \
        / len(eid2)
    np.testing.assert_allclose(freq2, w / w.sum(), atol=0.01)

    # e(...).ge(...) filters the explicit edge frontier in the builder
    out = (Query(g).e(jnp.arange(len(EDGES), dtype=jnp.int32))
           .ge("edense", 20.0)).run(jax.random.PRNGKey(2))
    f = out["_frontier"]
    kept = np.asarray(f.eids)
    assert set(kept[kept >= 0].tolist()) == legal
    assert (np.asarray(f.src)[kept < 0] == -1).all()

    # sampleE with trailing predicate binds like sampleN
    out2 = (Query(g).sampleE(-1, 4096).ge("edense", 20.0)
            ).run(jax.random.PRNGKey(5))
    e2 = np.asarray(out2["_frontier"].eids)
    assert (e2 >= 0).all() and set(e2.tolist()) == legal
