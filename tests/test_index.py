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
