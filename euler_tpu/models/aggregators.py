"""Neighborhood aggregators over fixed-fanout neighbor blocks.

TPU-native counterparts of the reference's aggregator kit
(reference: tf_euler/python/utils/aggregators.py:25-118 — GCNAggregator
(mean over self+neighbors then dense), MeanAggregator / MeanPool /
MaxPool (self_fc + aggregated-neighbor fc, add or concat)). Inputs are
(self_embedding [B, D], neigh_embedding [B, n, D], mask [B, n]?) — the
padded block produced by sample_neighbor.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def _masked_mean(x: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def _masked_max(x: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.max(x, axis=1)
    big_neg = jnp.finfo(x.dtype).min
    m = jnp.where(mask[..., None], x, big_neg)
    out = jnp.max(m, axis=1)
    any_ok = jnp.any(mask, axis=1, keepdims=True)
    return jnp.where(any_ok, out, 0.0)


class GCNAggregator(nn.Module):
    """mean(self ++ neighbors) -> dense (aggregators.py:25-35)."""

    dim: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, self_emb: Array, neigh_emb: Array,
                 mask: Optional[Array] = None) -> Array:
        both = jnp.concatenate([self_emb[:, None, :], neigh_emb], axis=1)
        if mask is not None:
            full = jnp.concatenate(
                [jnp.ones((mask.shape[0], 1), bool), mask], axis=1)
        else:
            full = None
        agg = _masked_mean(both, full)
        return self.activation(nn.Dense(self.dim, use_bias=False)(agg))


class _BaseAggregator(nn.Module):
    """self_fc(self) (+|++) neigh_fc(aggregate(neighbors))
    (aggregators.py:38-64)."""

    dim: int
    activation: Callable = nn.relu
    concat: bool = False

    def aggregate(self, neigh_emb, mask):
        raise NotImplementedError

    @nn.compact
    def __call__(self, self_emb: Array, neigh_emb: Array,
                 mask: Optional[Array] = None) -> Array:
        dim = self.dim
        if self.concat:
            if dim % 2:
                raise ValueError("dim must be even when concat=True")
            dim //= 2
        agg = self.aggregate(neigh_emb, mask)
        from_self = self.activation(
            nn.Dense(dim, use_bias=False, name="self_fc")(self_emb))
        from_neigh = self.activation(
            nn.Dense(dim, use_bias=False, name="neigh_fc")(agg))
        if self.concat:
            return jnp.concatenate([from_self, from_neigh], axis=-1)
        return from_self + from_neigh


class MeanAggregator(_BaseAggregator):
    def aggregate(self, neigh_emb, mask):
        return _masked_mean(neigh_emb, mask)


class MeanPoolAggregator(_BaseAggregator):
    """dense -> mean-pool (aggregators.py:70-96)."""

    @nn.compact
    def aggregate(self, neigh_emb, mask):
        h = nn.relu(nn.Dense(self.dim, name="pool_fc")(neigh_emb))
        return _masked_mean(h, mask)


class MaxPoolAggregator(_BaseAggregator):
    @nn.compact
    def aggregate(self, neigh_emb, mask):
        h = nn.relu(nn.Dense(self.dim, name="pool_fc")(neigh_emb))
        return _masked_max(h, mask)


_AGGREGATORS = {
    "gcn": GCNAggregator,
    "mean": MeanAggregator,
    "meanpool": MeanPoolAggregator,
    "maxpool": MaxPoolAggregator,
}


def get(name: str):
    """reference: aggregators.py get()."""
    return _AGGREGATORS[name]
