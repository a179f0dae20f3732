"""GeniePath and LGCN nets.

TPU-native counterparts of the reference's adaptive-receptive-field models
(reference: examples/geniepath + GenieEncoder in
tf_euler/python/utils/encoders.py — breadth = attention aggregation,
depth = LSTM over layers; examples/lgcn + LGCNEncoder — ranked top-k
channel pooling + dense 'conv').
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from euler_tpu.dataflow.block import Block
from euler_tpu.graph.store import GraphTensors
from euler_tpu.ops import mp_ops

Array = jnp.ndarray


class GeniePathLazyNet(nn.Module):
    """Breadth (gat-style attention, tanh) then depth (LSTM) per layer."""

    flow: Any
    dims: Tuple[int, ...]
    feature: nn.Module

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array) -> Array:
        key = self.make_rng("sample")
        blocks = self.flow(g, key, roots)
        dim = self.dims[0]
        x = nn.Dense(dim, name="in_fc")(self.feature(g, blocks[0].n_id))
        lstm = nn.OptimizedLSTMCell(features=dim)
        carry = None
        for i, block in enumerate(blocks):
            ei, size, mask = block.edge_index, block.size, block.mask
            x_tgt = x[: size[0]]
            # breadth: additive attention over neighbors
            wsrc = nn.Dense(dim, use_bias=False, name=f"w_src_{i}")
            wdst = nn.Dense(dim, use_bias=False, name=f"w_dst_{i}")
            att = nn.Dense(1, use_bias=False, name=f"att_{i}")
            hi = block.gather_tgt(wdst(x_tgt))
            hj = block.gather_src(wsrc(x))
            alpha = att(jnp.tanh(hi + hj))
            alpha = block.softmax(alpha, mask)
            msg = block.gather_src(x) * alpha
            if mask is not None:
                msg = msg * mask[:, None]
            aggr = jnp.tanh(nn.Dense(dim, name=f"b_fc_{i}")(
                block.scatter("add", msg, None)))
            # depth: LSTM consumes the aggregated signal
            if carry is None:
                zeros = jnp.zeros((size[0], dim))
                carry = (zeros, zeros)
            else:
                carry = (carry[0][: size[0]], carry[1][: size[0]])
            carry, h = lstm(carry, aggr)
            x = h
        out = nn.Dense(self.dims[-1], name="out_fc")(x)
        if out.shape[0] != roots.shape[0]:
            out = jnp.where((roots >= 0)[:, None],
                            out[jnp.maximum(roots, 0)], 0.0)
        return out


class LGCNNet(nn.Module):
    """Ranked top-k channel pooling over sampled neighborhoods.

    Requires a fanout flow (each target has a fixed neighbor count per
    block) so the per-target neighbor stack reshapes statically.
    """

    flow: Any
    dims: Tuple[int, ...]
    feature: nn.Module
    k: int = 4

    @nn.compact
    def __call__(self, g: GraphTensors, roots: Array) -> Array:
        key = self.make_rng("sample")
        blocks = self.flow(g, key, roots)
        x = self.feature(g, blocks[0].n_id)
        for i, block in enumerate(blocks):
            T, S = block.size
            cnt = (S - T) // T  # sampled neighbors per target
            x_tgt = x[:T]
            nbrs = x[T:].reshape(T, cnt, -1)
            nmask = (block.n_id[T:] >= 0).reshape(T, cnt, 1)
            vals = jnp.where(nmask, nbrs, -jnp.inf)
            k = min(self.k, cnt)
            top = jax.lax.top_k(jnp.swapaxes(vals, 1, 2), k)[0]  # [T,D,k]
            top = jnp.where(jnp.isfinite(top), top, 0.0)
            stacked = jnp.concatenate(
                [x_tgt, top.reshape(T, -1)], axis=-1)
            x = nn.relu(nn.Dense(self.dims[i], name=f"fc_{i}")(stacked))
        out = nn.Dense(self.dims[-1], name="out_fc")(x)
        if out.shape[0] != roots.shape[0]:
            out = jnp.where((roots >= 0)[:, None],
                            out[jnp.maximum(roots, 0)], 0.0)
        return out
