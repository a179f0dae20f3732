"""Differentiable gather/scatter message-passing primitives.

TPU-native counterpart of the reference's MP ops + registered gradients
(reference: tf_euler/python/euler_ops/mp_ops.py:27-79 and the CPU kernels
tf_euler/kernels/{gather,scatter}_op.cc). On TPU these lower to XLA
gather/segment-scatter which fuse with surrounding elementwise work; the
gradient rules mirror the reference exactly:

  gather grad        -> scatter_add            (mp_ops.py:39-43)
  scatter_add grad   -> gather                 (mp_ops.py:46-49)
  scatter_max grad   -> split evenly among argmax ties (mp_ops.py:52-62)

All shapes static; `size` (num_segments) must be a Python int under jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather(params, indices):
    """params[indices] along axis 0. Negative indices read row 0 — callers
    mask invalid (padded) ids themselves, matching the default_node+weight-0
    convention (reference: tf_euler/kernels/sample_fanout_op.cc:109-113)."""
    indices = jnp.asarray(indices)
    return jnp.take(params, jnp.maximum(indices, 0), axis=0,
                    indices_are_sorted=False, unique_indices=False)


def scatter_add(updates, indices, size: int):
    return jax.ops.segment_sum(updates, jnp.asarray(indices),
                               num_segments=size)


def _segment_max_raw(updates, indices, size):
    return jax.ops.segment_max(updates, indices, num_segments=size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_max(updates, indices, size: int):
    """Segment max with empty segments = 0 (matching an all-zeros init
    accumulator) and tie-splitting gradient (reference mp_ops.py:52-62)."""
    out = _segment_max_raw(updates, jnp.asarray(indices), size)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def _scatter_max_fwd(updates, indices, size):
    out = scatter_max(updates, indices, size)
    return out, (updates, jnp.asarray(indices), out)


def _scatter_max_bwd(size, res, g):
    updates, indices, out = res
    indicators = (updates == gather(out, indices)).astype(updates.dtype)
    num_selected = scatter_add(indicators, indices, size)
    indicators = indicators / jnp.maximum(gather(num_selected, indices), 1.0)
    return (indicators * gather(g, indices), None)


scatter_max.defvjp(_scatter_max_fwd, _scatter_max_bwd)


def scatter_mean(updates, indices, size: int):
    """reference mp_ops.py:65-69 (eps matches)."""
    out = scatter_add(updates, indices, size)
    ep = 1e-7
    ones = jnp.ones((updates.shape[0], 1), updates.dtype)
    count = scatter_add(ones, indices, size) + ep
    return out / count


def scatter_softmax(updates, indices, size: int):
    """Max-shifted segment softmax (reference mp_ops.py:76-79)."""
    indices = jnp.asarray(indices)
    shifted = updates - gather(scatter_max(updates, indices, size), indices)
    e = jnp.exp(shifted)
    denom = gather(scatter_add(e, indices, size), indices)
    return e / jnp.maximum(denom, 1e-16)


def scatter_(op: str, updates, indices, size: int):
    """Dispatch by aggregator name ('add'|'mean'|'max'),
    reference mp_ops.py:72-73."""
    return {"add": scatter_add, "mean": scatter_mean,
            "max": scatter_max}[op](updates, indices, size)


def masked_scatter_(op: str, updates, indices, size: int, mask=None):
    """Aggregation that ignores padded edges (mask==0).

    The static-shape sampling plans pad missing neighbors; masked variants
    keep those out of the statistics ('mean' divides by the *valid* count,
    'max' ignores padded rows).
    """
    if mask is None:
        return scatter_(op, updates, indices, size)
    mask = mask.reshape((-1,) + (1,) * (updates.ndim - 1)).astype(updates.dtype)
    if op == "add":
        return scatter_add(updates * mask, indices, size)
    if op == "mean":
        tot = scatter_add(updates * mask, indices, size)
        cnt = scatter_add(jnp.broadcast_to(mask, (updates.shape[0], 1)),
                          indices, size)
        return tot / jnp.maximum(cnt, 1e-7)
    if op == "max":
        neg = jnp.finfo(updates.dtype).min
        masked = jnp.where(mask > 0, updates, neg)
        out = _segment_max_raw(masked, jnp.asarray(indices), size)
        return jnp.where(out <= neg * 0.5, 0.0, out)
    raise ValueError(op)


def masked_scatter_softmax(updates, indices, size: int, mask=None):
    if mask is None:
        return scatter_softmax(updates, indices, size)
    mask = mask.reshape((-1,) + (1,) * (updates.ndim - 1)).astype(updates.dtype)
    neg = -1e30
    shifted_in = jnp.where(mask > 0, updates, neg)
    mx = _segment_max_raw(shifted_in, jnp.asarray(indices), size)
    mx = jnp.where(mx <= neg * 0.5, 0.0, mx)
    z = jnp.where(mask > 0, updates - gather(mx, indices), neg)
    e = jnp.exp(z)
    denom = gather(scatter_add(e, indices, size), indices)
    return e / jnp.maximum(denom, 1e-16)
