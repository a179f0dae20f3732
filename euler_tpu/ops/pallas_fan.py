"""Pallas TPU kernel: fused in-row weighted neighbor draw over fan rows.

The kernel plane of SURVEY.md §7. The sampling hot path has two parts:

  1. a random 128-lane row gather per (frontier node, edge type) from
     ``fan_pack`` — this STAYS an XLA gather. Measured on the chip
     (tools/micro/micro_pallas_gather.py): XLA's gather engine does
     ~11.6 ns/row regardless of row width, while a per-row Pallas DMA
     costs ~37 ns/row (scalar-core issue bound) — XLA's gather is the
     hardware-optimal primitive for latency-bound random row fetches,
     so a kernel that re-does the gather via DMA loses 3x.
  2. ``count`` weighted in-row picks per gathered row (alias keep/alias
     selection). The jnp path materializes one-hot [B, C, FAN_D]
     intermediates; this kernel keeps the whole selection in VMEM with
     2D [TB, FAN_D] register tiles (a 3D formulation pads the minor
     dim 42 -> 128 lanes and blows the scoped-VMEM budget).

The uniforms are jax.random draws passed IN (not pltpu.prng_*): the
kernel is then a pure deterministic selection, bit-exact against the
jnp K=1 branch of ``sample_neighbor_fast`` for the same key — which is
what the parity tests assert (tests/test_pallas.py), on CPU via the
TPU-semantics interpreter. The draw itself is the reference's
Node::SampleNeighbor weighted-with-replacement alias draw
(euler/core/graph/node.h:82): uniform slot in [0, deg), keep
``kept[slot]`` if u2 < prob[slot] else take ``alias[slot]``.

Enabled via ``EULER_TPU_PALLAS=1`` (or ``set_enabled(True)``); default
off — on-chip measurements (tools/micro/micro_fan_draw.py, v5e):

    B=26624 C=10   gather only 0.51ms   gather+jnp 0.62ms   pallas 1.54ms
    B=1024  C=25   gather only 0.28ms   gather+jnp 0.30ms   pallas 0.38ms

XLA fully fuses the jnp one-hot picks into the gather (gather+draw ≈
gather alone), while the kernel's FAN_D where-chain runs [TB, C→128]
lane-padded tiles (12.8x lane waste at C=10), so the jnp path is the
default on every shape the dataflows use. The kernel is the production
beachhead of the kernel plane: bit-exact, flag-gated, and the right
starting point if fanouts ever grow past XLA's fusion budget.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from euler_tpu.ops.alias import (FAN_ALIAS_OFF, FAN_D, FAN_KEPT_OFF,
                                 FAN_PROB_OFF)

_enabled = None


def set_enabled(flag) -> None:
    """True/False force; None = re-read the EULER_TPU_PALLAS env var."""
    global _enabled
    _enabled = flag


def enabled() -> bool:
    if _enabled is not None:
        return bool(_enabled)
    return os.environ.get("EULER_TPU_PALLAS", "0") not in ("0", "", "false")


def _draw_kernel(packs_ref, u1_ref, u2_ref, out_ref):
    deg = packs_ref[:, 0:1]                                    # [TB,1]
    deg_f = deg.astype(jnp.float32)
    slot = jnp.clip((u1_ref[:, :] * deg_f).astype(jnp.int32), 0,
                    jnp.maximum(deg - 1, 0))                   # [TB,TC]

    # select bank[row, slot[row, c]] with a where-chain over the FAN_D
    # lanes: FAN_D (=42) fixed iterations of 2D [TB, TC] tiles — op
    # count independent of the draw count, no 3D minor-dim-42 tiles
    # (those pad 42 -> 128 lanes and blow the scoped-VMEM budget).
    # ONE carried accumulator: per-lane keep-vs-alias resolves inside the
    # iteration so Mosaic's scoped-VMEM allocator sees short-lived
    # temporaries per step, not 3*FAN_D live chains.
    u2 = u2_ref[:, :]
    out = jnp.zeros_like(slot)

    def col(off, d):
        return packs_ref[:, off + d:off + d + 1]               # [TB,1]

    for d in range(FAN_D):
        sel_d = jnp.where(u2 < _bitcast_f32(col(FAN_PROB_OFF, d)),
                          col(FAN_KEPT_OFF, d), col(FAN_ALIAS_OFF, d))
        out = jnp.where(slot == d, sel_d, out)
    out_ref[:, :] = out


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


@functools.partial(jax.jit, static_argnames=("tb", "tc", "interpret"))
def fan_draw(packs, u1, u2, tb: int = 128, tc: int = 512,
             interpret: bool = False):
    """Weighted in-row draws: one id per (row, draw).

    packs: int32 [B, 128] gathered fan rows (ops/alias.py FAN_* layout).
    u1/u2: f32 [B, C] uniforms in [0, 1) (slot pick / keep-vs-alias).
    Returns int32 ids [B, C]; rows with deg==0 yield garbage the caller
    masks (same contract as the jnp path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C = u1.shape
    tb = min(tb, max(8, B))
    tc = min(tc, max(128, C))
    if interpret:   # CPU-testable TPU-semantics interpreter
        interpret = pltpu.InterpretParams()
    spec_p = pl.BlockSpec((tb, 128), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _draw_kernel,
        grid=(pl.cdiv(B, tb), pl.cdiv(C, tc)),
        in_specs=[spec_p, spec_u, spec_u],
        out_specs=spec_u,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.int32),
        interpret=interpret,
    )(packs, u1, u2)


def fan_draw_from_key(packs, key, count: int, interpret: bool = False):
    """jax.random front-end: same (u1, u2) derivation as the jnp K=1
    branch of sample_neighbor_fast, so outputs are bit-exact equal."""
    B = packs.shape[0]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (B, count))
    u2 = jax.random.uniform(k2, (B, count))
    return fan_draw(packs, u1, u2, interpret=interpret)
