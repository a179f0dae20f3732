"""Fan-row weighted draw: jnp one-hot einsum picks vs a Pallas VMEM kernel.

The hot path gathers one 128-lane fan row per frontier node (XLA gather,
~11.6ns/row — per-row DMA from Pallas measured 3x slower, so the gather
stays XLA) and then picks `count` weighted draws per row. The jnp path
materializes one-hot [B,C,D] intermediates; the Pallas kernel keeps the
whole selection in VMEM with the on-core PRNG.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from euler_tpu.ops.alias import (FAN_ALIAS_OFF, FAN_D, FAN_KEPT_OFF,
                                 FAN_PROB_OFF)

G = 200_000
ITERS = 100


def jnp_draw(packs, key, count):
    """The K=1 branch of sample_neighbor_fast, minus validity."""
    B = packs.shape[0]
    deg = packs[:, 0]
    prob_bank = packs[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D]
    kept_bank = packs[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D]
    alias_bank = packs[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D]
    deg_c = jnp.broadcast_to(deg[:, None], (B, count))
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (B, count))
    u2 = jax.random.uniform(k2, (B, count))
    slot = jnp.minimum((u1 * deg_c).astype(jnp.int32),
                       jnp.maximum(deg_c - 1, 0))
    oh = (slot[..., None] ==
          jnp.arange(FAN_D, dtype=jnp.int32)).astype(jnp.int32)
    pick = lambda bank: jnp.einsum("bcd,bd->bc", oh, bank)
    prob = jax.lax.bitcast_convert_type(pick(prob_bank), jnp.float32)
    ids = jnp.where(u2 < prob, pick(kept_bank), pick(alias_bank))
    return ids


from euler_tpu.ops.pallas_fan import fan_draw_from_key


def bench(name, make_fn, *args):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = make_fn(jax.random.fold_in(key, i), *args)
            return acc + jnp.sum(out).astype(jnp.float32), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc
    float(loop(jax.random.PRNGKey(0), args))
    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(1), args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:56s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    packs_np = np.zeros((G, 128), np.int32)
    deg = rng.integers(1, FAN_D + 1, G)
    packs_np[:, 0] = deg
    packs_np[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D] = \
        np.float32(1.0).view(np.int32)
    packs_np[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D] = \
        rng.integers(0, G, (G, FAN_D))
    packs_np[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D] = \
        packs_np[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D]
    fan = jnp.asarray(packs_np)

    for B, C in ((26624, 10), (1024, 25)):
        nodes0 = jax.random.randint(jax.random.PRNGKey(7), (B,), 0, G)

        def gather_only(k, fan):
            rows = jax.random.randint(k, (B,), 0, G)
            return fan[rows]

        def jnp_full(k, fan):
            kg, kd = jax.random.split(k)
            rows = jax.random.randint(kg, (B,), 0, G)
            return jnp_draw(fan[rows], kd, C)

        def pallas_full(k, fan):
            kg, kd = jax.random.split(k)
            rows = jax.random.randint(kg, (B,), 0, G)
            return fan_draw_from_key(fan[rows], kd, C)

        out = fan_draw_from_key(fan[nodes0], jax.random.PRNGKey(3), C)
        assert out.shape == (B, C)
        print(f"--- B={B} count={C}")
        bench("fan-row gather only", gather_only, fan)
        bench("gather + jnp one-hot draw", jnp_full, fan)
        bench("gather + pallas VMEM draw", pallas_full, fan)


if __name__ == "__main__":
    main()
