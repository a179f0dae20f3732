"""Can contiguous reservoir-feature blocks beat per-draw random rows?

Hop-2 of the SAGE step: for each of B1=25.6k hop-1 nodes, mean of
C=10 sampled neighbor feature rows [128] bf16.
  (a) status quo: 256k RANDOM 256B row gathers + reshape-mean
  (b) feature pack: ONE [42, 128] bf16 block per hop-1 node
      (sequential 10.7KB read), draws picked in-register via one-hot
      counts over the 42 reservoir slots.
Same sampling distribution (draws come from the same reservoir).

MEASURED (v5e): (a) 1.66ms, (b) 5.91ms, (c) 4.60ms — the pack reads
4.4x more bytes and XLA's gather sustains the same ~45GB/s effective
bandwidth regardless of slice size (256B rows or 10.7KB blocks), so
trading random rows for bigger sequential blocks LOSES. Fewer bytes
(bf16/int8 feature stores) is the lever, not better access patterns.
"""
import time

import jax
import jax.numpy as jnp

N = 200_000          # nodes
G = N                # groups (1 edge type)
D = 128
FAN_D = 42
B1 = 25_600          # hop-1 frontier
C = 10               # draws per node

ITERS = 50


def bench(name, fn, *args):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *args)
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
    feat = jnp.zeros((N, D), jnp.bfloat16)
    featpack = jnp.zeros((G, FAN_D, D), jnp.bfloat16)

    def random_rows(key):
        k1, k2 = jax.random.split(key)
        rows = jax.random.randint(k1, (B1,), 0, G)
        nbr = jax.random.randint(k2, (B1, C), 0, N)   # stand-in draws
        x = feat[nbr.reshape(-1)].reshape(B1, C, D)
        return jnp.mean(x.astype(jnp.float32), axis=1)

    def packed_blocks(key):
        k1, k2 = jax.random.split(key)
        rows = jax.random.randint(k1, (B1,), 0, G)
        blocks = featpack[rows]                        # [B1, 42, D]
        # C draws -> per-slot counts via one-hot sum, then weighted mean
        u = jax.random.uniform(k2, (B1, C))
        slot = (u * FAN_D).astype(jnp.int32)
        oh = (slot[..., None] ==
              jnp.arange(FAN_D, dtype=jnp.int32))
        cnt = jnp.sum(oh, axis=1).astype(jnp.bfloat16)  # [B1, 42]
        return jnp.einsum("bk,bkd->bd", cnt,
                          blocks,
                          preferred_element_type=jnp.float32) / C

    def packed_blocks_halfres(key):
        # reservoir capped at 16 slots (smaller pack, less read amp)
        k1, k2 = jax.random.split(key)
        rows = jax.random.randint(k1, (B1,), 0, G)
        blocks = featpack[rows, :16]                   # [B1, 16, D]
        u = jax.random.uniform(k2, (B1, C))
        slot = (u * 16).astype(jnp.int32)
        oh = (slot[..., None] == jnp.arange(16, dtype=jnp.int32))
        cnt = jnp.sum(oh, axis=1).astype(jnp.bfloat16)
        return jnp.einsum("bk,bkd->bd", cnt, blocks,
                          preferred_element_type=jnp.float32) / C

    bench("(a) 256k random 256B rows + mean", random_rows)
    bench("(b) 25.6k x [42,128]bf16 blocks + count-mean", packed_blocks)
    bench("(c) 25.6k x [16,128]bf16 blocks + count-mean",
          packed_blocks_halfres)


if __name__ == "__main__":
    main()
