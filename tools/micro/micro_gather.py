"""Microbenchmark: XLA gather / RNG cost model on this TPU."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
E = 5_000_000
M = 256_000


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
    print(f"{name:44s} {ms:8.3f} ms  ({ms*1e6/M:6.1f} ns/row)")
    return ms


def main():
    key = jax.random.PRNGKey(42)

    # RNG costs
    bench("threefry uniform (256k,)",
          lambda k: jax.random.uniform(k, (M,)))
    rbg = jax.random.key(0, impl="rbg")
    bench("rbg uniform (256k,)",
          lambda k: jax.random.uniform(jax.random.wrap_key_data(
              jax.random.key_data(k)[..., :1].repeat(4, -1) if False else
              jnp.tile(jax.random.key_data(k), 2), impl="rbg"), (M,)))
    bench("randint (256k,)",
          lambda k: jax.random.randint(k, (M,), 0, E))

    idx = jax.random.randint(key, (M,), 0, E, dtype=jnp.int32)

    for W in (1, 2, 4, 8, 9, 16, 32, 128):
        tab = jnp.zeros((E, W), jnp.int32) if W > 1 else \
            jnp.zeros((E,), jnp.int32)
        if W == 1:
            bench(f"flat take 256k from [{E}]",
                  lambda k, t, ix: t[ix], tab, idx)
        else:
            bench(f"row take 256k from [{E},{W}]",
                  lambda k, t, ix: t[ix], tab, idx)

    # chained gather (two dependent levels)
    tab8 = jnp.zeros((E, 9), jnp.int32)
    ptr = jnp.arange(E, dtype=jnp.int32)
    def chained(k, ptr, tab, ix):
        lo = ptr[ix]
        return tab[lo]
    bench("chained flat->row[9]", chained, ptr, tab8, idx)

    # gather with sorted indices (locality)
    sidx = jnp.sort(idx)
    bench("row take 256k SORTED from [5M,9]",
          lambda k, t, ix: t[ix], tab8, sidx)

    # take_along_axis style batched [B, C] from [E, 9]
    idx2 = idx.reshape(25600, 10)
    bench("row take [25600,10] from [5M,9]",
          lambda k, t, ix: t[ix], tab8, idx2)

    # small-table gather: 256k from [200k, 2]
    tabs = jnp.zeros((200_000, 2), jnp.int32)
    idxs = jax.random.randint(key, (M,), 0, 200_000, dtype=jnp.int32)
    bench("row take 256k from [200k,2]",
          lambda k, t, ix: t[ix], tabs, idxs)

    # one-hot matmul alternative for small tables: 256k x 200k too big; skip

    # dynamic_slice in vmap (alternative lowering)
    def ds_gather(k, t, ix):
        return jax.vmap(lambda i: jax.lax.dynamic_slice(t, (i, 0), (1, 9)))(
            ix).squeeze(1)
    bench("vmap dynamic_slice 256k from [5M,9]", ds_gather, tab8, idx)


if __name__ == "__main__":
    main()
