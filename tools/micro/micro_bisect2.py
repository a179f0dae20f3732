"""Which exact ingredient makes the sample_pack gather slow?"""
import time

import jax
import jax.numpy as jnp

from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.ops import sampling

ITERS = 100
B, count = 25600, 10
E = 5_000_000


def bench(name, make_fn, *args):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = make_fn(jax.random.fold_in(key, i), *args)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return acc + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc
    float(loop(jax.random.PRNGKey(0), args))
    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(1), args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {ms:8.3f} ms")
    return ms


def slots(k, g, nodes):
    """Everything up to the final row read (stage3 + lo)."""
    rows = jnp.maximum(nodes, 0)
    kt, kd = jax.random.split(k)
    et_arr = jnp.asarray((0,), jnp.int32)
    W = g.group_w_sum[rows][:, et_arr]
    cdf = jnp.cumsum(W, axis=1)
    total = cdf[:, -1]
    r = jax.random.uniform(kt, (B, count)) * total[:, None]
    t_idx = jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1)
    etype = et_arr[jnp.minimum(t_idx, 0)]
    lo, hi = sampling._group_bounds(g, rows[:, None], etype)
    size = hi - lo
    k1, k2 = jax.random.split(kd)
    u1 = jax.random.uniform(k1, (B, count))
    slot = jnp.minimum((u1 * size).astype(jnp.int32),
                       jnp.maximum(size - 1, 0))
    return lo + slot


def main():
    graph = random_graph(200_000, 25, feat_dim=128, n_classes=16, seed=0)
    g = graph.tensors
    key = jax.random.PRNGKey(7)
    nodes = jax.random.randint(key, (B,), 0, 200_000, dtype=jnp.int32)
    zeros9 = jnp.zeros((E, 9), jnp.int32)
    randix = jax.random.randint(key, (B, count), 0, E, dtype=jnp.int32)

    bench("A: full index chain, read sample_pack",
          lambda k, g, n: g.sample_pack[slots(k, g, n)], g, nodes)
    bench("B: full index chain, read zeros[5M,9]",
          lambda k, g, n, z: z[slots(k, g, n)], g, nodes, zeros9)
    bench("C: full index chain, read adj_pack[5M,4]",
          lambda k, g, n: g.adj_pack[slots(k, g, n)], g, nodes)
    bench("D: precomputed randix, read sample_pack",
          lambda k, g, ix: g.sample_pack[ix], g, randix)
    bench("E: fresh uniform idx, read sample_pack",
          lambda k, g: g.sample_pack[
              jax.random.randint(k, (B, count), 0, E)], g)
    bench("F: full chain, flat read sample_pack[:,0]",
          lambda k, g, n: g.sample_pack[slots(k, g, n), 0], g, nodes)
    bench("G: full chain, return indices only",
          lambda k, g, n: slots(k, g, n), g, nodes)
    # H: chain but skip the group_pack lo (use slot only)
    def no_lo(k, g, n):
        rows = jnp.maximum(n, 0)
        u1 = jax.random.uniform(k, (B, count))
        slot = (u1 * 25).astype(jnp.int32)
        return g.sample_pack[rows[:, None] * 25 + slot]
    bench("H: arithmetic idx (no group_pack), read pack", no_lo, g, nodes)


if __name__ == "__main__":
    main()
