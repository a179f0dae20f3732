"""Bisect sample_neighbor's hop-2 cost piece by piece."""
import time

import jax
import jax.numpy as jnp

from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.ops import sampling

ITERS = 100


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
    print(f"{name:46s} {ms:8.3f} ms")
    return ms


def main():
    graph = random_graph(200_000, 25, feat_dim=128, n_classes=16, seed=0)
    g = graph.tensors
    B, count = 25600, 10
    key = jax.random.PRNGKey(7)
    nodes = jax.random.randint(key, (B,), 0, 200_000, dtype=jnp.int32)
    ets = (0,)

    base = bench("baseline (empty)", lambda k: jnp.float32(0.))

    def stage1(k, g, nodes):
        rows = jnp.maximum(nodes, 0)
        kt, kd = jax.random.split(k)
        et_arr = jnp.asarray(ets, jnp.int32)
        W = g.group_w_sum[rows][:, et_arr]
        cdf = jnp.cumsum(W, axis=1)
        total = cdf[:, -1]
        r = jax.random.uniform(kt, (B, count)) * total[:, None]
        t_idx = jnp.sum(r[:, :, None] >= cdf[:, None, :], axis=-1)
        t_idx = jnp.minimum(t_idx, len(ets) - 1)
        etype = et_arr[t_idx]
        return etype
    bench("stage1: type draw", stage1, g, nodes)

    def stage2(k, g, nodes):
        etype = stage1(k, g, nodes)
        rows = jnp.maximum(nodes, 0)
        lo, hi = sampling._group_bounds(g, rows[:, None], etype)
        return lo, hi
    bench("stage2: +group bounds", stage2, g, nodes)

    def stage3(k, g, nodes):
        etype = stage1(k, g, nodes)
        rows = jnp.maximum(nodes, 0)
        lo, hi = sampling._group_bounds(g, rows[:, None], etype)
        size = hi - lo
        kt, kd = jax.random.split(k)
        k1, k2 = jax.random.split(kd)
        u1 = jax.random.uniform(k1, (B, count))
        u2 = jax.random.uniform(k2, (B, count))
        slot = jnp.minimum((u1 * size).astype(jnp.int32),
                           jnp.maximum(size - 1, 0))
        return slot, u2
    bench("stage3: +slot draw", stage3, g, nodes)

    def stage4(k, g, nodes):
        slot, u2 = stage3(k, g, nodes)
        rows = jnp.maximum(nodes, 0)
        etype = stage1(k, g, nodes)
        lo, hi = sampling._group_bounds(g, rows[:, None], etype)
        row = g.sample_pack[lo + slot]
        return row
    bench("stage4: +sample_pack row read", stage4, g, nodes)

    def stage5(k, g, nodes):
        return sampling.sample_neighbor(g, k, nodes, ets, count)
    bench("stage5: full sample_neighbor", stage5, g, nodes)

    # suspicious: maybe the where/bitcast tail
    def stage6(k, g, nodes):
        out = sampling.sample_neighbor(g, k, nodes, ets, count)
        return out[0]  # only ids -> DCE the rest?
    bench("stage6: sample_neighbor ids only", stage6, g, nodes)


if __name__ == "__main__":
    main()
