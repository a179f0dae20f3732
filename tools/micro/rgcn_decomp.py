"""RGCN premium decomposition: typed multi-type sampling vs conv.

rgcn family = 70M edges/s (4.4ms/step) vs sage 124M (2.5ms). Times the
typed K=4 fan sampling against K=1, and the relation conv against
sage's, standalone on the bench graph (AOT+pipelined protocol).
"""
import time

import jax
import jax.numpy as jnp

from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.ops import sampling

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/euler_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N, B1 = 200_000, 1024
FRONTIER = B1 * 26          # hop-2 frontier size
STEPS = 50


def bench(name, fn, g):
    @jax.jit
    def loop(g, key):
        def body(acc, i):
            return acc + fn(g, jax.random.fold_in(key, i)), ()
        a, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(STEPS, dtype=jnp.int32))
        return a
    c = loop.lower(g, jax.random.PRNGKey(0)).compile()
    float(c(g, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    last = None
    for i in range(4):
        last = c(g, jax.random.PRNGKey(1 + i))
    float(last)
    ms = (time.perf_counter() - t0) / (4 * STEPS) * 1e3
    print(f"{name:44s} {ms:7.3f} ms/step")


def main():
    for K in (1, 4):
        graph = random_graph(N, 25, seed=0, device_put=False,
                             num_edge_types=K, packs=("group", "fan"))
        g = graph.tensors
        put = jax.device_put
        g = g.replace(fan_pack=put(g.fan_pack),
                      group_ptr=put(g.group_ptr),
                      adj_dst=put(g.adj_dst), adj_prob=put(g.adj_prob),
                      adj_alias=put(g.adj_alias),
                      fan_over_rows=put(g.fan_over_rows),
                      node_alias=jax.tree.map(put, g.node_alias))
        ets = tuple(range(K))

        def hop2(g, k, typed):
            f = jax.random.randint(k, (FRONTIER,), 0, N, dtype=jnp.int32)
            if typed:
                ids, ok, ty = sampling.sample_neighbor_fast(
                    g, k, f, ets, 10, return_types=True)
                return (jnp.sum(ids) + jnp.sum(ty)).astype(jnp.float32)
            ids, ok = sampling.sample_neighbor_fast(g, k, f, ets, 10)
            return jnp.sum(ids).astype(jnp.float32)

        bench(f"hop2 fan K={K} ids-only",
              lambda g, k: hop2(g, k, False), g)
        bench(f"hop2 fan K={K} typed",
              lambda g, k: hop2(g, k, True), g)


if __name__ == "__main__":
    main()
