"""Is jax.lax.top_k a Pallas opportunity on this chip?

Shapes that matter: KNN serving scores [B, N] k=10..100, LADIES
Gumbel-top-k [B*cap] k=layer_size, get_top_k_neighbor [B, cap] small.
"""
import time

import jax
import jax.numpy as jnp

ITERS = 50


def bench(name, make_fn, *args):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = make_fn(jax.random.fold_in(key, i), *args)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l).astype(jnp.float32)
                             for l in leaves), ()
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
    for B, N, K in ((1, 1_000_000, 10), (256, 200_000, 10),
                    (1, 64_000, 512), (1024, 1024, 32)):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, N))
        bench(f"randn fill [{B},{N}]",
              lambda k, s=(B, N): jax.random.normal(k, s))
        bench(f"top_k [{B},{N}] k={K}",
              lambda k, x: jax.lax.top_k(
                  x + jax.random.normal(k, (B, 1)), K)[0], x)
        bench(f"argmax [{B},{N}] (floor)",
              lambda k, x: jnp.argmax(x + jax.random.normal(k, (B, 1)),
                                      axis=-1), x)


if __name__ == "__main__":
    main()
