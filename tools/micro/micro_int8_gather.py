"""Does an int8 feature table restore VMEM-staged gather speed at 1M?

frag_gather.py located the single-chip gather cliff at the ~128MB XLA
VMEM-staging threshold (102MB table: 2.9ns/row; 154MB: 10ns/row). An
int8-quantized feature store halves bf16 bytes: 1M x 128 = 128MB (at
the boundary) — this measures the in-program gather+dequant cost for
int8 vs bf16 at several N to see where staging stops.
"""
import time

import jax
import jax.numpy as jnp

S = 292_864
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
    print(f"{name:52s} {ms:8.3f} ms  ({ms*1e6/S:5.1f} ns/row)")


def main():
    key = jax.random.PRNGKey(0)
    for N in (800_000, 1_000_000, 1_500_000, 2_000_000):
        mb16 = N * 128 * 2 // 2 ** 20
        mb8 = N * 128 // 2 ** 20
        tab16 = jax.random.normal(key, (N, 128), jnp.bfloat16)
        tab8 = (jax.random.normal(key, (N, 128)) * 40).astype(jnp.int8)
        scale = jnp.float32(1 / 40)
        bench(f"bf16 gather  N={N//1000}k ({mb16}MB)",
              lambda k, t, n=N: t[jax.random.randint(k, (S,), 0, n)]
              .astype(jnp.float32),
              tab16)
        bench(f"int8 gather+dequant N={N//1000}k ({mb8}MB)",
              lambda k, t, n=N: t[jax.random.randint(k, (S,), 0, n)]
              .astype(jnp.bfloat16) * scale,
              tab8)


if __name__ == "__main__":
    main()
