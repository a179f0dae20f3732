"""Does op cost scale with size, or is there a fixed per-op floor?"""
import time

import jax
import jax.numpy as jnp

ITERS = 50
E = 5_000_000


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
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def main():
    bench("EMPTY body (fold_in only)", lambda k: jnp.float32(0.))
    bench("tiny: uniform (8,)", lambda k: jax.random.uniform(k, (8,)))
    for M in (1024, 25600, 256000, 2560000):
        bench(f"uniform ({M},)", lambda k, m=M: jax.random.uniform(k, (m,)))
    tab = jnp.zeros((E, 9), jnp.int32)
    key = jax.random.PRNGKey(7)
    for M in (1024, 25600, 256000, 2560000):
        idx = jax.random.randint(key, (M,), 0, E, dtype=jnp.int32)
        bench(f"row take {M} from [5M,9]",
              lambda k, t, ix: t[ix], tab, idx)
    # 5 chained gathers (dependent)
    idx = jax.random.randint(key, (256000,), 0, E, dtype=jnp.int32)
    flat = jnp.arange(E, dtype=jnp.int32)

    def chain5(k, t, ix):
        x = ix
        for _ in range(5):
            x = t[x]
        return x
    bench("5 dependent flat takes 256k", chain5, flat, idx)

    # 5 independent gathers
    def indep5(k, t, ix):
        return sum(t[(ix + j) % E] for j in range(5))
    bench("5 independent flat takes 256k", indep5, flat, idx)

    # fused elementwise on 256k
    x = jnp.zeros((256000,), jnp.float32)
    bench("exp+log+mul 256k", lambda k, x: jnp.exp(x) * jnp.log1p(x + 1.), x)

    # big matmul for reference: 292864x128 @ 128x128
    a = jnp.zeros((292864, 128), jnp.float32)
    b = jnp.zeros((128, 128), jnp.float32)
    bench("matmul 292864x128x128 f32",
          lambda k, a, b: a @ b, a, b)
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    bench("matmul 292864x128x128 bf16",
          lambda k, a, b: (a @ b), ab, bb)


if __name__ == "__main__":
    main()
