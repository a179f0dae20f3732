"""True gather cost model: loop-VARYING indices (no hoisting possible)."""
import time

import jax
import jax.numpy as jnp

ITERS = 100
E = 5_000_000
N = 200_000


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


def main():
    base = bench("baseline randint 256k",
                 lambda k: jax.random.randint(k, (256000,), 0, E))

    # row-width sweep, 256k rows from [5M, W]
    for W in (1, 4, 8, 16, 32, 64, 128):
        tab = jnp.zeros((E, W), jnp.int32) if W > 1 else \
            jnp.zeros((E,), jnp.int32)
        bench(f"256k rows from [5M,{W}] int32",
              lambda k, t: t[jax.random.randint(k, (256000,), 0, E)], tab)

    # M sweep on the feature-like table [200k, 128] f32
    feat = jnp.zeros((N, 128), jnp.float32)
    for M in (25600, 131072, 292864):
        bench(f"{M} rows from [200k,128] f32",
              lambda k, t, m=M: t[jax.random.randint(k, (m,), 0, N)], feat)

    featb = jnp.zeros((N, 128), jnp.bfloat16)
    bench("292864 rows from [200k,128] bf16",
          lambda k, t: t[jax.random.randint(k, (292864,), 0, N)], featb)
    feat256 = jnp.zeros((N, 256), jnp.float32)
    bench("292864 rows from [200k,256] f32",
          lambda k, t: t[jax.random.randint(k, (292864,), 0, N)], feat256)

    # 25600 rows of the per-node padded-table design [200k,128]
    pack = jnp.zeros((N, 128), jnp.int32)
    bench("25600 rows from [200k,128] int32 (node-row)",
          lambda k, t: t[jax.random.randint(k, (25600,), 0, N)], pack)

    # in-row selection: take count=10 of D=32 within each row, via one-hot
    D, B, C = 32, 25600, 10
    rows = jnp.zeros((B, D), jnp.float32)
    def sel_onehot(k, r):
        pos = jax.random.randint(k, (B, C), 0, D)
        oh = jax.nn.one_hot(pos, D, dtype=jnp.float32)     # [B,C,D]
        return jnp.einsum("bcd,bd->bc", oh, r)
    bench("in-row one-hot select [25600,10] of D=32", sel_onehot, rows)

    def sel_take(k, r):
        pos = jax.random.randint(k, (B, C), 0, D)
        return jnp.take_along_axis(r, pos, axis=1)
    bench("in-row take_along_axis [25600,10] of D=32", sel_take, rows)

    # dedup: sort 292k ids
    bench("sort 292k int32",
          lambda k: jnp.sort(jax.random.randint(k, (292864,), 0, N)))

    # scatter_add 256k rows of 128 into 25600 (backward of gather)
    upd = jnp.zeros((256000, 128), jnp.float32)
    def scat(k, u):
        seg = jax.random.randint(k, (256000,), 0, 25600)
        return jax.ops.segment_sum(u, seg, num_segments=25600)
    bench("segment_sum 256k x128 -> 25600", scat, upd)


if __name__ == "__main__":
    main()
