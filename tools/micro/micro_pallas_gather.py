"""Can a Pallas DMA-pipeline gather beat XLA's ~11ns/row gather?"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 200_000
M = 292864  # rows to gather
C = 1024    # rows per grid chunk (idx tile alignment: T(1024))
W = 128


def gather_kernel(idx_ref, table_ref, out_ref, sem):
    def issue(i, _):
        pltpu.make_async_copy(
            table_ref.at[idx_ref[i]], out_ref.at[i], sem.at[i % 16]
        ).start()
        return 0
    jax.lax.fori_loop(0, C, issue, 0)

    def wait(i, _):
        pltpu.make_async_copy(
            table_ref.at[idx_ref[i]], out_ref.at[i], sem.at[i % 16]
        ).wait()
        return 0
    jax.lax.fori_loop(0, C, wait, 0)


@jax.jit
def pallas_gather(table, idx):
    grid = M // C
    return pl.pallas_call(
        gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((C,), lambda c: (c,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((C, W), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
    )(idx, table)


def bench(name, make_fn, *args, iters=100):
    @jax.jit
    def loop(key, args):
        def body(acc, i):
            out = make_fn(jax.random.fold_in(key, i), *args)
            return acc + jnp.sum(out).astype(jnp.float32), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc
    float(loop(jax.random.PRNGKey(0), args))
    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(1), args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {ms:8.3f} ms  ({ms*1e6/M:5.2f} ns/row)")
    return ms


def main():
    table = jnp.zeros((N, W), jnp.float32)
    # correctness check first
    tab_np = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W)
    idx0 = jax.random.randint(jax.random.PRNGKey(3), (M,), 0, N,
                              dtype=jnp.int32)
    out = pallas_gather(tab_np, idx0)
    ref = tab_np[idx0]
    ok = bool(jnp.all(out == ref))
    print("correct:", ok)
    assert ok

    bench("xla gather 292k x [200k,128]",
          lambda k, t: t[jax.random.randint(k, (M,), 0, N)], table)
    bench("pallas DMA gather 292k x [200k,128]",
          lambda k, t: pallas_gather(
              t, jax.random.randint(k, (M,), 0, N, dtype=jnp.int32)), table)


if __name__ == "__main__":
    main()
