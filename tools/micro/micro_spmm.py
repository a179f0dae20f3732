"""Full-graph SpMM strategies on TPU: what makes gcn-mode slow?

BENCH_SUITE r5: full-graph GCN = 25.5M edges/s (0.25x) while sampled
paths hit 1.25x. The full-graph block aggregates per-edge messages with
jax.ops.segment_sum over [E, D] updates. CSR slots are already grouped
by target (dst of the message = adj_src of the stored edge, ascending),
so sorted-segment and pointer-difference (cumsum) formulations are
available. Measures, per 2-layer-equivalent pass:

  a) random row gather x[src]            (the unavoidable read)
  b) segment_sum, unsorted flag          (what the block does today)
  c) segment_sum, indices_are_sorted     (sorted fast path?)
  d) gather + sorted segment_sum fused   (one conv layer's aggregate)
  e) cumsum + ptr-difference             (scatter-free formulation)

x varies per iteration (scaled by i) so nothing hoists out of the scan;
the adjacency is fixed across iterations like a real training loop.
"""
import time

import jax
import jax.numpy as jnp

N = 100_000
E = 2_500_000
D = 128
ITERS = 5


def bench(name, fn, *args, per_rows=E):
    @jax.jit
    def loop(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(out).astype(jnp.float32), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc
    float(loop(args))
    t0 = time.perf_counter()
    float(loop(args))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {ms:8.3f} ms  ({ms*1e6/per_rows:5.1f} ns/edge)")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.bfloat16)
    src = jax.random.randint(key, (E,), 0, N, dtype=jnp.int32)
    # dst sorted ascending with ~E/N edges per node (CSR layout)
    dst_sorted = jnp.sort(jax.random.randint(
        jax.random.fold_in(key, 1), (E,), 0, N, dtype=jnp.int32))
    counts = jnp.zeros((N,), jnp.int32).at[dst_sorted].add(1)
    ptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(counts)]).astype(jnp.int32)
    dst_rand = jax.random.permutation(jax.random.fold_in(key, 2),
                                      dst_sorted)

    def xi(i, x):
        return x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))

    # NB every array rides in as a jit ARGUMENT — closure capture embeds
    # it as a program constant and the remote-compile upload explodes
    bench("a  gather x[src] only",
          lambda i, x, s: xi(i, x)[s], x, src)
    upd = jax.random.normal(key, (E, D), jnp.bfloat16)

    bench("b  segment_sum unsorted idx",
          lambda i, u, d: jax.ops.segment_sum(xi(i, u), d,
                                              num_segments=N),
          upd, dst_rand)
    bench("c  segment_sum sorted idx + flag",
          lambda i, u, d: jax.ops.segment_sum(xi(i, u), d, num_segments=N,
                                              indices_are_sorted=True),
          upd, dst_sorted)
    bench("c' segment_sum sorted idx, no flag",
          lambda i, u, d: jax.ops.segment_sum(xi(i, u), d,
                                              num_segments=N),
          upd, dst_sorted)
    bench("d  gather + sorted segsum (one layer)",
          lambda i, x, s, d: jax.ops.segment_sum(
              xi(i, x)[s], d, num_segments=N, indices_are_sorted=True),
          x, src, dst_sorted)

    def cumsum_spmm(i, x, s, ptr):
        vals = xi(i, x)[s].astype(jnp.float32)
        cs = jnp.cumsum(vals, axis=0)
        z = jnp.zeros((1, D), jnp.float32)
        cs = jnp.concatenate([z, cs], axis=0)       # cs[k] = sum first k
        return (cs[ptr[1:]] - cs[ptr[:-1]]).astype(jnp.bfloat16)

    bench("e  gather + cumsum ptr-diff (one layer)", cumsum_spmm,
          x, src, ptr)


if __name__ == "__main__":
    main()
