"""Microbenchmark: unique/sort-before-gather on the hop-2 feature path.

Round-4 analysis pinned the single-chip wall at the [S_src, D] feature
row gather (S=292,864 rows for the bench config): 124M edges/s at a
200k-node table dropping to 61M at 1M nodes — same program, same row
count, 5x bigger gather source. This measures whether the reference's
unique+gather rewrite (euler/parser/optimizer.cc:91-229, id_unique_op.cc)
has a TPU-native win: XLA gather throughput vs table size, and the cost
of the sort/dedup/inflate machinery that would buy locality back.

Candidates (all static-shape, jit-safe):
  A. baseline: random row gather [S] from [N, D] bf16
  B. sorted gather: argsort ids, gather in sorted order, invert with one
     [S, D] self-gather (locality from monotone indices)
  C. sorted dedup gather: like B but duplicate positions fetch row 0
     (hot) and are filled from their segment head by the same inverting
     self-gather (fewer distinct rows + locality)
  D. piece costs: argsort(S), [S, D] self-gather, index arithmetic

Run: python tools/micro/micro_dedup_gather.py  (TPU by default)
"""
import time

import jax
import jax.numpy as jnp

ITERS = 30
S = 292_864          # bench-config source-set size (b1024 f25x10)
D = 128


def bench(name, fn, *args, rows=S):
    """fn(key_i, *args) MUST derive its gather indices from key_i: a
    loop-invariant body (fixed index array) gets hoisted out of the scan
    by XLA and measures the empty-loop floor (~0.9ms), not the op."""
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
    print(f"{name:58s} {ms:8.3f} ms  ({ms*1e6/rows:6.1f} ns/row)")
    return ms


def sorted_gather(tab, ids, dedup: bool):
    order = jnp.argsort(ids)
    sid = ids[order]
    if dedup:
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        fetch = jnp.where(is_new, sid, 0)       # dupes re-read hot row 0
        rows = tab[fetch]
        seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        pos = jnp.arange(S, dtype=jnp.int32)
        head = jnp.full((S,), S - 1, jnp.int32).at[seg].min(pos)
        # compose fill + inverse permutation into ONE compact gather
        inv = jnp.zeros((S,), jnp.int32).at[order].set(head[seg])
        return rows[inv]
    rows = tab[sid]
    inv = jnp.zeros((S,), jnp.int32).at[order].set(
        jnp.arange(S, dtype=jnp.int32))
    return rows[inv]


def _uniform_ids(k, n):
    return jax.random.randint(k, (S,), 0, n, dtype=jnp.int32)


def _skew_ids(k, n):
    u = jax.random.uniform(k, (S,))
    return jnp.clip((u ** 3.0) * n, 0, n - 1).astype(jnp.int32)


def main():
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.devices()[0].platform}  S={S} D={D} bf16")
    for N in (200_000, 1_000_000, 5_000_000):
        tab = jax.random.normal(key, (N, D), jnp.bfloat16)
        for tag, mk in (("uniform", _uniform_ids), ("skew^3", _skew_ids)):
            nuniq = int(jnp.unique(mk(key, N)).shape[0])
            print(f"-- N={N:>9,} {tag}: {nuniq:,} unique of {S:,}")
            bench(f"A random gather      N={N//1000}k {tag}",
                  lambda k, t, n=N, f=mk: t[f(k, n)], tab)
            bench(f"B sorted+invert      N={N//1000}k {tag}",
                  lambda k, t, n=N, f=mk: sorted_gather(t, f(k, n), False),
                  tab)
            bench(f"C sorted+dedup+fill  N={N//1000}k {tag}",
                  lambda k, t, n=N, f=mk: sorted_gather(t, f(k, n), True),
                  tab)
        # presorted gather: upper bound of what locality can buy
        bench(f"A' presorted-idx gather N={N//1000}k",
              lambda k, t, n=N: t[jnp.sort(_uniform_ids(k, n))], tab)
    # piece costs (per-iteration fresh inputs so nothing is hoisted)
    bench("D randint [S] alone", lambda k: _uniform_ids(k, 1_000_000))
    bench("D argsort int32 [S]",
          lambda k: jnp.argsort(_uniform_ids(k, 1_000_000)))
    comp = jax.random.normal(key, (S, D), jnp.bfloat16)
    bench("D self-gather [S,D] compact",
          lambda k, t: t[jax.random.permutation(k, S).astype(jnp.int32)],
          comp)
    bench("D scatter-min [S] (seg head)",
          lambda k: jnp.full((S,), S - 1, jnp.int32).at[
              jnp.sort(_uniform_ids(k, S // 2))].min(
              jnp.arange(S, dtype=jnp.int32)))


if __name__ == "__main__":
    main()
