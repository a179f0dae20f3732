"""Localize the 200k-vs-1M in-program feature-gather anomaly.

decomp_1m.py: full step = 2.95ms @200k vs 5.52ms @1M, yet the ISOLATED
[292k]-row gather costs 3.36ms at BOTH sizes (micro_dedup_gather.py).
So the full program at 200k runs the gather (or its fusion) faster than
the standalone op. This times the sample->encode fragment with the real
block production, plus a 1M variant whose feature table is folded to
200k rows (n_id % 200k) — separating "CSR arrays are bigger" from
"feature table is bigger".

Usage: python tools/micro/frag_gather.py <n_nodes> [fold]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.graph.meta import FeatureSpec
from euler_tpu.ops import sampling

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/euler_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import os

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
FOLD = int(sys.argv[2]) if len(sys.argv) > 2 else 0   # feature rows if >0
INT8 = os.environ.get("EULER_FRAG_INT8") == "1"       # quantized table
BATCH, FANOUT, STEPS = 1024, [25, 10], 50


def timeit(name, fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:52s} {ms:8.3f} ms/step")


def main():
    graph = random_graph(N, 25, seed=0, device_put=False,
                         packs=("group", "fan"))
    g = graph.tensors
    NF = FOLD or N
    meta = dataclasses.replace(
        g.meta, node_features=(FeatureSpec("feature", "dense", 128),))
    if INT8:
        feat_dev = jax.jit(lambda: (jax.random.normal(
            jax.random.PRNGKey(42), (NF, 128)) * 40).astype(jnp.int8))()
    else:
        feat_dev = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(42), (NF, 128), jnp.bfloat16))()
    put = jax.device_put
    g = g.replace(meta=meta, dense_nf={"feature": feat_dev},
                  fan_pack=put(g.fan_pack), group_ptr=put(g.group_ptr),
                  adj_dst=put(g.adj_dst), adj_prob=put(g.adj_prob),
                  adj_alias=put(g.adj_alias),
                  node_alias=jax.tree.map(put, g.node_alias))
    flow = flows.SageDataFlow(FANOUT, [(0,), (0,)])

    def scan_loop(fn):
        @jax.jit
        def run(g, key):
            def body(acc, i):
                return acc + fn(g, jax.random.fold_in(key, i)), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return run

    def blocks_only(g, k):
        kb, ks = jax.random.split(k)
        roots = sampling.sample_node(g, kb, BATCH, -1)
        blocks = flow(g, ks, roots)
        return jnp.sum(blocks[0].n_id).astype(jnp.float32)

    def flow_encode(g, k):
        kb, ks = jax.random.split(k)
        roots = sampling.sample_node(g, kb, BATCH, -1)
        blocks = flow(g, ks, roots)
        nid = blocks[0].n_id
        if FOLD:
            nid = jnp.where(nid >= 0, nid % FOLD, -1)
        tab = g.dense_nf["feature"]
        rows = tab[jnp.maximum(nid, 0)]
        if INT8:
            rows = rows.astype(jnp.bfloat16) * jnp.bfloat16(1 / 40)
        x = jnp.where((nid >= 0)[:, None], rows, 0)
        return jnp.sum(x).astype(jnp.float32)

    def flow_encode_agg(g, k):
        """+ the layer-0 mean aggregation (the fusion consumer)."""
        kb, ks = jax.random.split(k)
        roots = sampling.sample_node(g, kb, BATCH, -1)
        blocks = flow(g, ks, roots)
        blk = blocks[0]
        nid = blk.n_id
        if FOLD:
            nid = jnp.where(nid >= 0, nid % FOLD, -1)
        tab = g.dense_nf["feature"]
        x = jnp.where((nid >= 0)[:, None], tab[jnp.maximum(nid, 0)], 0)
        agg = blk.aggregate_neighbors("mean", x, mask=blk.mask)
        return jnp.sum(agg).astype(jnp.float32)

    def flow_encode_sorted(g, k):
        """Gather with SORTED indices (timing-only: sum is order-
        invariant) — does locality help the big-table regime?"""
        kb, ks = jax.random.split(k)
        roots = sampling.sample_node(g, kb, BATCH, -1)
        blocks = flow(g, ks, roots)
        nid = jnp.sort(blocks[0].n_id)
        if FOLD:
            nid = jnp.where(nid >= 0, nid % FOLD, -1)
        tab = g.dense_nf["feature"]
        x = jnp.where((nid >= 0)[:, None], tab[jnp.maximum(nid, 0)], 0)
        return jnp.sum(x).astype(jnp.float32)

    def make_split_encode(parts):
        """Masked split-table gather: table cut into `parts` row-chunks
        (each small enough for XLA to stage into VMEM); every chunk
        gathers all S indices, out-of-range ones clamped to a hot
        boundary row and masked out, partial results summed."""
        def fn(g, k):
            kb, ks = jax.random.split(k)
            roots = sampling.sample_node(g, kb, BATCH, -1)
            blocks = flow(g, ks, roots)
            nid = blocks[0].n_id
            tab = g.dense_nf["feature"]
            n = tab.shape[0]
            chunk = -(-n // parts)
            out = None
            for c in range(parts):
                lo = c * chunk
                sub = jax.lax.dynamic_slice_in_dim(
                    tab, lo, min(chunk, n - lo), axis=0)
                loc = nid - lo
                inr = (nid >= 0) & (loc >= 0) & (loc < sub.shape[0])
                rows = sub[jnp.where(inr, loc, 0)]
                part = jnp.where(inr[:, None], rows, 0)
                out = part if out is None else out + part
            return jnp.sum(out).astype(jnp.float32)
        return fn

    key = jax.random.PRNGKey(7)
    tag = f"N={N//1000}k" + (f" fold={FOLD//1000}k" if FOLD else "")
    timeit(f"blocks only           {tag}", scan_loop(blocks_only), g, key)
    timeit(f"flow+encode           {tag}", scan_loop(flow_encode), g, key)
    timeit(f"flow+encode+agg       {tag}", scan_loop(flow_encode_agg),
           g, key)
    timeit(f"flow+encode SORTED    {tag}", scan_loop(flow_encode_sorted),
           g, key)
    for parts in (4, 8):
        timeit(f"flow+encode split{parts}    {tag}",
               scan_loop(make_split_encode(parts)), g, key)


if __name__ == "__main__":
    main()
