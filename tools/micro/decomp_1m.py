"""Decompose the 1M-node GraphSAGE step: where do the extra 2.6ms go?

bench.py measures 2.49 ms/step at 200k nodes and 5.08 ms/step at 1M
nodes for the SAME program (b1024 f25x10); micro_dedup_gather.py shows
XLA row gathers are table-size-insensitive (~3.2ns/row at 200k-5M), so
the slowdown is NOT the feature gather per se. This times the step with
pieces knocked out to localize the N-dependent cost.

Usage: python tools/micro/decomp_1m.py [n_nodes]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import optax

from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.graph.meta import FeatureSpec
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import sampling

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/euler_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BATCH = 1024
FANOUT = [25, 10]
STEPS = 50


def timeit(name, compiled, *args, per=STEPS):
    # sync via float() (device->host copy): on the tunneled device
    # block_until_ready can return before execution finishes (bench.py)
    float(compiled(*args))
    t0 = time.perf_counter()
    float(compiled(*args))
    ms = (time.perf_counter() - t0) / per * 1e3
    print(f"{name:48s} {ms:8.3f} ms/step")
    return ms


def main():
    t0 = time.perf_counter()
    graph = random_graph(N, 25, seed=0, device_put=False,
                         packs=("group", "fan"))
    g = graph.tensors
    print(f"build {time.perf_counter()-t0:.1f}s; "
          f"fan_over_rows={g.fan_over_rows.shape[0]:,} of {N:,}")
    meta = dataclasses.replace(
        g.meta, node_features=(FeatureSpec("feature", "dense", 128),
                               FeatureSpec("label", "dense", 16)))
    act = jnp.bfloat16

    @jax.jit
    def make_features():
        kf, kl = jax.random.split(jax.random.PRNGKey(42))
        feat = jax.random.normal(kf, (N, 128), act)
        cls = jax.random.randint(kl, (N,), 0, 16)
        return feat, jax.nn.one_hot(cls, 16, dtype=jnp.float32)

    feat_dev, lab_dev = make_features()
    put = jax.device_put
    g = g.replace(meta=meta, dense_nf={"feature": feat_dev, "label": lab_dev},
                  fan_pack=put(g.fan_pack), group_ptr=put(g.group_ptr),
                  adj_dst=put(g.adj_dst), adj_prob=put(g.adj_prob),
                  adj_alias=put(g.adj_alias),
                  fan_over_rows=put(g.fan_over_rows),
                  node_alias=jax.tree.map(put, g.node_alias))
    print(f"on device {time.perf_counter()-t0:.1f}s")

    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="sage",
                     flow=flows.SageDataFlow(FANOUT, [(0,), (0,)]),
                     dims=(128, 128), feature=feat, dtype=act)
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=16)
    tx = optax.adam(1e-3)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, jnp.arange(BATCH, dtype=jnp.int32))
    opt_state = tx.init(params)

    def loop_of(step_fn, with_refresh=True):
        def run(g, params, opt_state, key):
            if with_refresh:
                kr, key = jax.random.split(key)
                g = g.replace(fan_pack=sampling.refresh_fan_rows(
                    g.group_ptr, g.adj_dst, g.adj_prob, g.adj_alias,
                    g.fan_pack, kr, g.fan_over_rows))

            def body(carry, i):
                p, o = carry
                p2, o2, loss = step_fn(g, p, o, jax.random.fold_in(key, i))
                return (p2, o2), loss
            (params2, _), losses = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(STEPS, dtype=jnp.int32))
            return losses[-1]
        return jax.jit(run)

    def full_step(g, params, opt_state, key):
        kb, ks = jax.random.split(key)
        roots = sampling.sample_node(g, kb, BATCH, -1)

        def loss_fn(p):
            return model.apply(p, g, roots, rngs={"sample": ks})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, up), o2, loss

    def fixed_roots_step(g, params, opt_state, key):
        _, ks = jax.random.split(key)
        roots = jnp.arange(BATCH, dtype=jnp.int32)

        def loss_fn(p):
            return model.apply(p, g, roots, rngs={"sample": ks})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, up), o2, loss

    key = jax.random.PRNGKey(2)
    timeit("full step loop (bench program)", loop_of(full_step),
           g, params, opt_state, key)
    timeit("  - without refresh", loop_of(full_step, with_refresh=False),
           g, params, opt_state, key)
    timeit("  - fixed roots (no sample_node)",
           loop_of(fixed_roots_step), g, params, opt_state, key)

    # standalone pieces, scan-looped like the step
    def piece_loop(fn):
        @jax.jit
        def run(g, key):
            def body(acc, i):
                return acc + fn(g, jax.random.fold_in(key, i)), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(STEPS, dtype=jnp.int32))
            return acc
        return run

    S = BATCH + BATCH * FANOUT[0] * (1 + FANOUT[1]) + BATCH * FANOUT[0]

    def feature_gather(g, k):
        ids = jax.random.randint(k, (S,), 0, N, dtype=jnp.int32)
        return jnp.sum(g.dense_nf["feature"][ids]).astype(jnp.float32)

    def hop2_fan(g, k):
        frontier = jax.random.randint(k, (BATCH * (1 + FANOUT[0]),), 0, N,
                                      dtype=jnp.int32)
        nbr, ok = sampling.sample_neighbor_fast(g, k, frontier, (0,),
                                                FANOUT[1])
        return jnp.sum(nbr).astype(jnp.float32)

    def refresh_only(g, k):
        fp = sampling.refresh_fan_rows(g.group_ptr, g.adj_dst, g.adj_prob,
                                       g.adj_alias, g.fan_pack, k,
                                       g.fan_over_rows)
        return jnp.sum(fp[:, 0]).astype(jnp.float32)

    def samplenode_only(g, k):
        return jnp.sum(sampling.sample_node(g, k, BATCH, -1)
                       ).astype(jnp.float32)

    timeit(f"piece: feature gather [{S}] from [{N},128]bf16",
           piece_loop(feature_gather), g, key)
    timeit("piece: hop-2 fan sampling (26624 frontier)",
           piece_loop(hop2_fan), g, key)
    timeit("piece: refresh_fan_rows", piece_loop(refresh_only), g, key)
    timeit("piece: sample_node(1024)", piece_loop(samplenode_only), g, key)


if __name__ == "__main__":
    main()
