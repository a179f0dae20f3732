"""Decompose the bench step time: sampling vs feature gather vs conv math.

Measurement matches bench.py: each component is run inside a lax.scan of
ITERS steps in ONE dispatched program, synced via float() scalar transfer
(block_until_ready is unreliable on tunneled device platforms).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from euler_tpu.dataflow import flows
from euler_tpu.datasets.random_graph import random_graph
from euler_tpu.models import encoders, gnn
from euler_tpu.ops import mp_ops, sampling

ITERS = 50


def bench_scan(name, fn, g, *args, iters=ITERS):
    """fn(g, key, *args) -> array; scan it with folded keys, time it."""

    @jax.jit
    def loop(g, key, args):
        def body(acc, i):
            out = fn(g, jax.random.fold_in(key, i), *args)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return acc + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    key = jax.random.PRNGKey(0)
    float(loop(g, key, args))  # compile+warm
    t0 = time.perf_counter()
    float(loop(g, jax.random.PRNGKey(1), args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {ms:8.3f} ms")
    return ms


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n_nodes = 200_000 if on_tpu else 5_000
    avg_deg = 25
    feat_dim = 128
    batch = 1024 if on_tpu else 256
    fanout = [25, 10]

    graph = random_graph(n_nodes, avg_deg, feat_dim=feat_dim, n_classes=16,
                         seed=0)
    g = graph.tensors
    total_edges = batch * fanout[0] + batch * fanout[0] * fanout[1]
    print(f"device={dev.platform} n_nodes={n_nodes} E={g.n_edges} "
          f"edges/step={total_edges}")

    roots = jnp.arange(batch, dtype=jnp.int32)

    bench_scan("sample_node(1024)",
               lambda g, k: sampling.sample_node(g, k, batch, -1), g)
    bench_scan("hop1 sample 1024x25",
               lambda g, k, r: sampling.sample_neighbor(g, k, r, (0,),
                                                        fanout[0])[0],
               g, roots)
    h1flat = jax.jit(lambda g, k, r: sampling.sample_neighbor(
        g, k, r, (0,), fanout[0])[0])(g, jax.random.PRNGKey(9),
                                      roots).reshape(-1)
    bench_scan("hop2 sample 25600x10",
               lambda g, k, r: sampling.sample_neighbor(g, k, r, (0,),
                                                        fanout[1])[0],
               g, h1flat)

    flow = flows.SageDataFlow(fanout, [(0,), (0,)])

    def run_flow(g, k, r):
        blks = flow(g, k, r)
        return [b.n_id for b in blks]
    bench_scan("full SageDataFlow", run_flow, g, roots)

    n_tot = batch * (1 + fanout[0] + fanout[0] * fanout[1]) + \
        batch * fanout[0]  # rough; actual n_id of deepest block
    blocks = jax.jit(lambda g, k, r: flow(g, k, r))(
        g, jax.random.PRNGKey(9), roots)
    n_id0 = blocks[0].n_id
    print(f"  deepest n_id size: {n_id0.shape[0]}")

    def feat_gather(g, k, ids):
        # use key to avoid CSE across scan iters: random permute-free index
        off = jax.random.randint(k, (1,), 0, 4)[0] * 0
        return g.dense_nf["feature"][jnp.maximum(ids + off, 0)]
    bench_scan(f"feature gather {n_id0.shape[0]}x{feat_dim}",
               feat_gather, g, n_id0)

    def flow_feat(g, k, r):
        blks = flow(g, k, r)
        return g.dense_nf["feature"][jnp.maximum(blks[0].n_id, 0)]
    bench_scan("flow + feature", flow_feat, g, roots)

    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="sage", flow=flow, dims=(128, 128), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name="label", label_dim=16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, roots)

    bench_scan("full forward", lambda g, k, p, r: model.apply(
        p, g, r, rngs={"sample": k})["loss"], g, params, roots)

    bench_scan("forward+backward", lambda g, k, p, r: jax.grad(
        lambda p: model.apply(p, g, r, rngs={"sample": k})["loss"])(p),
        g, params, roots)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(g, k, params, opt_state):
        kb, ks = jax.random.split(k)
        r = sampling.sample_node(g, kb, batch, -1)
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, g, r, rngs={"sample": ks})["loss"])(
                params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)[
            "params"]["embedder"]["out_fc"]["bias"]
    ms = bench_scan("full train step", step, g, params, opt_state)
    print(f"  -> {total_edges / ms * 1e3 / 1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
