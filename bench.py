"""Benchmark: edges/s/chip on the GraphSAGE hot path + whole-graph SpMM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is edges/s/chip for the fused
sample->gather->aggregate training step (the path the reference serves via
C++ graph engine + gRPC + TF CPU kernels; here it is one XLA program on
the chip). BASELINE.json publishes no reference throughput, so
vs_baseline is reported against a fixed nominal target of 1e8 edges/s
(speed-of-light-ish for this op mix on one chip; >1.0 beats it).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from euler_tpu.dataflow import flows
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.models import encoders, gnn
    from euler_tpu.ops import mp_ops, sampling

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # scale down on CPU so CI-style runs stay fast
    n_nodes = 200_000 if on_tpu else 5_000
    avg_deg = 25
    feat_dim = 128
    batch = 1024 if on_tpu else 256
    fanout = [25, 10]

    graph = random_graph(n_nodes, avg_deg, feat_dim=feat_dim, n_classes=16,
                         seed=0)
    g = graph.tensors

    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="sage",
                     flow=flows.SageDataFlow(fanout, [(0,), (0,)]),
                     dims=(128, 128), feature=feat)
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=16)
    tx = optax.adam(1e-3)

    roots0 = jnp.arange(batch, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, roots0)  # jit: eager init is
    # per-op dispatch, pathological on tunneled devices
    opt_state = tx.init(params)

    # graph passed as a jit argument — closure capture would embed it as
    # program constants (catastrophic compile + dispatch cost)
    def step(g, params, opt_state, key):
        kb, ks = jax.random.split(key)
        roots = sampling.sample_node(g, kb, batch, -1)

        def loss_fn(p):
            return model.apply(p, g, roots, rngs={"sample": ks})["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # the whole training loop lives on-device (lax.scan of optimizer
    # steps), the idiomatic JAX pattern; a python-driven per-step loop
    # would measure host->device dispatch latency, not the framework
    steps_per_loop = 50 if on_tpu else 5

    @jax.jit
    def run_loop(g, params, opt_state, key):
        def body(carry, i):
            params, opt_state = carry
            p2, o2, loss = step(g, params, opt_state,
                                jax.random.fold_in(key, i))
            return (p2, o2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        return params, opt_state, losses[-1]

    # edges touched per step: hop1 B*f1 + hop2 B*f1*f2, plus self loops
    edges_per_step = batch * fanout[0] + batch * fanout[0] * fanout[1] \
        + batch + batch * fanout[0]

    # warmup/compile. NB: sync via float(loss) (device->host copy), not
    # block_until_ready — on tunneled device platforms the latter can
    # return before execution finishes, inflating throughput ~100x.
    params, opt_state, loss = run_loop(g, params, opt_state,
                                       jax.random.PRNGKey(2))
    float(loss)

    outer = 4 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(outer):
        params, opt_state, loss = run_loop(g, params, opt_state,
                                           jax.random.PRNGKey(3 + i))
    float(loss)
    dt = time.perf_counter() - t0
    edges_per_sec = edges_per_step * steps_per_loop * outer / dt

    print(json.dumps({
        "metric": "sampled_aggregate_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / 1e8, 4),
    }))


if __name__ == "__main__":
    main()
