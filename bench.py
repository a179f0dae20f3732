"""Benchmark: edges/s/chip on the GraphSAGE hot path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is edges/s/chip for the fused
sample->gather->aggregate training step (the path the reference serves via
C++ graph engine + gRPC + TF CPU kernels; here it is one XLA program on
the chip). BASELINE.json publishes no reference throughput, so
vs_baseline is reported against a fixed nominal target of 1e8 edges/s
(speed-of-light-ish for this op mix on one chip; >1.0 beats it).

Wall-clock design: the bench runs on a tunneled device with erratic
latency (multi-minute stalls have been observed), so it defends itself:
  * minimal tunnel transfer — the store is built with device_put=False
    and only the packs the hot path reads; jax.jit prunes unused args, so
    untouched CSR columns never cross the tunnel; node features/labels
    are synthesized ON DEVICE (the graph is random anyway);
  * one dispatch per measured loop — the fan-reservoir refresh
    (RunConfig.reservoir_refresh semantics) is fused into the jitted
    scan program rather than dispatched separately;
  * a provisional result is recorded as soon as the first timed loop
    lands; SIGTERM (driver timeout) and an internal SIGALRM deadline
    both emit the best measurement so far instead of dying silently.
"""
import json
import os
import signal
import sys
import time

_result = {}
_DEADLINE_S = 540  # emit whatever we have before a ~10min external cap.
# The axon remote-compile service has multi-minute variance (observed
# 50s..420s for the SAME program); measured execution after compile is
# ~15s, so the deadline mainly guards the compile phase. SIGTERM from a
# shorter external timeout still salvages whatever was recorded.


def _emit_and_exit(*_):
    if _result:
        print(json.dumps(_result), flush=True)
    os._exit(0 if _result else 1)


def _record(edges, seconds):
    v = edges / seconds
    _result.update(metric="sampled_aggregate_edges_per_sec_per_chip",
                   value=round(v, 1), unit="edges/s",
                   vs_baseline=round(v / 1e8, 4))


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(_DEADLINE_S)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    try:  # persistent compile cache: repeat runs skip XLA compilation
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/euler_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from euler_tpu.dataflow import flows
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.graph.meta import FeatureSpec
    from euler_tpu.models import encoders, gnn
    from euler_tpu.ops import sampling

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # scale down on CPU so CI-style runs stay fast
    n_nodes = 200_000 if on_tpu else 5_000
    avg_deg = 25
    feat_dim = 128
    n_classes = 16
    batch = 1024 if on_tpu else 256
    fanout = [25, 10]

    graph = random_graph(n_nodes, avg_deg, seed=0, device_put=False,
                         packs=("group", "fan"))
    g = graph.tensors

    # declare the feature specs the model reads, synthesize values on device
    meta = dataclasses.replace(
        g.meta,
        node_features=(FeatureSpec("feature", "dense", feat_dim),
                       FeatureSpec("label", "dense", n_classes)))

    # bfloat16 on the chip: halves the dominant HBM traffic (the
    # [S_src, D] random feature row gather + per-edge views); f32 on the
    # CPU backend where bf16 is software-emulated (slow)
    act_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def make_features():
        kf, kl = jax.random.split(jax.random.PRNGKey(42))
        feat = jax.random.normal(kf, (n_nodes, feat_dim), act_dtype)
        cls = jax.random.randint(kl, (n_nodes,), 0, n_classes)
        lab = jax.nn.one_hot(cls, n_classes, dtype=jnp.float32)
        return feat, lab

    feat_dev, lab_dev = make_features()

    put = jax.device_put
    g = g.replace(
        meta=meta,
        dense_nf={"feature": feat_dev, "label": lab_dev},
        fan_pack=put(g.fan_pack),
        group_ptr=put(g.group_ptr),
        adj_dst=put(g.adj_dst),
        adj_prob=put(g.adj_prob),
        adj_alias=put(g.adj_alias),
        fan_over_rows=put(g.fan_over_rows),
        node_alias=jax.tree.map(put, g.node_alias),
    )

    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="sage",
                     flow=flows.SageDataFlow(fanout, [(0,), (0,)]),
                     dims=(128, 128), feature=feat,
                     dtype=act_dtype if on_tpu else None)
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=n_classes)
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
        # unfreeze the fan reservoir once per loop (the estimator's
        # RunConfig.reservoir_refresh semantics), fused into the same
        # program — a separate dispatch costs ~0.2s on the tunnel
        kr, key = jax.random.split(key)
        g = g.replace(fan_pack=sampling.refresh_fan_rows(
            g.group_ptr, g.adj_dst, g.adj_prob, g.adj_alias, g.fan_pack,
            kr, g.fan_over_rows))

        def body(carry, i):
            params, opt_state = carry
            p2, o2, loss = step(g, params, opt_state,
                                jax.random.fold_in(key, i))
            return (p2, o2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        return g.fan_pack, params, opt_state, losses[-1]

    # edges touched per step: hop1 B*f1 + hop2 B*f1*f2, plus self loops
    edges_per_step = batch * fanout[0] + batch * fanout[0] * fanout[1] \
        + batch + batch * fanout[0]

    # AOT compile so the (slow, variable on the remote-compile service)
    # build phase is fully separated from the first timed execution — the
    # provisional result lands within one loop of compile finishing
    compiled = run_loop.lower(g, params, opt_state,
                              jax.random.PRNGKey(2)).compile()
    # warmup exec. NB: sync via float(loss) (device->host copy), not
    # block_until_ready — on tunneled device platforms the latter can
    # return before execution finishes, inflating throughput ~100x.
    fp, params, opt_state, loss = compiled(g, params, opt_state,
                                           jax.random.PRNGKey(2))
    g = g.replace(fan_pack=fp)
    float(loss)
    # timed warmup loop -> provisional result (salvageable on timeout)
    t0 = time.perf_counter()
    fp, params, opt_state, loss = compiled(g, params, opt_state,
                                           jax.random.PRNGKey(100))
    g = g.replace(fan_pack=fp)
    float(loss)
    _record(edges_per_step * steps_per_loop, time.perf_counter() - t0)

    outer = 4 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(outer):
        fp, params, opt_state, loss = compiled(g, params, opt_state,
                                               jax.random.PRNGKey(3 + i))
        g = g.replace(fan_pack=fp)
    float(loss)
    _record(edges_per_step * steps_per_loop * outer,
            time.perf_counter() - t0)
    signal.alarm(0)
    print(json.dumps(_result), flush=True)


if __name__ == "__main__":
    main()
