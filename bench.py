"""Benchmark: edges/s/chip on the GraphSAGE hot path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric is edges/s/chip for the fused
sample->gather->aggregate training step (the path the reference serves via
C++ graph engine + gRPC + TF CPU kernels, tf_euler/kernels/
sample_fanout_op.cc:30-148; here it is one XLA program on the chip).
BASELINE.json publishes no reference throughput, so vs_baseline is
reported against a fixed nominal target of 1e8 edges/s on TPU
(speed-of-light-ish for this op mix on one chip; >1.0 beats it). On the
CPU backend the config is a scaled-down smoke test and vs_baseline is
``null`` — a CPU number must never be mistaken for a chip result.

Failure-survival design (the tunneled device has shown multi-minute
compile variance AND indefinite *execution* stalls; in-process signal
handlers cannot fire while the main thread is blocked inside the device
runtime's C call, so they are structurally insufficient):

  * bench.py is a WATCHDOG PARENT: pure stdlib, no jax import. It spawns
    the measurement child in its own process group and reads its stdout.
  * the child emits a complete JSON result line after EVERY timed loop
    (first one within a single loop of compile finishing) and `#stage`
    progress markers between phases.
  * the parent enforces deadlines with SIGKILL on the child's process
    group — no cooperation from a wedged runtime required — and prints
    the LAST JSON line seen.
  * if the TPU child produces no result by the fallback deadline, the
    parent kills it and reruns the child on the CPU backend so the run
    still yields an honest (vs_baseline: null) measurement, annotated
    with the stage at which the device stalled.
  * if nothing ever lands, the parent prints a structured failure record
    ({"error": "device_unresponsive", "stage": ...}) so a dead tunnel is
    distinguishable from broken code.

Tunables (env): EULER_BENCH_DEADLINE_S (total, default 420),
EULER_BENCH_FALLBACK_S (TPU first-result deadline, default 300).
"""
import json
import os
import signal
import subprocess
import sys
import time

# ---------------------------------------------------------------------------
# watchdog parent
# ---------------------------------------------------------------------------

TOTAL_DEADLINE_S = float(os.environ.get("EULER_BENCH_DEADLINE_S", 420))
FALLBACK_S = float(os.environ.get("EULER_BENCH_FALLBACK_S", 300))
RETRY_MIN_S = float(os.environ.get("EULER_BENCH_RETRY_MIN_S", 60))


def _kill_group(proc):
    """SIGTERM grace then SIGKILL: an abruptly killed child can leave a
    wedged device-tunnel session server-side that blocks the NEXT
    client; a brief graceful window lets the runtime disconnect."""
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError, OSError):
        pass
    try:
        proc.wait(timeout=3)
    except Exception:
        pass
    if proc.poll() is None:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError, OSError):
            pass
    try:
        proc.wait(timeout=5)
    except Exception:
        pass


def _run_child(extra_env, deadline_s, state):
    """Run one measurement child; harvest JSON/stage lines until deadline.

    Returns True if at least one JSON result landed from this child.
    """
    import selectors
    env = dict(os.environ)
    env.update(extra_env)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=sys.stderr,
        start_new_session=True, env=env)
    state["procs"].append(proc)
    # non-blocking raw reads: select() readability does NOT guarantee a
    # complete line, and a blocking readline() on a child that emitted a
    # partial line then wedged would stall the parent past its deadline
    fd = proc.stdout.fileno()
    os.set_blocking(fd, False)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    t_end = time.monotonic() + deadline_s
    got = False
    buf = b""

    def handle(raw):
        nonlocal got
        line = raw.decode("utf-8", errors="replace").strip()
        if line.startswith("#stage"):
            state["stage"] = line.split(None, 1)[1] if " " in line \
                else line
        elif line.startswith("{"):
            try:
                state["result"] = json.loads(line)
                got = True
            except ValueError:
                pass

    try:
        while True:
            left = t_end - time.monotonic()
            if left <= 0:
                break
            if not sel.select(timeout=min(left, 1.0)):
                if proc.poll() is not None:
                    break
                continue
            try:
                chunk = os.read(fd, 65536)
            except BlockingIOError:
                continue
            if chunk == b"":         # EOF
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                handle(line)
        if buf:                      # unterminated tail at EOF/deadline
            handle(buf)
    finally:
        sel.close()
        if proc.poll() is None:
            _kill_group(proc)
    return got


def parent():
    state = {"result": None, "stage": "spawn", "procs": []}

    def _bail(*_):
        for p in state["procs"]:
            if p.poll() is None:
                _kill_group(p)
        _emit(state)
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGINT, _bail)

    t0 = time.monotonic()
    budget = min(FALLBACK_S, TOTAL_DEADLINE_S)
    # two TPU attempts: tunnel stalls are intermittent and a fresh
    # process (fresh device connection) frequently recovers
    got = _run_child({}, budget * 0.55, state)
    tpu_stage = state["stage"]
    if not got:
        left = budget - (time.monotonic() - t0)
        if left > RETRY_MIN_S:
            # give the device terminal time to reap the killed session
            # before reconnecting (a lingering session blocks new clients)
            time.sleep(min(20.0, max(2.0, left * 0.1)))
            left = budget - (time.monotonic() - t0)
            got = _run_child({}, left, state)
            tpu_stage += ";retry:" + state["stage"]
    if not got:
        # both TPU runs produced nothing — salvage with a CPU-backend run
        # so the driver still records an honest number, annotated with
        # where the device stalled.
        left = TOTAL_DEADLINE_S - (time.monotonic() - t0) - 10
        if left > 30:
            if _run_child({"EULER_BENCH_PLATFORM": "cpu"}, left, state):
                state["result"]["error"] = \
                    "tpu_unresponsive_at:" + tpu_stage
    _emit(state)


def _emit(state):
    res = state["result"]
    if res is None:
        res = {"metric": "sampled_aggregate_edges_per_sec_per_chip",
               "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
               "error": "device_unresponsive",
               "stage": state["stage"]}
    print(json.dumps(res), flush=True)


# ---------------------------------------------------------------------------
# measurement child
# ---------------------------------------------------------------------------

def _stage(name):
    print(f"#stage {name}", flush=True)


def child():
    """Measurement child. EULER_BENCH_MODEL picks the workload:

    sage (default) | gat | gin  — sampled 2-hop flow, conv swapped
      (GAT adds the SDDMM/segment-softmax path of gat_conv.py:41-75,
      GIN the sum-pool path of gin_conv.py:27-60)
    rgcn  — sampled flow with payload sampling (true edge types) through
      the relation-batched einsum (relation_conv.py:33-69)
    gcn   — full-graph SpMM path (whole_dataflow.py), every edge every
      layer
    transe — embedding-bound TransX step (transX.py margin loss, global
      edge sampling + negative entity draws)

    All modes print the same one-line JSON contract.
    """
    import dataclasses

    _stage("import_jax")
    import jax

    # the CPU fallback must be forced through jax.config: this image's
    # sitecustomize pre-registers the tunneled TPU plugin, so the
    # JAX_PLATFORMS env var alone does not stick (see tests/conftest.py)
    if os.environ.get("EULER_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["EULER_BENCH_PLATFORM"])
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
    _stage(f"devices platform={dev.platform}")

    # device aliveness probe: a tiny program that compiles in seconds —
    # if even this stalls, the stage marker pins the blame on the tunnel
    probe = jax.jit(lambda x: (x @ x).sum())
    float(probe(jnp.ones((256, 256), jnp.float32)))
    _stage("probe_matmul_done")

    mode = os.environ.get("EULER_BENCH_MODEL", "sage")
    if mode == "gcn":
        return _gcn_child(jax, jnp, optax, dev, on_tpu)
    if mode == "transe":
        return _transe_child(jax, jnp, optax, dev, on_tpu)

    # ---- sampled modes: sage (default) / gat / gin / rgcn ----
    # scale down on CPU so CI-style runs stay fast; env knobs for sweeps
    n_nodes = int(os.environ.get("EULER_BENCH_NODES",
                                 200_000 if on_tpu else 5_000))
    avg_deg = 25
    feat_dim = 128
    n_classes = 16
    batch = int(os.environ.get("EULER_BENCH_BATCH",
                               1024 if on_tpu else 256))
    fanout = [25, 10]
    rgcn = mode == "rgcn"
    n_etypes = 4 if rgcn else 1

    def record(edges, seconds, phase):
        v = edges / seconds
        out = {"metric": "sampled_aggregate_edges_per_sec_per_chip",
               "model": mode,
               "value": round(v, 1), "unit": "edges/s",
               # a CPU number measured on a toy config must never read as
               # a chip result: vs_baseline only on real TPU hardware
               "vs_baseline": round(v / 1e8, 4) if on_tpu else None,
               "platform": dev.platform, "phase": phase,
               "config": f"b{batch}_f{fanout[0]}x{fanout[1]}_n{n_nodes}"}
        print(json.dumps(out), flush=True)

    _stage("build_graph")
    # all sampled modes ride 128-lane fan rows; rgcn uses the UNION fan
    # pack (one row per node over all types, typed draws decoded from
    # the packed lanes — ops/alias.py FANU_*)
    graph = random_graph(n_nodes, avg_deg, seed=0, device_put=False,
                         num_edge_types=n_etypes,
                         packs=("group", "fanu") if rgcn
                         else ("group", "fan"))
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

    # minimal tunnel transfer: only the packs the hot path reads cross the
    # wire; jax.jit prunes unused GraphTensors fields
    put = jax.device_put
    common = dict(
        meta=meta,
        dense_nf={"feature": feat_dev, "label": lab_dev},
        group_ptr=put(g.group_ptr),
        adj_dst=put(g.adj_dst),
        adj_prob=put(g.adj_prob),
        adj_alias=put(g.adj_alias),
        node_alias=jax.tree.map(put, g.node_alias),
    )
    if rgcn:
        g = g.replace(fanu_pack=put(g.fanu_pack),
                      fanu_over_rows=put(g.fanu_over_rows),
                      fanu_ptr=put(g.fanu_ptr), fanu_dst=put(g.fanu_dst),
                      fanu_prob=put(g.fanu_prob),
                      fanu_alias=put(g.fanu_alias),
                      group_w_sum=put(g.group_w_sum), **common)
    else:
        g = g.replace(fan_pack=put(g.fan_pack),
                      fan_over_rows=put(g.fan_over_rows), **common)
    _stage("graph_on_device")

    metapath = [tuple(range(n_etypes))] * 2
    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv={"rgcn": "relation"}.get(mode, mode),
                     flow=flows.SageDataFlow(fanout, metapath,
                                             typed=rgcn),
                     dims=(128, 128), feature=feat,
                     relation_from_etype=rgcn,
                     conv_kwargs={"num_relations": n_etypes} if rgcn
                     else None,
                     dtype=act_dtype if on_tpu else None,
                     # unique-before-gather sweep knob (measured negative
                     # at these shapes; see ops/util_ops.unique_gather)
                     dedup_features=os.environ.get(
                         "EULER_BENCH_DEDUP") == "1")
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=n_classes)
    tx = optax.adam(1e-3)

    roots0 = jnp.arange(batch, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, roots0)  # jit: eager init is
    # per-op dispatch, pathological on tunneled devices
    opt_state = tx.init(params)
    _stage("params_init_done")

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
        # program — a separate dispatch costs ~0.2s on the tunnel.
        # (rgcn samples through sample_pack: nothing to refresh)
        kr, key = jax.random.split(key)
        if g.fan_pack is not None:
            g = g.replace(fan_pack=sampling.refresh_fan_rows(
                g.group_ptr, g.adj_dst, g.adj_prob, g.adj_alias,
                g.fan_pack, kr, g.fan_over_rows))

        def body(carry, i):
            params, opt_state = carry
            p2, o2, loss = step(g, params, opt_state,
                                jax.random.fold_in(key, i))
            return (p2, o2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        fp = g.fan_pack if g.fan_pack is not None \
            else jnp.zeros((), jnp.int32)
        return fp, params, opt_state, losses[-1]

    # edges touched per step: hop1 B*f1 + hop2 B*f1*f2, plus self loops
    edges_per_step = batch * fanout[0] + batch * fanout[0] * fanout[1] \
        + batch + batch * fanout[0]

    # AOT compile so the (slow, variable on the remote-compile service)
    # build phase is fully separated from the first timed execution — the
    # first JSON result lands within one loop of compile finishing
    _stage("compile")
    compiled = run_loop.lower(g, params, opt_state,
                              jax.random.PRNGKey(2)).compile()
    _stage("compile_done")

    def upd(g, fp):
        return g if rgcn else g.replace(fan_pack=fp)

    # warmup exec. NB: sync via float(loss) (device->host copy), not
    # block_until_ready — on tunneled device platforms the latter can
    # return before execution finishes, inflating throughput ~100x.
    t0 = time.perf_counter()
    fp, params, opt_state, loss = compiled(g, params, opt_state,
                                           jax.random.PRNGKey(2))
    g = upd(g, fp)
    float(loss)
    # even the warmup loop yields a (conservative: includes one dispatch
    # round-trip) salvageable measurement
    record(edges_per_step * steps_per_loop, time.perf_counter() - t0,
           "warmup")
    # timed single loop
    t0 = time.perf_counter()
    fp, params, opt_state, loss = compiled(g, params, opt_state,
                                           jax.random.PRNGKey(100))
    g = upd(g, fp)
    float(loss)
    record(edges_per_step * steps_per_loop, time.perf_counter() - t0,
           "single_loop")

    # pipelined loops: enqueue all dispatches, sync once — amortizes the
    # tunnel round-trip so the number reflects device throughput
    outer = 4 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(outer):
        fp, params, opt_state, loss = compiled(g, params, opt_state,
                                               jax.random.PRNGKey(3 + i))
        g = upd(g, fp)
    float(loss)
    record(edges_per_step * steps_per_loop * outer,
           time.perf_counter() - t0, "pipelined")


def _measure_loops(jax, record, compiled, args, work_per_loop, on_tpu):
    """Shared warmup / single / pipelined measurement protocol for modes
    whose compiled loop is pure (carries no graph state): sync via
    float() — block_until_ready is unreliable on tunneled devices."""
    import time as _t
    t0 = _t.perf_counter()
    *carry, loss = compiled(*args, jax.random.PRNGKey(2))
    float(loss)
    record(work_per_loop, _t.perf_counter() - t0, "warmup")
    t0 = _t.perf_counter()
    *carry, loss = compiled(*args, jax.random.PRNGKey(100))
    float(loss)
    record(work_per_loop, _t.perf_counter() - t0, "single_loop")
    outer = 4 if on_tpu else 2
    t0 = _t.perf_counter()
    for i in range(outer):
        *carry, loss = compiled(*args, jax.random.PRNGKey(3 + i))
    float(loss)
    record(work_per_loop * outer, _t.perf_counter() - t0, "pipelined")


def _gcn_child(jax, jnp, optax, dev, on_tpu):
    """Full-graph GCN SpMM path: every edge aggregated every layer
    (reference: examples/gcn via whole_dataflow.py:26-63 sparse_get_adj;
    the TF path multiplies the full sparse adjacency per layer)."""
    import dataclasses

    from euler_tpu.dataflow import flows
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.graph.meta import FeatureSpec
    from euler_tpu.models import encoders, gnn
    from euler_tpu.ops import sampling  # noqa: F401 (parity of imports)

    n_nodes = int(os.environ.get("EULER_BENCH_NODES",
                                 100_000 if on_tpu else 2_000))
    avg_deg = 25
    feat_dim = 128
    n_classes = 16
    n_layers = 2
    act_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def record(edges, seconds, phase):
        v = edges / seconds
        out = {"metric": "fullgraph_spmm_edges_per_sec_per_chip",
               "model": "gcn",
               "value": round(v, 1), "unit": "edges/s",
               "vs_baseline": round(v / 1e8, 4) if on_tpu else None,
               "platform": dev.platform, "phase": phase,
               "config": f"full_n{n_nodes}_e{n_nodes*avg_deg}_l{n_layers}"}
        print(json.dumps(out), flush=True)

    # ELL fast path (default): build-time regular layout + transpose
    # table — aggregation by reshape+reduce, backward by transpose
    # gather, zero scatters (micro_spmm.py). EULER_BENCH_GCN_ELL=0
    # reverts to the edge-list block + segment-scatter path.
    use_ell = os.environ.get("EULER_BENCH_GCN_ELL", "1") == "1"
    _stage("build_graph")
    graph = random_graph(n_nodes, avg_deg, seed=0, device_put=False,
                         packs=("ell",) if use_ell else ())
    g = graph.tensors
    meta = dataclasses.replace(
        g.meta,
        node_features=(FeatureSpec("feature", "dense", feat_dim),
                       FeatureSpec("label", "dense", n_classes)))

    @jax.jit
    def make_features():
        kf, kl = jax.random.split(jax.random.PRNGKey(42))
        feat = jax.random.normal(kf, (n_nodes, feat_dim), act_dtype)
        cls = jax.random.randint(kl, (n_nodes,), 0, n_classes)
        return feat, jax.nn.one_hot(cls, n_classes, dtype=jnp.float32)

    feat_dev, lab_dev = make_features()
    put = jax.device_put
    extra = {}
    if use_ell and g.ell_nbr is not None:
        extra = dict(ell_nbr=put(g.ell_nbr), ell_w=put(g.ell_w),
                     ell_eid=put(g.ell_eid), ell_ty=put(g.ell_ty),
                     ell_tpos=put(g.ell_tpos),
                     ell_in_deg=put(g.ell_in_deg))
    g = g.replace(meta=meta,
                  dense_nf={"feature": feat_dev, "label": lab_dev},
                  adj_src=put(g.adj_src), adj_dst=put(g.adj_dst),
                  adj_type=put(g.adj_type), adj_eid=put(g.adj_eid),
                  adj_w=put(g.adj_w), group_ptr=put(g.group_ptr),
                  **extra)
    _stage("graph_on_device")

    flow = flows.WholeDataFlow(
        n_layers, [(0,)], layout="auto" if use_ell else "edge_list")
    feat = encoders.ShallowEncoder(dense_names=("feature",))
    net = gnn.GNNNet(conv="gcn", flow=flow,
                     dims=(128, 128), feature=feat,
                     dtype=act_dtype if on_tpu else None)
    model = gnn.SuperviseModel(embedder=net, label_name="label",
                               label_dim=n_classes)
    tx = optax.adam(1e-3)
    roots = jnp.arange(n_nodes, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, roots)
    opt_state = tx.init(params)
    _stage("params_init_done")

    steps_per_loop = 20 if on_tpu else 2

    def step(g, params, opt_state, key):
        def loss_fn(p):
            return model.apply(p, g, roots, rngs={"sample": key})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def run_loop(g, params, opt_state, key):
        def body(carry, i):
            p, o = carry
            p2, o2, loss = step(g, p, o, jax.random.fold_in(key, i))
            return (p2, o2), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        return params, opt_state, losses[-1]

    # every layer touches all E edges + N self loops
    edges_per_step = n_layers * (n_nodes * avg_deg + n_nodes)
    _stage("compile")
    compiled = run_loop.lower(g, params, opt_state,
                              jax.random.PRNGKey(2)).compile()
    _stage("compile_done")
    _measure_loops(jax, record, compiled, (g, params, opt_state),
                   edges_per_step * steps_per_loop, on_tpu)


def _transe_child(jax, jnp, optax, dev, on_tpu):
    """Embedding-bound TransX step: global weighted edge sampling +
    margin ranking over corrupted heads/tails (reference:
    examples/TransX transX.py:24-130, tf_euler sample_edge)."""
    from euler_tpu.datasets.random_graph import random_graph
    from euler_tpu.models import kg
    from euler_tpu.ops import sampling

    n_nodes = int(os.environ.get("EULER_BENCH_NODES",
                                 100_000 if on_tpu else 2_000))
    avg_deg = 25
    n_rel = 16
    dim = 100            # FB15k dims of examples/TransX
    num_negs = 5
    batch = int(os.environ.get("EULER_BENCH_BATCH",
                               4096 if on_tpu else 256))

    def record(triples, seconds, phase):
        v = triples / seconds
        out = {"metric": "transx_triples_per_sec_per_chip",
               "model": "transe",
               "value": round(v, 1), "unit": "triples/s",
               # BASELINE.json publishes no reference TransX throughput;
               # no nominal target either — absolute number only
               "vs_baseline": None,
               "platform": dev.platform, "phase": phase,
               "config": f"b{batch}_negs{num_negs}_n{n_nodes}_r{n_rel}"}
        print(json.dumps(out), flush=True)

    _stage("build_graph")
    graph = random_graph(n_nodes, avg_deg, seed=0, device_put=False,
                         num_edge_types=n_rel, packs=())
    g = graph.tensors
    put = jax.device_put
    g = g.replace(adj_src=put(g.adj_src), adj_dst=put(g.adj_dst),
                  adj_type=put(g.adj_type), adj_eid=put(g.adj_eid),
                  node_alias=jax.tree.map(put, g.node_alias),
                  edge_alias=jax.tree.map(put, g.edge_alias))
    _stage("graph_on_device")

    model = kg.TransE(n_entities=n_nodes, n_relations=n_rel,
                      ent_dim=dim, rel_dim=dim, num_negs=num_negs)
    tx = optax.adam(1e-3)
    batch0 = jnp.zeros((batch, 3), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, g, batch0)
    opt_state = tx.init(params)
    _stage("params_init_done")

    steps_per_loop = 50 if on_tpu else 5

    def step(g, params, opt_state, key):
        kb, ks = jax.random.split(key)
        src, dst, ty, _eid = sampling.sample_edge(g, kb, batch, -1)
        triples = jnp.stack([src, dst, ty], axis=1)

        def loss_fn(p):
            return model.apply(p, g, triples,
                               rngs={"sample": ks})["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def run_loop(g, params, opt_state, key):
        def body(carry, i):
            p, o = carry
            p2, o2, loss = step(g, p, o, jax.random.fold_in(key, i))
            return (p2, o2), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(steps_per_loop, dtype=jnp.int32))
        return params, opt_state, losses[-1]

    _stage("compile")
    compiled = run_loop.lower(g, params, opt_state,
                              jax.random.PRNGKey(2)).compile()
    _stage("compile_done")
    _measure_loops(jax, record, compiled, (g, params, opt_state),
                   batch * steps_per_loop, on_tpu)


def _fake_child():
    """Test hook: EULER_BENCH_FAKE_CHILD holds ';'-separated directives —
    lines to print ('#stage x' or a JSON result), 'sleep:N', or 'hang'.
    EULER_BENCH_FAKE_ONCE makes the SECOND child run real (retry tests).
    Lets tests drive the watchdog parent deterministically without jax."""
    script = os.environ["EULER_BENCH_FAKE_CHILD"]
    marker = os.environ.get("EULER_BENCH_FAKE_MARKER")
    if marker:
        if os.path.exists(marker):   # second invocation: behave per-ONCE
            script = os.environ.get("EULER_BENCH_FAKE_ONCE", script)
        else:
            open(marker, "w").close()
    for d in script.split(";"):
        d = d.strip()
        if not d:
            continue
        if d == "hang":
            time.sleep(3600)
        elif d.startswith("sleep:"):
            time.sleep(float(d.split(":")[1]))
        else:
            print(d, flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        if os.environ.get("EULER_BENCH_FAKE_CHILD"):
            _fake_child()
        else:
            child()
    else:
        parent()
