"""papers100M-shaped ingest drill at configurable scale.

End-to-end rehearsal of the BASELINE north-star ingest path on one
host: synthesize a ``src dst`` edge-list text file, stream-convert it
with the native parser (bounded memory), load the partitions, build the
8-shard mesh store, and run sharded DeepWalk + payload-sampled SAGE
train steps — recording wall time and PEAK RSS per stage to a JSON
record (committed as DRILL_<E>.json; VERDICT r4 #3 asks for tool
output in-repo, not a README claim).

Reference shape: ogbn-papers100M is 111M nodes / 1.6B edges fed through
generate_euler_data.py + graph_builder.cc:57-157; the default here
(200M edges / 10M nodes) is the 1/8-by-edges drill.

Usage:
  python tools/ingest_drill.py [--edges 200000000] [--nodes 10000000]
      [--dir /tmp/euler_drill] [--shards 8] [--steps 3] [--keep]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _mem_gb():
    out = {}
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(("VmRSS", "VmHWM")):
                k, v = line.split(":")
                out[k] = round(int(v.split()[0]) / 1e6, 2)   # GB
    return out


def gen_edge_file(path, n_edges, n_nodes, seed=0, chunk=5_000_000):
    """Fixed-width decimal edge lines via pure numpy digit math —
    np.savetxt tops out ~1M lines/s, this writes ~20M+."""
    rng = np.random.default_rng(seed)
    width = len(str(n_nodes - 1))
    pows = (10 ** np.arange(width - 1, -1, -1,
                            dtype=np.int64))[None, :]
    with open(path, "wb", buffering=1 << 22) as f:
        done = 0
        while done < n_edges:
            c = min(chunk, n_edges - done)
            src = rng.integers(0, n_nodes, c)
            dst = rng.integers(0, n_nodes, c)
            row = np.empty((c, 2 * width + 2), np.uint8)
            row[:, :width] = (src[:, None] // pows) % 10 + 48
            row[:, width] = 32                       # space
            row[:, width + 1:2 * width + 1] = \
                (dst[:, None] // pows) % 10 + 48
            row[:, -1] = 10                          # newline
            f.write(row.tobytes())
            done += c
    return os.path.getsize(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edges", type=int, default=200_000_000)
    p.add_argument("--nodes", type=int, default=10_000_000)
    p.add_argument("--dir", default="/tmp/euler_drill")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch-per-dev", type=int, default=256)
    p.add_argument("--out", default=None, help="JSON record path")
    p.add_argument("--keep", action="store_true",
                   help="keep the generated file/partitions")
    args = p.parse_args(argv)

    # virtual CPU mesh: must land before the first jax backend init
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.shards}")

    os.makedirs(args.dir, exist_ok=True)
    rec = {"edges": args.edges, "nodes": args.nodes,
           "partitions": args.partitions, "shards": args.shards,
           "host_cpus": os.cpu_count(), "stages": {}}

    def stage(name, t0):
        rec["stages"][name] = {"wall_s": round(time.time() - t0, 1),
                               **_mem_gb()}
        print(f"[drill] {name}: {rec['stages'][name]}", flush=True)

    edge_file = os.path.join(args.dir, "edges.txt")
    t0 = time.time()
    size = gen_edge_file(edge_file, args.edges, args.nodes)
    rec["file_GB"] = round(size / 1e9, 2)
    stage("generate", t0)

    from euler_tpu.graph import stream_convert
    out_dir = os.path.join(args.dir, "parts")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    stream_convert.convert_edge_list(edge_file, out_dir,
                                     n_partitions=args.partitions)
    rec["lines_per_s"] = round(args.edges / rec.setdefault(
        "_", time.time() - t0) / 1e6, 2)
    rec.pop("_")
    stage("stream_convert", t0)
    if not args.keep:
        os.remove(edge_file)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from euler_tpu.graph.store import load_graph
    t0 = time.time()
    graph = load_graph(out_dir, device_put=False, packs=("group",))
    stage("load_store", t0)

    # synthesize a [N, 32] feature table before sharding (the graph
    # itself is featureless; build_sharded stacks features per shard)
    import dataclasses
    from euler_tpu.graph.meta import FeatureSpec
    rngf = np.random.default_rng(1)
    graph.tensors = dataclasses.replace(
        graph.tensors,
        meta=dataclasses.replace(
            graph.meta, node_features=(FeatureSpec("feat", "dense", 32),)),
        dense_nf={"feat": rngf.normal(
            0, 1, (graph.meta.n_nodes, 32)).astype(np.float32)})
    graph.meta = graph.tensors.meta

    from euler_tpu.parallel import mesh as mesh_lib, sharded, train
    t0 = time.time()
    mesh = mesh_lib.make_mesh(data=1, graph=args.shards)
    sg = sharded.build_sharded(graph, args.shards)
    sg = train.place_sharded_graph(sg, mesh)
    stage("shard_and_place", t0)

    import optax
    from euler_tpu.models import walk_models
    from euler_tpu.dataflow import flows
    from euler_tpu.models import encoders, gnn

    bpd = args.batch_per_dev
    t0 = time.time()
    dw = walk_models.DeepWalk(n_nodes=graph.meta.n_nodes, dim=32,
                              edge_types=(0,), walk_len=2, num_negs=2,
                              shard_embeddings=True)
    tx = optax.adam(1e-3)
    params = train.init_sharded_params(dw, sg, mesh, bpd)
    pspecs = train.param_specs(params)
    step = train.make_sharded_train_step(dw, sg, tx, mesh, bpd,
                                         pspecs=pspecs)
    opt = tx.init(params)
    with mesh:
        params, opt, loss = step(params, opt, sg, jax.random.PRNGKey(0))
    float(loss)
    stage("deepwalk_compile+first_step", t0)
    t0 = time.time()
    with mesh:
        for i in range(args.steps):
            params, opt, loss = step(params, opt, sg,
                                     jax.random.PRNGKey(1 + i))
        lval = float(loss)
    rec["deepwalk_step_s"] = round((time.time() - t0) / args.steps, 3)
    rec["deepwalk_loss"] = round(lval, 4)
    stage("deepwalk_steps", t0)
    del params, opt, step

    # payload-sampled SAGE over the synthesized features (injected
    # before sharding; rides the owner-compute sharded fetch path)
    import jax.numpy as jnp
    t0 = time.time()
    feat = encoders.ShallowEncoder(dense_names=("feat",))
    net = gnn.GNNNet(conv="sage",
                     flow=flows.SageDataFlow([5, 5], [(0,), (0,)],
                                             payload=True),
                     dims=(32, 32), feature=feat)

    from flax import linen as nn

    class Unsup(nn.Module):
        embedder: nn.Module

        @nn.compact
        def __call__(self, g, roots):
            emb = self.embedder(g, roots)
            loss = jnp.mean(emb * emb)
            return dict(loss=loss, embedding=emb)

    model = Unsup(embedder=net)
    tx2 = optax.adam(1e-3)
    params = train.init_sharded_params(model, sg, mesh, bpd)
    step2 = train.make_sharded_train_step(model, sg, tx2, mesh, bpd)
    opt2 = tx2.init(params)
    with mesh:
        params, opt2, loss = step2(params, opt2, sg,
                                   jax.random.PRNGKey(3))
    float(loss)
    stage("sage_compile+first_step", t0)
    t0 = time.time()
    with mesh:
        for i in range(args.steps):
            params, opt2, loss = step2(params, opt2, sg,
                                       jax.random.PRNGKey(4 + i))
        lval = float(loss)
    rec["sage_step_s"] = round((time.time() - t0) / args.steps, 3)
    stage("sage_steps", t0)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"DRILL_{args.edges // 1_000_000}M.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[drill] wrote {out}")
    if not args.keep:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
