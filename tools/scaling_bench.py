"""Scaling-efficiency harness: edges/s across mesh shapes.

BASELINE.json's north-star asks for edges/s scaling efficiency at
1 chip / 1 host / >=2 hosts. This tool measures the sharded GraphSAGE
train step (the same op mix bench.py measures single-chip) over a
sweep of (data, graph) mesh shapes on whatever devices the process
sees — one real TPU host, a multi-host `jax.distributed` job, or the
8-device virtual CPU mesh (functional only; CPU numbers say nothing
about chips).

Per shape it reports edges/s and efficiency vs the single-device run
scaled by device count:

    python tools/scaling_bench.py [--nodes 200000] [--batch-per-dev 128]
                                  [--steps 20] [--shapes 1x1,1x2,1x4,1x8]
                                  [--platform cpu]

Prints one JSON line per shape and a summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=50_000)
    p.add_argument("--avg-deg", type=int, default=25)
    p.add_argument("--batch-per-dev", type=int, default=128)
    p.add_argument("--fanouts", type=int, nargs=2, default=[25, 10])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--shapes", default=None,
                   help="comma list of DxG mesh shapes; default sweeps "
                        "graph axis 1..n_devices")
    p.add_argument("--platform", default=None)
    p.add_argument("--chip-step-ms", type=float, default=None,
                   help="measured single-chip step time for this "
                        "per-device workload (bench.py); enables the "
                        "ICI-based predicted scaling efficiency")
    p.add_argument("--ici-gbs", type=float, default=90.0,
                   help="assumed ICI bandwidth per chip per direction "
                        "(GB/s); ~90 for v5e-class parts")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from euler_tpu.dataflow import flows
    from euler_tpu.datasets.synthetic import SBMDataset
    from euler_tpu.estimator.estimator import RunConfig
    from euler_tpu.estimator.spmd import SpmdNodeEstimator
    from euler_tpu.models import encoders, gnn
    import tempfile

    n_dev = jax.device_count()
    if args.shapes:
        shapes = [tuple(int(x) for x in s.split("x"))
                  for s in args.shapes.split(",")]
    else:
        shapes = []
        g = 1
        while g <= n_dev:
            shapes.append((1, g))
            g *= 2

    d = os.path.join(tempfile.gettempdir(), "euler_tpu_scaling")
    ds = SBMDataset(d, n_nodes=args.nodes, n_classes=8,
                    feat_dim=args.feat_dim, seed=0)
    graph = ds.load_graph()
    et = graph.meta.edge_types.index("link")
    f1, f2 = args.fanouts
    feat = encoders.ShallowEncoder(dense_names=(ds.feature_idx,))

    def model():
        net = gnn.GNNNet(conv="sage",
                         flow=flows.SageDataFlow([f1, f2],
                                                 [(et,), (et,)]),
                         dims=(64, 64), feature=feat)
        return gnn.SuperviseModel(embedder=net, label_name=ds.label_idx,
                                  label_dim=ds.label_dim)

    base_rate = None
    results = []
    for dsz, gsz in shapes:
        ndev = dsz * gsz
        if ndev > n_dev:
            continue
        from euler_tpu.parallel import mesh as mesh_lib
        import numpy as np
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:ndev]).reshape(dsz, gsz),
            ("data", "graph"))
        cfg = RunConfig(model_dir="/tmp/euler_tpu_scaling_ckpt",
                        batch_size=args.batch_per_dev * ndev,
                        total_steps=args.steps, log_steps=0,
                        steps_per_loop=max(1, args.steps // 2),
                        save_steps=0, reservoir_refresh=0)
        est = SpmdNodeEstimator(model(), graph, cfg,
                                train_node_type=ds.train_node_type,
                                mesh=mesh)
        # trace-time ICI accounting: collectives inside the scanned step
        # body trace ONCE, so the recorded bytes are per-STEP per-device
        # (plus any one-time init-program collectives — near zero here)
        from euler_tpu.parallel import comms
        with comms.account() as acc:
            est.train(total_steps=2)             # compile + warm
        t0 = time.perf_counter()
        est.train(total_steps=args.steps)
        dt = time.perf_counter() - t0
        bpd = args.batch_per_dev
        edges = (bpd * ndev) * (f1 + f1 * f2 + 1 + f1) * args.steps
        rate = edges / dt
        if base_rate is None:
            base_rate = rate / ndev
        eff = rate / (base_rate * ndev)
        tot = acc.totals()
        rec = {"mesh": f"{dsz}x{gsz}", "devices": ndev,
               "edges_per_sec": round(rate, 1),
               "scaling_efficiency": round(eff, 3),
               "comm_MB_per_step_per_dev": {
                   k: round(v / 1e6, 3) for k, v in tot.items()},
               "platform": jax.devices()[0].platform}
        if args.chip_step_ms and ndev > 1:
            rec["predicted_chip_efficiency"] = round(
                acc.predicted_efficiency(args.chip_step_ms / 1e3,
                                         args.ici_gbs * 1e9), 3)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    print(json.dumps({"summary": results}))
    return results


if __name__ == "__main__":
    main()
