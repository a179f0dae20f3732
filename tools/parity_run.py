"""Accuracy-parity harness: reproduce BASELINE.md on real data.

For every (model, dataset) row of BASELINE.md whose raw files are
present under the data root, train the example's config and report the
achieved metric against the reference's published number
(reference: examples/*/README.md Result tables). Rows without raw data
are SKIPPED cleanly — this environment has no egress, so raw files must
be dropped in manually:

    <data_root>/cora/cora.content + cora.cites
    <data_root>/pubmed/Pubmed-Diabetes.{NODE.paper,DIRECTED.cites}.tab
    <data_root>/citeseer/citeseer.content + citeseer.cites
    <data_root>/ppi/ppi-{G.json,feats.npy,id_map.json,class_map.json}
    <data_root>/reddit/reddit-{G.json,feats.npy,id_map.json,class_map.json}
    <data_root>/mutag/MUTAG_{A,graph_indicator,graph_labels,node_labels}.txt
    <data_root>/fb15k/{train,valid,test}.txt      (tab-separated triples)

Usage:
    python tools/parity_run.py [--data_dir DIR] [--only SUBSTR]
                               [--steps N] [--json OUT.json]

Prints one table row per run:  model dataset metric got reference delta
and a final JSON summary line.
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

# (run name, example script, extra argv, dataset, reference value,
#  metric key) — reference values from BASELINE.md (examples/*/README.md)
TABLE = []


def _node_rows(model, script, refs, extra=()):
    for ds, ref in refs.items():
        TABLE.append((f"{model}_{ds}", script, list(extra), ds, ref, "f1"))


_node_rows("gcn", "gcn/run_gcn.py",
           {"cora": 0.822, "pubmed": 0.871, "citeseer": 0.752})
_node_rows("graphsage", "graphsage/run_graphsage.py",
           {"cora": 0.774, "pubmed": 0.884, "citeseer": 0.731})
_node_rows("gat", "gat/run_gat.py",
           {"cora": 0.823, "pubmed": 0.876, "citeseer": 0.755})
_node_rows("agnn", "agnn/run_agnn.py",
           {"cora": 0.813, "pubmed": 0.894, "citeseer": 0.719})
_node_rows("appnp", "appnp/run_appnp.py",
           {"cora": 0.813, "pubmed": 0.870, "citeseer": 0.723})
_node_rows("arma", "arma/run_arma.py",
           {"cora": 0.822, "pubmed": 0.880, "citeseer": 0.755})
_node_rows("adaptivegcn", "adaptivegcn/run_adaptivegcn.py",
           {"cora": 0.821, "pubmed": 0.859, "citeseer": 0.751})
_node_rows("fastgcn", "fastgcn/run_fastgcn.py",
           {"cora": 0.803, "pubmed": 0.860, "citeseer": 0.740})
_node_rows("sgcn", "sgcn/run_sgcn.py",
           {"cora": 0.825, "pubmed": 0.866, "citeseer": 0.716})
_node_rows("tagcn", "tagcn/run_tagcn.py",
           {"cora": 0.817, "pubmed": 0.867, "citeseer": 0.727})
_node_rows("dna", "dna/run_dna.py",
           {"cora": 0.811, "pubmed": 0.867, "citeseer": 0.710})
_node_rows("geniepath", "geniepath/run_geniepath.py",
           {"cora": 0.742, "pubmed": 0.872, "citeseer": 0.735})
_node_rows("lgcn", "lgcn/run_lgcn.py",
           {"cora": 0.641, "pubmed": 0.848, "citeseer": 0.675})
for ds, ref in {"cora": 0.905, "pubmed": 0.983, "citeseer": 0.976}.items():
    TABLE.append((f"deepwalk_{ds}", "deepwalk/run_deepwalk.py", [], ds,
                  ref, "mrr"))
for ds, ref in {"cora": 0.900, "pubmed": 0.987, "citeseer": 0.956}.items():
    TABLE.append((f"line_{ds}", "line/run_line.py", [], ds, ref, "mrr"))
for model, script, ref in (("gin", "gin/run_gin.py", 0.923),
                           ("gated_graph", "gated_graph/run_gated_graph.py",
                            0.920),
                           ("set2set", "set2set/run_set2set.py", 0.901),
                           ("graphgcn", "graphgcn/run_graphgcn.py", 0.891)):
    TABLE.append((f"{model}_mutag", script, [], "mutag", ref, "accuracy"))
for model in ("transe", "transh", "transr", "transd"):
    mr = {"transe": 197, "transh": 179, "transr": 191, "transd": 163}
    TABLE.append((f"{model}_fb15k", "TransX/run_transX.py",
                  ["--model", model, "--embedding_dim", "50",
                   "--margin", "0.5"], "fb15k", mr[model], "mr"))


def _dataset_has_raw(name, data_dir):
    from euler_tpu.datasets import get_dataset
    try:
        ds = get_dataset(name, data_dir)
    except KeyError:
        return False
    return bool(getattr(ds, "has_raw", lambda: False)())


def _run_example(script, argv):
    path = os.path.join(ROOT, "examples", script)
    spec = importlib.util.spec_from_file_location(
        "parity_" + os.path.basename(script).replace(".py", ""), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(argv=argv)


def run_parity(data_dir=None, only=None, steps=0, model_dir=None,
               log=print, allow_synthetic=False):
    results = []
    for name, script, extra, ds_name, ref, metric in TABLE:
        if only and only not in name:
            continue
        synthetic = not _dataset_has_raw(ds_name, data_dir)
        if synthetic and not allow_synthetic:
            results.append(dict(run=name, dataset=ds_name, status="skipped",
                                reason="raw data absent"))
            log(f"{name:24s} {ds_name:9s} SKIP (no raw data)")
            continue
        argv = list(extra) + [
            "--dataset", ds_name, "--run_mode", "train_and_evaluate",
            "--log_steps", "0"]
        if data_dir:
            argv += ["--data_dir", data_dir]
        if steps:
            argv += ["--total_steps", str(steps)]
        if model_dir:
            argv += ["--model_dir",
                     os.path.join(model_dir, name)]
        try:
            out = _run_example(script, argv)
            got = out.get(metric)
            # a synthetic stand-in proves the pipeline, not the number:
            # never report a delta against the reference for it
            delta = None if got is None or ref is None or synthetic \
                else float(got) - ref
            status = "ran_synthetic" if synthetic else "ran"
            tag = " (SYNTHETIC stand-in; no reference comparison)" \
                if synthetic else f"  ref={ref}  delta=" + str(
                    None if delta is None else round(delta, 4))
            log(f"{name:24s} {ds_name:9s} "
                f"{metric}={got if got is None else round(float(got), 4)}"
                f"{tag}")
            results.append(dict(run=name, dataset=ds_name, status=status,
                                metric=metric, value=got,
                                reference=None if synthetic else ref,
                                delta=delta))
        except Exception as e:   # a broken run must not kill the sweep
            log(f"{name:24s} {ds_name:9s} ERROR {e}")
            results.append(dict(run=name, dataset=ds_name, status="error",
                                reason=str(e)))
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", default=None,
                   help="data root holding <dataset>/<raw files>")
    p.add_argument("--only", default=None,
                   help="substring filter on run names (e.g. gcn_cora)")
    p.add_argument("--steps", type=int, default=0,
                   help="override total_steps (0 = example default)")
    p.add_argument("--model_dir", default="/tmp/euler_tpu_parity")
    p.add_argument("--json", dest="json_out", default=None)
    p.add_argument("--allow-synthetic", action="store_true",
                   help="run rows without raw data on their synthetic "
                        "stand-ins (pipeline smoke; results are NOT "
                        "compared to the reference)")
    p.add_argument("--platform", default=None,
                   help="force the jax platform (e.g. 'cpu' for smoke "
                        "sweeps; this image pre-registers the TPU "
                        "plugin, so the env var alone does not stick)")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    results = run_parity(args.data_dir, args.only, args.steps,
                         args.model_dir,
                         allow_synthetic=args.allow_synthetic)
    ran = [r for r in results if r["status"].startswith("ran")]
    summary = dict(ran=len(ran),
                   skipped=sum(r["status"] == "skipped" for r in results),
                   errors=sum(r["status"] == "error" for r in results),
                   results=results)
    print(json.dumps(summary, default=float))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, default=float)
    return summary


if __name__ == "__main__":
    main()
