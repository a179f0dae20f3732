"""Bench suite: one chip number per BASELINE.json config family.

Runs bench.py (the watchdog parent — always yields exactly one JSON
line, surviving tunnel stalls) once per model mode, SEQUENTIALLY (the
tunneled TPU admits one client at a time), and writes the collected
results to BENCH_SUITE.json at the repo root plus a markdown table on
stdout.

Families (BASELINE.json "configs"):
  gcn    — full-graph SpMM path            (GCN on Cora family)
  sage   — sampled fanout-[25,10] training (GraphSAGE on Reddit family)
  gat    — attention SDDMM + segment softmax (GAT family)
  gin    — sum-pool aggregation            (GIN family)
  rgcn   — relation-batched einsum, payload sampling (RGCN family)
  transe — embedding-bound TransX margin step (TransX family; no
           published or nominal target -> vs_baseline null)

Usage: python tools/bench_suite.py [--modes sage,gat,...] [--deadline S]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODES = ["sage", "gat", "gin", "rgcn", "gcn", "transe"]


def run_mode(mode, deadline):
    env = dict(os.environ)
    env["EULER_BENCH_MODEL"] = mode
    env.setdefault("EULER_BENCH_DEADLINE_S", str(deadline))
    env.setdefault("EULER_BENCH_FALLBACK_S", str(max(60, deadline - 60)))
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=deadline + 120)
    last = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except ValueError:
                pass
    if last is None:
        last = {"model": mode, "error": "no_result",
                "stderr_tail": p.stderr[-500:]}
    last["wall_s"] = round(time.time() - t0, 1)
    return last


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--deadline", type=float, default=600.0,
                    help="per-mode deadline seconds")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "BENCH_SUITE.json"))
    args = ap.parse_args()

    results = {}
    for mode in args.modes.split(","):
        mode = mode.strip()
        if not mode:
            continue
        print(f"# running {mode} ...", flush=True)
        results[mode] = run_mode(mode, args.deadline)
        print(json.dumps(results[mode]), flush=True)

    with open(args.out, "w") as f:
        json.dump({"ts": time.time(), "results": results}, f, indent=1)
    print(f"\nwrote {args.out}\n")

    print("| family | metric | value | unit | vs 1e8 target | config |")
    print("|---|---|---|---|---|---|")
    for mode, r in results.items():
        vb = r.get("vs_baseline")
        print(f"| {mode} | {r.get('metric', '?')} "
              f"| {r.get('value', 0):,.0f} | {r.get('unit', '?')} "
              f"| {vb if vb is not None else '—'} "
              f"| {r.get('config', '?')} |")


if __name__ == "__main__":
    main()
