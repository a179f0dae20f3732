"""Watchdog-parent logic of bench.py, driven by a fake child (no jax):
the driver-critical retry / fallback / salvage behaviors (VERDICT r3
ask #1 — BENCH_rN must parse even on a degraded device)."""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=timeout)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout     # exactly ONE JSON line
    return json.loads(lines[0])


def _res(v, phase="pipelined", vsb=1.0):
    return json.dumps({"metric": "sampled_aggregate_edges_per_sec_per_chip",
                       "value": v, "unit": "edges/s", "vs_baseline": vsb,
                       "platform": "tpu", "phase": phase})


def test_happy_path_keeps_last_result(tmp_path):
    script = "#stage compile_done;" + _res(1.0, "warmup") + ";" + \
        _res(2.0, "single_loop") + ";" + _res(3.0, "pipelined")
    r = _run({"EULER_BENCH_FAKE_CHILD": script,
              "EULER_BENCH_DEADLINE_S": "30",
              "EULER_BENCH_FALLBACK_S": "20"})
    assert r["value"] == 3.0 and "error" not in r


def test_partial_result_salvaged_on_hang(tmp_path):
    # child emits one provisional result then wedges: the parent must
    # SIGKILL it at the deadline and emit the provisional measurement
    script = _res(7.0, "warmup") + ";hang"
    r = _run({"EULER_BENCH_FAKE_CHILD": script,
              "EULER_BENCH_DEADLINE_S": "12",
              "EULER_BENCH_FALLBACK_S": "8"}, timeout=60)
    assert r["value"] == 7.0 and "error" not in r


def test_retry_recovers_from_stalled_first_attempt(tmp_path):
    # first attempt hangs at the probe; the fresh-process retry succeeds
    marker = str(tmp_path / "m")
    r = _run({"EULER_BENCH_FAKE_CHILD": "#stage devices platform=tpu;hang",
              "EULER_BENCH_FAKE_MARKER": marker,
              "EULER_BENCH_FAKE_ONCE": _res(5.0),
              "EULER_BENCH_DEADLINE_S": "30",
              "EULER_BENCH_FALLBACK_S": "16",
              "EULER_BENCH_RETRY_MIN_S": "3"}, timeout=90)
    assert r["value"] == 5.0 and "error" not in r


def test_dead_device_yields_structured_failure(tmp_path):
    # every attempt (incl. the CPU fallback child, also faked) hangs:
    # the parent must still print a parseable structured failure with
    # the stall stage
    r = _run({"EULER_BENCH_FAKE_CHILD": "#stage probe_matmul_done;hang",
              "EULER_BENCH_DEADLINE_S": "14",
              "EULER_BENCH_FALLBACK_S": "8"}, timeout=90)
    assert r["error"] == "device_unresponsive"
    assert "probe_matmul_done" in r["stage"]
    assert r["value"] == 0.0
