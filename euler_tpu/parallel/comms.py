"""Trace-time communication accounting for the sharded plane.

Every sharded verb moves data through XLA collectives whose shapes are
STATIC under jit, so the ICI bytes each device moves per step are
computable at trace time with zero runtime cost (VERDICT r4 #4). The
wrappers below behave exactly like their ``jax.lax`` counterparts; when
an :func:`account` context is active during TRACING they additionally
record per-device byte counts using the standard cost model
(jax-ml.github.io/scaling-book collective costs):

  all_gather  of n local bytes over S devices : rx (S-1) * n
  all_to_all  of n total bytes                : tx (S-1)/S * n
  psum/pmean  (ring all-reduce) of n bytes    : 2 (S-1)/S * n
  ppermute    of n bytes                      : n

Usage (see tools/scaling_bench.py and __graft_entry__):

    with comms.account() as acc:
        jax.eval_shape(step_fn, *args)     # or any trace
    print(acc.table())
"""
from __future__ import annotations

import contextlib
from typing import Dict, List, Tuple

import jax
import numpy as np

_ACTIVE: List["Accounting"] = []


class Accounting:
    def __init__(self):
        # (collective, axis, label, bytes_per_device)
        self.events: List[Tuple[str, str, int]] = []

    def add(self, kind: str, axis, nbytes: float):
        self.events.append((kind, str(axis), int(nbytes)))

    def totals(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for kind, _axis, b in self.events:
            out[kind] = out.get(kind, 0) + b
        out["total"] = sum(out.values())
        return out

    def table(self) -> str:
        t = self.totals()
        lines = [f"  {k:12s} {v / 1e6:10.3f} MB/step/device"
                 for k, v in sorted(t.items()) if k != "total"]
        lines.append(f"  {'total':12s} {t['total'] / 1e6:10.3f} "
                     f"MB/step/device")
        return "\n".join(lines)

    def predicted_efficiency(self, step_time_s: float,
                             ici_bytes_per_s: float = 9e10) -> float:
        """Predicted multi-chip scaling efficiency assuming NO
        compute/communication overlap (pessimistic): eff = t_comp /
        (t_comp + t_ici). ``step_time_s`` is the measured single-chip
        step time; ``ici_bytes_per_s`` defaults to ~90 GB/s per chip
        per direction (TPU v5e-class ICI; override for other parts)."""
        t_ici = self.totals()["total"] / ici_bytes_per_s
        return step_time_s / (step_time_s + t_ici)


@contextlib.contextmanager
def account():
    acc = Accounting()
    _ACTIVE.append(acc)
    try:
        yield acc
    finally:
        _ACTIVE.remove(acc)


def _nbytes(x) -> int:
    return int(np.prod([int(d) for d in np.shape(x)])
               * np.dtype(x.dtype).itemsize) if hasattr(x, "dtype") else 0


def _axis_size(axis) -> int:
    names = axis if isinstance(axis, (tuple, list)) else (axis,)
    s = 1
    for n in names:
        s *= jax.lax.axis_size(n)
    return s


def _log(kind: str, axis, nbytes: float):
    for acc in _ACTIVE:
        acc.add(kind, axis, nbytes)


def all_gather(x, axis_name, **kw):
    out = jax.lax.all_gather(x, axis_name, **kw)
    if _ACTIVE:
        S = _axis_size(axis_name)
        _log("all_gather", axis_name,
             (S - 1) * sum(_nbytes(v) for v in jax.tree.leaves(x)))
    return out


def all_to_all(x, axis_name, split_axis, concat_axis, tiled=False):
    out = jax.lax.all_to_all(x, axis_name, split_axis=split_axis,
                             concat_axis=concat_axis, tiled=tiled)
    if _ACTIVE:
        S = _axis_size(axis_name)
        _log("all_to_all", axis_name, (S - 1) / S * _nbytes(x))
    return out


def psum(x, axis_name):
    out = jax.lax.psum(x, axis_name)
    if _ACTIVE:
        S = _axis_size(axis_name)
        _log("psum", axis_name,
             2 * (S - 1) / S * sum(_nbytes(v)
                                   for v in jax.tree.leaves(x)))
    return out


def pmean(x, axis_name):
    out = jax.lax.pmean(x, axis_name)
    if _ACTIVE:
        S = _axis_size(axis_name)
        _log("pmean", axis_name,
             2 * (S - 1) / S * sum(_nbytes(v)
                                   for v in jax.tree.leaves(x)))
    return out


def ppermute(x, axis_name, perm):
    out = jax.lax.ppermute(x, axis_name, perm)
    if _ACTIVE:
        _log("ppermute", axis_name, _nbytes(x))
    return out
