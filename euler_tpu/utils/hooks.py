"""Run hooks: logging, profiling, multi-host exit sync.

TPU-native counterparts of the reference's hooks
(reference: tf.train.LoggingTensorHook usage base_estimator.py:90-95,
ProfilerHook base_estimator.py:130-134, SyncExitHook utils/hooks.py:26-40
— a TF variable counting finished workers).
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional


class LoggingHook:
    """Call ``log_fn`` every ``every`` steps with step/loss/rate."""

    def __init__(self, every: int = 100, log_fn: Callable = print):
        self.every = every
        self.log_fn = log_fn
        self._t0 = None

    def __call__(self, step: int, loss: float, batch_size: int):
        if self._t0 is None:
            self._t0 = time.time()
        if self.every and step % self.every == 0:
            rate = step * batch_size / max(time.time() - self._t0, 1e-9)
            self.log_fn(f"[euler_tpu] step {step} loss={loss:.4f} "
                        f"({rate:.0f} ex/s)")


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+steps)
    (reference: ProfilerHook(50, 'prof_dir'), base_estimator.py:130-134).
    View with TensorBoard or Perfetto."""

    def __init__(self, out_dir: str = "prof_dir", start: int = 10,
                 steps: int = 10):
        self.out_dir = out_dir
        self.start = start
        self.stop = start + steps
        self._active = False

    def __call__(self, step: int, *_):
        import jax
        if step == self.start and not self._active:
            os.makedirs(self.out_dir, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


class SyncExitHook:
    """Block until all hosts reach the end of training.

    Under jax.distributed this is one barrier over the job — the
    TF-variable polling loop of the reference collapses into
    ``multihost_utils.sync_global_devices``."""

    def __init__(self, name: str = "euler_tpu_exit"):
        self.name = name

    def __call__(self):
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(self.name)
