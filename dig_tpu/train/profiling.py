"""Profiler integration — `jax.profiler` traces as a first-class trainer
capability (SURVEY.md §5: the reference's only tracing is `time.perf_counter`
log lines at dig/lsgraph/method/GraphFMOB/metis.py:20-23 and tqdm bars).

Two entry points:

* :class:`StepProfiler` — arms a `jax.profiler.trace` around a window of
  training steps (start step / number of steps), annotating each step with
  `jax.profiler.StepTraceAnnotation` so the trace viewer groups device ops
  per step. `Run3D(profile_dir=...)` drives it automatically.
* :func:`profile_block` — context manager for ad-hoc tracing of any region
  (compilation, eval pass, data staging).

Traces are written as standard XPlane protobufs that TensorBoard's profile
plugin / `xprof` consume. Note: through a tunneled single-chip endpoint the
runtime may only export host-side events; on directly-attached TPU hosts
the device rows (MXU utilization, HBM traffic, collective overlap) appear
as usual, which is what the compute/comm-overlap verification in
reports/gp_overlap.md uses on real multi-chip hardware.
"""
from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


class StepProfiler:
    """Trace a window of steps: [start_step, start_step + num_steps).

    Call :meth:`step` once per optimization step *around* the step dispatch
    (it returns a context manager). Safe no-op when `log_dir` is falsy.

        prof = StepProfiler(log_dir, start_step=10, num_steps=5)
        for g in loader:
            with prof.step():
                state, aux = train_step(state, g)
        prof.stop()  # idempotent; also stops automatically after the window
    """

    def __init__(self, log_dir: Optional[str], start_step: int = 10,
                 num_steps: int = 5):
        self.log_dir = log_dir
        self.start = start_step
        self.end = start_step + num_steps
        self._n = 0
        self._active = False

    def _maybe_start(self):
        if self.log_dir and not self._active and self._n == self.start:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    @contextlib.contextmanager
    def step(self):
        self._maybe_start()
        try:
            if self._active:
                with jax.profiler.StepTraceAnnotation("train",
                                                      step_num=self._n):
                    yield
            else:
                yield
        except BaseException:
            # stop the trace when the step raises (OOM, NaN checks) — a
            # dangling active trace poisons every later start_trace in the
            # process and the partial trace is never flushed
            self.stop()
            raise
        self._n += 1
        if self._active and self._n >= self.end:
            self.stop()

    def stop(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def profile_block(log_dir: str, name: str = "block"):
    """Trace an arbitrary region into `log_dir` (XPlane format)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()
