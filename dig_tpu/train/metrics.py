"""Structured metrics: JSONL writer + step/sec and edges/sec counters.

The reference logs via raw prints and TensorBoard scalars
(``dig/threedgraph/method/run.py:65,82-85``); here metrics are structured
dicts appended to a JSONL file (easily tailed/plotted) with built-in
throughput accounting — edges/s is a first-class north-star metric
(SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, quiet: bool = False):
        self.log_dir = log_dir
        self.quiet = quiet
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.perf_counter()

    def log(self, step: int, payload: Dict, prefix: str = ""):
        rec = {"step": step, "t": round(time.perf_counter() - self._t0, 3)}
        rec.update({(f"{prefix}/{k}" if prefix else k): _to_float(v)
                    for k, v in payload.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if not self.quiet:
            msg = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in rec.items())
            print(msg, flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class Throughput:
    """Running steps/s and edges/s counter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t = time.perf_counter()
        self._steps = 0
        self._edges = 0

    def update(self, n_edges: int = 0):
        self._steps += 1
        self._edges += int(n_edges)

    def rates(self):
        dt = max(time.perf_counter() - self._t, 1e-9)
        return {"steps_per_s": self._steps / dt, "edges_per_s": self._edges / dt}
