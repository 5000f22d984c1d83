"""Multi-host entry point + elastic-training scaffolding.

The reference has no distributed story at all (SURVEY §2.10: no NCCL/MPI/
torch.distributed anywhere); BASELINE.json's "1 chip -> 2 hosts >= 80%
efficiency" target needs (a) a process-group entry point, (b) failure
handling: checkpoint-on-signal and a restartable data iterator so a
preempted run resumes mid-epoch. This module provides all three as
host-count-agnostic utilities — with one process they are exact no-ops /
pass-throughs, so the same training script runs anywhere (exercised at
process count 1 in ``__graft_entry__.dryrun_multichip``).
"""
from __future__ import annotations

import os
import signal
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Multi-host entry point: ``jax.distributed.initialize`` driven by
    explicit args or the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Single-process (no coordinator
    configured) is a no-op returning False, so scripts call this
    unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator_address is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis_names=("data",), shape=None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    ``initialize``)."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices())
    if shape is not None:
        devs = devs[: int(np.prod(shape))].reshape(shape)
    else:
        devs = devs.reshape((-1,) + (1,) * (len(axis_names) - 1))
    return Mesh(devs, axis_names)


class CheckpointOnSignal:
    """Preemption safety net: on SIGTERM/SIGUSR1 (and optionally SIGINT),
    sets a flag the training loop polls; the loop then saves and exits
    cleanly. Optionally calls ``save_fn()`` directly from the handler for
    loops that cannot poll.

    Usage::

        guard = CheckpointOnSignal(save_fn=lambda: ckpt.save(state))
        for step, batch in loader:
            ...
            if guard.should_stop:   # poll once per step
                break
    """

    def __init__(self, save_fn: Optional[Callable[[], None]] = None,
                 signals=(signal.SIGTERM,), immediate: bool = False):
        self.save_fn = save_fn
        self.immediate = immediate
        self._stop = threading.Event()
        self._prev = {}
        for sig in signals:
            self._prev[sig] = signal.signal(sig, self._handler)

    def _handler(self, signum, frame):
        self._stop.set()
        if self.immediate and self.save_fn is not None:
            self.save_fn()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def finalize(self):
        """Save (if not already) and restore previous signal handlers."""
        if self._stop.is_set() and not self.immediate and self.save_fn:
            self.save_fn()
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


@dataclass
class IteratorState:
    epoch: int = 0
    step: int = 0


class RestartableLoader:
    """Deterministic, resumable epoch iterator over any loader whose
    shuffling is a pure function of (seed, epoch) — all dig_tpu loaders.

    ``state_dict()`` / ``load_state_dict`` capture (epoch, step); after
    restore, iteration skips already-consumed batches of the current epoch
    so a preempted run continues exactly where it stopped (the failure-
    recovery half of SURVEY §5's elastic row)."""

    def __init__(self, loader):
        self.loader = loader
        self.state = IteratorState()

    def state_dict(self):
        return {"epoch": self.state.epoch, "step": self.state.step}

    def load_state_dict(self, d):
        self.state = IteratorState(int(d["epoch"]), int(d["step"]))

    def epochs(self, num_epochs: int) -> Iterator:
        """Yields (epoch, step, batch), resuming from the stored state."""
        while self.state.epoch < num_epochs:
            if hasattr(self.loader, "epoch"):
                # pin the loader's epoch counter for deterministic shuffles
                self.loader.epoch = self.state.epoch
            skip = self.state.step
            for k, batch in enumerate(iter(self.loader)):
                if k < skip:
                    continue
                # advance BEFORE yielding: a state_dict() taken after the
                # consumer finishes this batch records the next step to run
                self.state.step = k + 1
                yield self.state.epoch, k, batch
            self.state.epoch += 1
            self.state.step = 0
