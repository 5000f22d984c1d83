"""Debug mode: NaN checks, donation/aliasing asserts, collective self-checks.

The reference has no sanitizers at all — its correctness-by-construction
story is a single-worker C++ thread pool serializing async IO
(dig/lsgraph/method/GraphFMOB/csrc/thread.h:10-68) plus pinned-memory
asserts (csrc/cuda/sync_cuda.cu:26,56-57). On TPU the analogous hazards are
different: silent NaNs under jit, use-after-donate aliasing bugs, and a
mis-wired device mesh silently computing wrong collectives. This module
makes each one loud (SURVEY.md §5 "race detection / debug mode").

* :func:`debug_mode` — context manager enabling `jax_debug_nans` (any NaN
  produced under jit raises at the offending primitive).
* :func:`assert_donation_discipline` — runs a donated step twice, then
  verifies the donated input buffer was actually invalidated (catching
  silently-copied "donations" — a perf bug — and, via the RuntimeError on
  reuse, use-after-donate aliasing).
* :func:`collective_selfcheck` — runs psum / all_gather / ppermute over a
  mesh with known per-device inputs and asserts the exact expected results,
  catching broken ICI routing / mis-declared shardings before they corrupt
  a training run.
"""
from __future__ import annotations

import contextlib
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True):
    """Enable loud-failure debugging for the enclosed region."""
    prev = jax.config.jax_debug_nans
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_donation_discipline(step_fn, state, batch) -> None:
    """Verify `step_fn(state, batch)` (jitted with donate_argnums=(0,))
    really donates: after the call the old state buffers must be dead, and
    touching them must raise rather than silently alias fresh memory.

    Raises AssertionError if the runtime copied instead of donating (the
    buffer stayed live), or if reuse does not error.
    """
    new_state, _ = step_fn(state, batch)
    jax.block_until_ready(new_state)
    leaves = [x for x in jax.tree_util.tree_leaves(state)
              if isinstance(x, jax.Array)]
    donated = deleted = 0
    for x in leaves:
        if x.is_deleted():
            deleted += 1
            donated += 1
            try:
                np.asarray(x)
            except RuntimeError:
                continue
            raise AssertionError(
                "donated buffer was readable after donation (aliasing)")
    if deleted == 0:
        raise AssertionError(
            "no input buffer was invalidated: the step copied instead of "
            "donating (check donate_argnums / input shardings)")


def collective_selfcheck(mesh, axis: str = None) -> dict:
    """Run known-answer collectives over every axis of `mesh` and assert
    exact results. Returns {axis: size} on success; raises otherwise."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    checked = {}
    axes = [axis] if axis else list(mesh.axis_names)
    for ax in axes:
        n = mesh.shape[ax]
        x = jnp.arange(n, dtype=jnp.float32)

        @partial(shard_map, mesh=mesh, in_specs=P(ax), out_specs=P(ax),
                 check_vma=False)
        def probe(xs):
            me = xs[0]                                   # this shard's id
            tot = jax.lax.psum(me, ax)                   # sum of ids
            gathered = jax.lax.all_gather(me, ax)        # all ids in order
            nbr = jax.lax.ppermute(
                me, ax, [(i, (i + 1) % n) for i in range(n)])
            ok_sum = tot == n * (n - 1) / 2
            ok_gather = jnp.all(gathered == jnp.arange(n, dtype=jnp.float32))
            ok_perm = nbr == (me - 1) % n
            return jnp.stack([ok_sum, ok_gather, ok_perm,
                              jnp.asarray(True)]).astype(jnp.float32)[None]

        res = np.asarray(probe(x))
        if not np.all(res == 1.0):
            names = ["psum", "all_gather", "ppermute"]
            bad = [names[i] for i in range(3) if not np.all(res[:, i] == 1.0)]
            raise AssertionError(
                f"collective self-check FAILED on axis {ax!r}: {bad} "
                f"returned wrong results — mesh/ICI wiring is broken")
        checked[ax] = n
    return checked
