"""Profiling & tracing utilities.

The reference's only instrumentation is ``time.time()`` wall-clock pairs
around each solve (``MPC_Planner/optimizer.py:283, 360-362, 592-608``),
persisted as ``solve time.txt``.  Here:

  * :func:`trace` wraps ``jax.profiler`` for full XLA traces viewable in
    TensorBoard/Perfetto;
  * :func:`time_jitted` measures steady-state device time of a jitted
    callable.  It reduces the output pytree to ONE scalar on device before
    fetching, so the measurement is not polluted by host transfers — on
    remote-attached TPUs (e.g. relay/tunnel setups) fetching a full result
    can cost 10-100x the kernel itself and `block_until_ready` may not
    reliably block;
  * :func:`solve_time_series` reproduces the reference's per-step
    ``solve time.txt`` semantics from a wall-timed closed-loop run.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace context (TensorBoard/Perfetto format).

    Replaces the reference's wall-clock-only instrumentation with real
    per-kernel device timelines::

        with profiling.trace("/tmp/trace"):
            res = cl.closed_loop_batch_vec(lcfg, params)
            jax.block_until_ready(res)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _scalarize(fn: Callable) -> Callable:
    """Wrap ``fn`` so its output pytree reduces to one on-device scalar."""
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        return sum((jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves),
                   jnp.float32(0.0))
    return jax.jit(wrapped)


def time_jitted(fn: Callable, *args, reps: int = 10,
                warmup: int = 1) -> float:
    """Steady-state seconds per call of ``fn(*args)`` (device time).

    ``fn`` is jitted with its output reduced to a single scalar on device;
    only that scalar crosses the host boundary, so transfer cost does not
    contaminate the measurement.
    """
    f = _scalarize(fn)
    for _ in range(max(warmup, 1)):
        float(f(*args))          # compile + settle
    t0 = time.perf_counter()
    v = None
    for _ in range(reps):
        v = f(*args)
    float(v)                     # one scalar fetch drains the stream
    return (time.perf_counter() - t0) / reps


def solve_time_series(total_wall_s: float, n_steps: int) -> np.ndarray:
    """Per-step solve-time array in the reference's ``solve time.txt``
    format (one float per closed-loop step, seconds).

    The on-device ``lax.scan`` loop has no per-step host timestamps; the
    honest equivalent is the amortized per-step time, constant across the
    series (the reference's series varies because each step pays Python +
    solver-rebuild overhead we don't have, ``optimizer.py:603-608``).
    """
    return np.full(int(n_steps), float(total_wall_s) / max(int(n_steps), 1))


def breakdown(named_fns: Sequence, reps: int = 10) -> dict:
    """Time a list of ``(name, fn, args)`` triples; returns {name: ms}."""
    out = {}
    for name, fn, args in named_fns:
        out[name] = 1e3 * time_jitted(fn, *args, reps=reps)
    return out
