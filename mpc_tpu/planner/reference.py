"""Per-step reference-window construction (device side).

Replaces the reference's host-side parameter packing in both closed loops:
  * FORCESPRO ``optimize``: path/velocity/orientation windows with
    end-of-path replenishment and the final-N deceleration ramp
    (``MPC_Planner/optimizer.py:291-323``)
  * CasADi ``desired_command_and_trajectory``: one-step-ahead windows with
    the frozen end-of-path indexing quirk (``optimizer.py:657-702``)

Host code precomputes padded arrays once; the per-step window is a
``lax.dynamic_slice`` inside the closed-loop ``lax.scan`` — no host
round-trips.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ReferenceTrack(NamedTuple):
    """Padded reference arrays (pytree carried into the closed-loop scan).

    path:   (T + H + 1, 2) padded with the final point
    psi:    (T + H + 1,)   padded with the final orientation
    vdes:   (T + H + 1,)   per-step desired velocity (ramp included for the
            forcespro variant; constant for casadi)
    T:      () int32 number of closed-loop steps (iter_length)
    """

    path: jax.Array
    psi: jax.Array
    vdes: jax.Array
    T: jax.Array


def build_track(reference_path: np.ndarray, orientation: np.ndarray,
                desired_velocity: float, horizon: int, mode: str,
                dtype=jnp.float32) -> ReferenceTrack:
    """Precompute the padded track arrays on host.

    mode 'forcespro': desired velocity ramps linearly to 0 over the final
    ``horizon`` steps (``optimizer.py:293-295``).  mode 'casadi': constant
    desired velocity (``optimizer.py:675, 689``).
    """
    T = int(reference_path.shape[0])
    H = int(horizon)
    pad = H + 1
    path = np.concatenate(
        [reference_path, np.repeat(reference_path[-1:], pad, axis=0)], axis=0)
    psi = np.concatenate([orientation, np.repeat(orientation[-1:], pad)])
    if mode == "forcespro":
        n_const = max(T - H, 0)
        vdes = np.concatenate([
            np.full(n_const, desired_velocity),
            np.linspace(desired_velocity, 0.0, min(H, T))])
    elif mode == "casadi":
        vdes = np.full(T, desired_velocity)
    else:
        raise ValueError(f"unknown reference mode '{mode}'")
    vdes = np.concatenate([vdes, np.repeat(vdes[-1:], pad)])
    return ReferenceTrack(
        path=jnp.asarray(path, dtype),
        psi=jnp.asarray(psi, dtype),
        vdes=jnp.asarray(vdes, dtype),
        T=jnp.asarray(T, jnp.int32),
    )


def window(track: ReferenceTrack, step: jax.Array, horizon: int,
           mode: str, x0: jax.Array | None = None) -> jax.Array:
    """Reference rows (H+1, 5) for closed-loop step ``step``.

    Row m targets predicted state X_m.
      forcespro: row m <- path[step + 1 + m] — the solver consumes the window
                 built in the same iteration (``optimizer.py:291-323``); past
                 the path end the padded region reproduces the replenishment
                 loop (``optimizer.py:305-308``).
      casadi:    row m <- path[min(step, T - H) + m].  The reference's loop
                 consumes ``next_trajectories`` computed by
                 ``desired_command_and_trajectory(step - 1, ...)`` at the END
                 of the previous iteration (``optimizer.py:600, 628``), whose
                 rows 1..N hold path[(step-1) + k + 1] = path[step + k], with
                 the frozen end-of-path indexing for step-1 >= T-N
                 (``optimizer.py:670-683``).  At step 0 the window is the
                 tiled current state (``optimizer.py:581``) — pass ``x0``.
    """
    H = horizon
    if mode == "forcespro":
        base = step + 1
    elif mode == "casadi":
        base = jnp.clip(step, 0, track.T - H)
    else:
        raise ValueError(f"unknown reference mode '{mode}'")
    p = jax.lax.dynamic_slice(track.path, (base, 0), (H + 1, 2))
    psi = jax.lax.dynamic_slice(track.psi, (base,), (H + 1,))
    v = jax.lax.dynamic_slice(track.vdes, (base,), (H + 1,))
    zeros = jnp.zeros_like(psi)
    rows = jnp.stack([p[:, 0], p[:, 1], zeros, v, psi], axis=1)
    if mode == "casadi":
        if x0 is None:
            raise ValueError("casadi mode needs x0 for the step-0 window")
        rows = jnp.where(step == 0, jnp.broadcast_to(x0, rows.shape), rows)
    return rows
