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
    if np.ndim(desired_velocity) == 0:
        # scalar cruise speed: exact reference parity
        if mode == "forcespro":
            n_const = max(T - H, 0)
            vdes = np.concatenate([
                np.full(n_const, desired_velocity),
                np.linspace(desired_velocity, 0.0, min(H, T))])
        elif mode == "casadi":
            vdes = np.full(T, desired_velocity)
        else:
            raise ValueError(f"unknown reference mode '{mode}'")
    else:
        # per-point profile (curvature speed planning, ``speed_profile``)
        base = np.asarray(desired_velocity, dtype=float)
        if base.shape[0] != T:
            raise ValueError(
                f"v_des profile has {base.shape[0]} rows, path has {T}")
        if mode == "forcespro":
            n_ramp = min(H, T)
            vdes = base.copy()
            vdes[T - n_ramp:] = np.minimum(
                vdes[T - n_ramp:],
                np.linspace(float(base[T - n_ramp]), 0.0, n_ramp))
        elif mode == "casadi":
            vdes = base
        else:
            raise ValueError(f"unknown reference mode '{mode}'")
    vdes = np.concatenate([vdes, np.repeat(vdes[-1:], pad)])
    return ReferenceTrack(
        path=jnp.asarray(path, dtype),
        psi=jnp.asarray(psi, dtype),
        vdes=jnp.asarray(vdes, dtype),
        T=jnp.asarray(T, jnp.int32),
    )


def speed_profile(reference_path: np.ndarray, v_des: float,
                  a_lat_max: float, a_long_max: float,
                  wheelbase: float, steer_rate_max: float) -> np.ndarray:
    """Curvature-aware desired-velocity profile (host side, (T,)).

    Classic speed planning the reference never needed (its configured
    scenarios are straight roads): cap the cruise v_des by
      * lateral acceleration through curvature:  v <= sqrt(a_lat / |kappa|)
      * steering-rate feasibility: delta = atan(l kappa) must be windable
        at delta_dot_max while traversing:  v <= delta_dot_max / |d delta/ds|
    then enforce longitudinal accel/decel limits with a backward + forward
    pass over arc length.  Opt-in via YAML ``curvature_speed_limit: true``.
    """
    from mpc_tpu.utils.geometry import (
        compute_curvature_from_polyline, compute_pathlength_from_polyline)

    path = np.asarray(reference_path, dtype=float)
    kappa = compute_curvature_from_polyline(path)
    s = compute_pathlength_from_polyline(path)
    v_curve = np.sqrt(a_lat_max / np.maximum(np.abs(kappa), 1e-6))
    delta = np.arctan(wheelbase * kappa)
    dds = np.abs(np.gradient(delta, np.maximum(s, 1e-9), edge_order=1)) \
        if len(s) > 2 else np.zeros_like(delta)
    v_steer = steer_rate_max / np.maximum(dds, 1e-6)
    v = np.minimum(np.full(len(path), float(v_des)),
                   np.minimum(v_curve, v_steer))
    ds = np.diff(s)
    for i in range(len(v) - 2, -1, -1):        # backward: decel feasible
        v[i] = min(v[i], np.sqrt(v[i + 1] ** 2 + 2 * a_long_max * ds[i]))
    for i in range(1, len(v)):                 # forward: accel feasible
        v[i] = min(v[i], np.sqrt(v[i - 1] ** 2 + 2 * a_long_max * ds[i - 1]))
    return v


def progress_index(track: ReferenceTrack, x: jax.Array) -> jax.Array:
    """Path index of the ego's closest reference point (device side).

    Progress-based windowing: using this instead of the loop step index
    turns trajectory tracking (time-parameterized, reference behavior)
    into path tracking.  The reference's schedule-based windows assume the
    ego holds v_des from step 0 (``optimizer.py:291-323, 657-702``); an ego
    that cannot (e.g. USA_Peach starts at rest) falls behind the schedule
    and the end-of-path window then drags it off the remaining path.
    Opt-in via ``progress_window: true`` (no reference analog).
    """
    d2 = jnp.sum((track.path - x[..., :2]) ** 2, axis=-1)
    return jnp.argmin(d2).astype(jnp.int32)


def progress_index_local(track: ReferenceTrack, x: jax.Array,
                         prev: jax.Array, ahead: int) -> jax.Array:
    """Monotone-local progress: closest path index within ``[prev,
    prev + ahead)``.

    A global argmin (``progress_index``) jumps branches when the route
    passes near itself (intersections, hairpins) and can strand the ego
    equidistant between two branches; restricting the search to a forward
    window keeps progress monotone and local.  ``ahead`` must exceed the
    points traversable in one step (v_max * dt / spacing) plus the lateral
    search slack; the loop uses ``max(H + 2, 16)``.
    """
    # clamp the window start ourselves: dynamic_slice silently shifts a
    # start that runs past the end, which would misalign ``start + argmin``
    n = track.path.shape[0]
    start = jnp.clip(prev, 0, n - ahead)
    sl = jax.lax.dynamic_slice(track.path, (start, 0), (ahead, 2))
    d2 = jnp.sum((sl - x[..., :2]) ** 2, axis=-1)
    # never report progress past the true path end (indices beyond T are
    # padding that repeats the final point)
    return jnp.minimum(start + jnp.argmin(d2).astype(jnp.int32), track.T)


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
    if mode == "casadi" and x0 is not None:
        # parity quirk tied to the LOOP step (optimizer.py:581).  Progress-
        # window callers pass x0=None: their base index is path progress,
        # not the loop step, and tiling would deadlock an ego at rest at
        # the path start (base stays 0 -> target = stay put).
        rows = jnp.where(step == 0, jnp.broadcast_to(x0, rows.shape), rows)
    return rows
