"""Stagewise inequality constraints, pure jnp.

Replaces both reference constraint stacks:
  * FORCESPRO ``circles_distance_inequality`` + variable bounds
    (``MPC_Planner/optimizer.py:100-161``): friction circle
    a^2 + (v*psidot)^2 <= a_max^2 and 9 squared ego-circle/obstacle-circle
    distances >= (r_ego + r_obs)^2.
  * CasADi ``equal_constraints``/``inequal_constraints``
    (``MPC_Planner/optimizer.py:373-491``): |a^2 + v^2 tan(delta)/l| <= a_max
    (emitted once, effectively stage 0) and 3 distinct sqrt circle distances
    >= r_ego + r_obs (each emitted 3x in the reference; duplicates are
    identical rows and do not change the KKT point, so we emit each once).

Geometry helpers mirror ``MPC_Planner/configuration.py:40-93``.

All constraints are expressed as  lo <= h(x, u) <= hi  rows with fixed shape
per stage so the whole stack vmaps/scans under jit.  Box bounds on states and
inputs are handled separately by the solver (clipping + AL), matching the
reference's lbx/ubx (``optimizer.py:470-491``) and z bounds
(``optimizer.py:108-109``).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def approx_circle_radius(length: float, width: float) -> Tuple[float, float]:
    """3-circle approximation radius + center spacing of a rectangle.

    Host-side (NumPy): parity with ``configuration.py:40-66`` including the
    round-to-0.1-then-bump-up quirk.
    """
    assert length >= 0 and width >= 0
    if np.isclose(length, 0.0) and np.isclose(width, 0.0):
        return 0.0, 0.0
    square_length = length / 3.0
    diagonal_square = float(np.sqrt((square_length / 2.0) ** 2
                                    + (width / 2.0) ** 2))
    if diagonal_square > round(diagonal_square, 1):
        approx_radius = round(diagonal_square, 1) + 0.1
    else:
        approx_radius = round(diagonal_square, 1)
    return approx_radius, round(square_length * 2.0, 1)


def circle_centers(x: jax.Array, y: jax.Array, length: float, width: float,
                   orientation: jax.Array) -> jax.Array:
    """Centers of the 3 approximating circles, shape (..., 3, 2).

    Order [center, front, rear] — parity with ``configuration.py:69-93``.
    Traced (works on jnp arrays) unlike the reference's CasADi-list version.
    """
    _, disc_distance = approx_circle_radius(length, width)
    d = disc_distance / 2.0 / 2.0  # distance_centers / 2 (configuration.py:83-91)
    c, s = jnp.cos(orientation), jnp.sin(orientation)
    center = jnp.stack([x, y], axis=-1)
    front = jnp.stack([x + d * c, y + d * s], axis=-1)
    rear = jnp.stack([x - d * c, y - d * s], axis=-1)
    return jnp.stack([center, front, rear], axis=-2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObstacleParams:
    """Runtime obstacle data for the circle-distance constraints.

    centers: (3, 2) obstacle circle centers [center, front, rear]
             (reference packs these into runtime params, optimizer.py:311-322).
    min_dist: () scalar r_ego + r_obs (CasADi sqrt form lower bound,
              ``optimizer.py:440``) — squared by the FORCESPRO form
              (``optimizer.py:110``).
    """

    centers: jax.Array
    min_dist: jax.Array


# Number of two-sided inequality rows emitted per stage (fixed shape):
#   1 friction-circle row + 9 circle-distance rows.
NUM_INEQ = 10
# Optional road-boundary rows: 3 ego circles x 2 boundaries.  The reference
# carries this constraint set commented out (``optimizer.py:113-161,
# 404-410``: min distance of each ego circle to each boundary polyline
# >= r_ego); here it is a first-class optional feature.
NUM_BOUNDARY = 6


def signed_distance_to_polyline(p: jax.Array, poly: jax.Array) -> jax.Array:
    """Signed distance of point ``p`` (2,) to a polyline (NB, 2).

    Sign follows the cross product of the nearest segment direction with the
    offset vector (positive = left of the directed polyline).  Callers
    calibrate the sign per boundary so that positive means "inside the road".
    """
    a = poly[:-1]
    b = poly[1:]
    ab = b - a
    ab2 = jnp.sum(ab * ab, axis=1)
    t = jnp.clip(jnp.sum((p - a) * ab, axis=1)
                 / jnp.where(ab2 < 1e-12, 1e-12, ab2), 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = jnp.sum((proj - p) ** 2, axis=1)
    i = jnp.argmin(d2)
    cross = ab[i, 0] * (p[1] - a[i, 1]) - ab[i, 1] * (p[0] - a[i, 0])
    return jnp.sign(cross) * jnp.sqrt(d2[i] + 1e-12)


def boundary_rows(x: jax.Array, ego_length: float, ego_width: float,
                  boundaries: jax.Array, boundary_signs: jax.Array,
                  r_ego: float):
    """Signed distance of each ego circle to each boundary, shape (6,).

    boundaries: (2, NB, 2) padded polylines (left, right);
    boundary_signs: (2,) +-1 so that h > 0 means inside the road.
    The reference's commented version (``optimizer.py:18-30, 404-410``) uses
    UNSIGNED min point distance — which is also satisfied outside the road
    and actively pushes an ego near the line to either side; the signed form
    is the corrected behavior.  lo = r_ego per ``optimizer.py:449-454``.
    """
    psi = x[..., 4]
    ego = circle_centers(x[..., 0], x[..., 1], ego_length, ego_width, psi)

    def per_pair(center, b_idx):
        d = signed_distance_to_polyline(center, boundaries[b_idx])
        return boundary_signs[b_idx] * d

    h = jnp.stack([per_pair(ego[i], j)
                   for i in range(3) for j in range(2)])
    lo = jnp.full((6,), r_ego, x.dtype)
    hi = jnp.full((6,), jnp.inf, x.dtype)
    return h, lo, hi


def stage_ineq_forcespro(x: jax.Array, u: jax.Array, obs: ObstacleParams,
                         ego_length: float, ego_width: float,
                         wheelbase: float, a_max: float):
    """FORCESPRO-form rows (``optimizer.py:121-161``), shape (NUM_INEQ,).

    Returns (h, lo, hi):
      h[0]    = a^2 + (v * psidot)^2,                  in [0, a_max^2]
      h[1:10] = distances ego circle i <-> obstacle circle j,
                in [r_ego+r_obs, inf)   (all 9 pairs)

    NOTE: the reference emits the distance rows SQUARED
    (``optimizer.py:146-155``: d^2 >= (r_ego+r_obs)^2).  The feasible set of
    d >= r is identical; the sqrt form is used here because its gradients
    are unit-norm (the squared form's scale with d, which conditions the AL
    badly when rows activate deep in the horizon).  Same 9-pair structure.
    """
    v, delta, psi = x[..., 3], x[..., 2], x[..., 4]
    a = u[..., 1]
    psi_dot = v * jnp.tan(delta) / wheelbase
    friction = a * a + (v * psi_dot) ** 2

    ego = circle_centers(x[..., 0], x[..., 1], ego_length, ego_width, psi)
    # (3, 1, 2) - (1, 3, 2) -> (3, 3, 2): all ego-circle x obstacle-circle pairs
    diff = ego[..., :, None, :] - obs.centers[..., None, :, :]
    eps = 1e-9  # sqrt grad guard at exactly-coincident centers
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1).reshape(*x.shape[:-1], 9)
                 + eps)

    h = jnp.concatenate([friction[..., None], d], axis=-1)
    lo = jnp.concatenate([
        jnp.zeros_like(friction)[..., None],
        jnp.broadcast_to(obs.min_dist[..., None], d.shape)], axis=-1)
    hi = jnp.concatenate([
        jnp.full_like(friction, a_max ** 2)[..., None],
        jnp.full_like(d, jnp.inf)], axis=-1)
    return h, lo, hi


def stage_ineq_casadi(x: jax.Array, u: jax.Array, obs: ObstacleParams,
                      ego_length: float, ego_width: float,
                      wheelbase: float, a_max: float,
                      friction_active: jax.Array):
    """CasADi-form rows (``optimizer.py:378, 395-403``), shape (NUM_INEQ,).

    The reference emits its friction term once for the whole NLP (the scalar
    lands before the stage loop, so it binds only the stage-0 variables,
    ``optimizer.py:378``); ``friction_active`` masks it to stage 0.
    Its algebraic form is |a^2 + v^2 tan(delta) / 2.578| <= a_max with the
    wheelbase hard-coded (we use the configured wheelbase; identical for the
    shipped configs).  Distances are the 3 matched circle pairs
    (center-center, front-front, rear-rear) in sqrt form >= r_ego + r_obs;
    the reference emits each 3x (identical rows) — here each pair appears 3x
    as well to keep NUM_INEQ fixed across formulations (identical rows leave
    the KKT point unchanged).
    """
    v, delta, psi = x[..., 3], x[..., 2], x[..., 4]
    a = u[..., 1]
    friction = jnp.abs(a * a + v * (jnp.tan(delta) * v) / wheelbase)
    # Masked-out rows become trivially satisfied (h=0 in [0, a_max]).
    friction = jnp.where(friction_active, friction, 0.0)

    ego = circle_centers(x[..., 0], x[..., 1], ego_length, ego_width, psi)
    diff = ego - obs.centers  # matched pairs: (3, 2)
    eps = 1e-9  # sqrt grad guard; reference relies on IPOPT never hitting 0
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)  # (..., 3)
    d9 = jnp.repeat(d, 3, axis=-1)  # each pair 3x (optimizer.py:395-403)

    h = jnp.concatenate([friction[..., None], d9], axis=-1)
    lo = jnp.concatenate([
        jnp.zeros_like(friction)[..., None],
        jnp.broadcast_to(obs.min_dist[..., None], d9.shape)], axis=-1)
    hi = jnp.concatenate([
        jnp.full_like(friction, a_max)[..., None],
        jnp.full_like(d9, jnp.inf)], axis=-1)
    return h, lo, hi


@dataclasses.dataclass(frozen=True)
class BoxBounds:
    """Static box bounds on inputs and states.

    FORCESPRO z bounds (``optimizer.py:108-109``) and CasADi lbx/ubx
    (``optimizer.py:470-491``).  The CasADi path leaves aLong unbounded below
    (``lbx.append(-np.inf)``, ``optimizer.py:476``); ``a_min`` captures that
    divergence.
    """

    u_lo: Tuple[float, float]
    u_hi: Tuple[float, float]
    x_lo: Tuple[float, float, float, float, float]
    x_hi: Tuple[float, float, float, float, float]

    def as_arrays(self, dtype=jnp.float32):
        return (jnp.array(self.u_lo, dtype), jnp.array(self.u_hi, dtype),
                jnp.array(self.x_lo, dtype), jnp.array(self.x_hi, dtype))


def make_box_bounds(p, formulation: str) -> BoxBounds:
    """Build box bounds from vehicle params for a formulation.

    p: VehicleParams.  formulation: 'forcespro' | 'casadi'.
    """
    inf = float("inf")
    a_lo = -p.longitudinal.a_max if formulation == "forcespro" else -inf
    return BoxBounds(
        u_lo=(p.steering.v_min, a_lo),
        u_hi=(p.steering.v_max, p.longitudinal.a_max),
        x_lo=(-inf, -inf, p.steering.min, 0.0, -inf),
        x_hi=(inf, inf, p.steering.max, p.longitudinal.v_max, inf),
    )
