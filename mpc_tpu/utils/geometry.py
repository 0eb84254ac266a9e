"""Polyline geometry utilities (host-side NumPy + traced jnp variants).

Replaces the reference's C++-backed ``commonroad_dc.geometry.util`` helpers
(``chaikins_corner_cutting``, ``resample_polyline``,
``compute_orientation_from_polyline``, ``compute_polyline_length`` — consumed
at ``MPC_Planner/configuration.py:19, 447, 524, 548-549``) and
``find_closest_point`` (``configuration.py:26-37``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def find_closest_point(path_points: np.ndarray, point: np.ndarray) -> int:
    """Index of the closest polyline point (``configuration.py:26-37``)."""
    diff = path_points - np.asarray(point).reshape(1, 2)
    return int(np.argmin(np.sum(diff * diff, axis=1)))


def compute_polyline_length(polyline: np.ndarray) -> float:
    """Total arc length of a polyline (role of ``compute_polyline_length``)."""
    seg = np.diff(polyline, axis=0)
    return float(np.sum(np.hypot(seg[:, 0], seg[:, 1])))


def compute_pathlength_from_polyline(polyline: np.ndarray) -> np.ndarray:
    """Cumulative arc length per vertex, shape (n,)."""
    seg = np.diff(polyline, axis=0)
    return np.concatenate([[0.0], np.cumsum(np.hypot(seg[:, 0], seg[:, 1]))])


def compute_orientation_from_polyline(polyline: np.ndarray) -> np.ndarray:
    """Heading per vertex via forward differences, last value repeated.

    Role of ``commonroad_dc``'s ``compute_orientation_from_polyline``
    (consumed at ``configuration.py:447``): orientation[i] = atan2 of segment
    i -> i+1; the final vertex inherits the last segment's heading.
    """
    polyline = np.asarray(polyline)
    seg = np.diff(polyline, axis=0)
    theta = np.arctan2(seg[:, 1], seg[:, 0])
    return np.concatenate([theta, theta[-1:]])


def compute_curvature_from_polyline(polyline: np.ndarray) -> np.ndarray:
    """Signed curvature per vertex via central differences."""
    x, y = polyline[:, 0], polyline[:, 1]
    dx, dy = np.gradient(x), np.gradient(y)
    ddx, ddy = np.gradient(dx), np.gradient(dy)
    denom = (dx * dx + dy * dy) ** 1.5
    denom = np.where(denom < 1e-12, 1e-12, denom)
    return (dx * ddy - dy * ddx) / denom


def chaikins_corner_cutting(polyline: np.ndarray,
                            refinements: int = 1) -> np.ndarray:
    """Chaikin corner-cutting smoothing (role of commonroad_dc's version,
    consumed at ``configuration.py:548``): each interior segment is replaced
    by its 1/4 and 3/4 points; endpoints are preserved.
    """
    pts = np.asarray(polyline, dtype=float)
    for _ in range(refinements):
        l = pts[:-1]
        r = pts[1:]
        q = 0.75 * l + 0.25 * r
        p = 0.25 * l + 0.75 * r
        inner = np.empty((2 * len(l), 2))
        inner[0::2] = q
        inner[1::2] = p
        pts = np.vstack([pts[:1], inner, pts[-1:]])
    return pts


def resample_polyline(polyline: np.ndarray, step: float) -> np.ndarray:
    """Resample a polyline at fixed arc-length spacing ``step``.

    Role of commonroad_dc's ``resample_polyline`` (consumed at
    ``configuration.py:549`` with ``step = v_des * dt``): walk the polyline
    emitting points every ``step`` meters of arc length, starting at the first
    vertex; the final vertex is appended if the remainder exceeds a tolerance.
    """
    polyline = np.asarray(polyline, dtype=float)
    if len(polyline) < 2:
        return polyline.copy()
    s = compute_pathlength_from_polyline(polyline)
    total = s[-1]
    n = int(np.floor(total / step)) + 1
    targets = np.arange(n) * step
    xs = np.interp(targets, s, polyline[:, 0])
    ys = np.interp(targets, s, polyline[:, 1])
    out = np.stack([xs, ys], axis=1)
    # append the exact endpoint if the tail remainder is significant
    if total - targets[-1] > 1e-6:
        out = np.vstack([out, polyline[-1:]])
    return out


# ---------------------------------------------------------------------------
# Traced (jnp) variants for on-device use
# ---------------------------------------------------------------------------

def closest_point_index_jnp(path_points: jnp.ndarray,
                            point: jnp.ndarray) -> jnp.ndarray:
    """Traced argmin-distance (device-side analog of find_closest_point)."""
    diff = path_points - point.reshape(1, 2)
    return jnp.argmin(jnp.sum(diff * diff, axis=1))


def arclength_projection_jnp(path_points: jnp.ndarray,
                             point: jnp.ndarray) -> jnp.ndarray:
    """Arc-length coordinate of the projection of ``point`` onto a polyline.

    Device-side replacement for the role of the C++ curvilinear coordinate
    system (``pycrccosy.CurvilinearCoordinateSystem``, reference
    ``configuration.py:264-277``): projects onto each segment, clamps to the
    segment, and returns s at the globally nearest projection.
    """
    a = path_points[:-1]
    b = path_points[1:]
    ab = b - a
    ab2 = jnp.sum(ab * ab, axis=1)
    t = jnp.clip(jnp.sum((point - a) * ab, axis=1)
                 / jnp.where(ab2 < 1e-12, 1e-12, ab2), 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = jnp.sum((proj - point) ** 2, axis=1)
    seg_len = jnp.sqrt(ab2)
    s = jnp.concatenate([jnp.zeros(1, dtype=seg_len.dtype),
                         jnp.cumsum(seg_len)])
    idx = jnp.argmin(d2)
    return s[idx] + t[idx] * seg_len[idx]


def point_polyline_distance(point: np.ndarray, poly: np.ndarray) -> float:
    """Unsigned min distance from ``point`` (2,) to polyline segments."""
    a = poly[:-1]
    b = poly[1:]
    ab = b - a
    ab2 = np.maximum(np.sum(ab * ab, axis=1), 1e-12)
    t = np.clip(np.sum((point - a) * ab, axis=1) / ab2, 0.0, 1.0)
    proj = a + t[:, None] * ab
    return float(np.sqrt(np.min(np.sum((proj - point) ** 2, axis=1))))


def detour_side_from_road(path: np.ndarray, obstacle: np.ndarray,
                          left_boundary, right_boundary,
                          required_clearance: float,
                          half_width: float) -> float | None:
    """Pick the detour side with enough road: +1 (left) / -1 (right).

    Measures the free room from the path point nearest the obstacle to
    each road edge; prefers a side that fits the full swerve
    (clearance + vehicle half-width), else the roomier side.  Returns None
    when edges are unavailable (caller falls back to the obstacle-offset
    heuristic).
    """
    if left_boundary is None or right_boundary is None:
        return None
    lb = np.asarray(left_boundary, float)
    rb = np.asarray(right_boundary, float)
    if len(lb) < 2 or len(rb) < 2:
        return None
    i0 = find_closest_point(path, obstacle)
    p = path[i0]
    room_left = point_polyline_distance(p, lb)
    room_right = point_polyline_distance(p, rb)
    need = required_clearance + half_width + 0.2
    if room_left >= need and room_left >= room_right:
        return 1.0
    if room_right >= need:
        return -1.0
    return 1.0 if room_left >= room_right else -1.0


def lateral_detour(polyline: np.ndarray, obstacle: np.ndarray,
                   required_clearance: float, side: float | None = None,
                   entry: float = 25.0, exit_dist: float = 15.0
                   ) -> np.ndarray:
    """Bend a reference path laterally around a near-head-on obstacle.

    A local NMPC solver cannot break the symmetry of an obstacle sitting ON
    the reference line (zero-gradient saddle); this host-side pre-pass adds
    a smooth lateral offset bump so the solver starts in the avoidance
    basin — the hard constraints still enforce the true clearance.  No-op
    when the obstacle already clears the path laterally.

    side: +1 bends left of the travel direction, -1 right; default picks
    the side opposite the obstacle's (tiny) lateral offset, left on a tie.
    The reference has no analog: its configured scenarios offset the
    obstacle ~1.2 m from the path, which seeds the basin implicitly.
    """
    path = np.asarray(polyline, dtype=float)
    obstacle = np.asarray(obstacle, dtype=float)
    s = compute_pathlength_from_polyline(path)
    i0 = find_closest_point(path, obstacle)
    lo, hi = max(i0 - 1, 0), min(i0 + 1, len(path) - 1)
    tang = path[hi] - path[lo]
    norm = np.hypot(*tang)
    if norm < 1e-9:
        return path
    tang = tang / norm
    normal = np.array([-tang[1], tang[0]])  # left of travel
    clearance = float((obstacle - path[i0]) @ normal)
    if abs(clearance) >= required_clearance:
        return path
    if side is None:
        side = -np.sign(clearance) if abs(clearance) > 1e-6 else 1.0
    target = clearance + side * required_clearance
    s0 = s[i0]
    rise = _smoothstep01((s - (s0 - entry)) / max(entry * 0.7, 1e-6))
    fall = 1.0 - _smoothstep01((s - (s0 + exit_dist * 0.3))
                               / max(exit_dist * 0.7, 1e-6))
    bump = target * rise * fall  # (n,)
    # offset each vertex along its own left normal
    ori = compute_orientation_from_polyline(path)
    normals = np.stack([-np.sin(ori), np.cos(ori)], axis=1)
    return path + bump[:, None] * normals


def _smoothstep01(t: np.ndarray) -> np.ndarray:
    t = np.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
