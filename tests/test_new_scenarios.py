"""The reference's shipped-but-unconfigured scenarios, configured.

The reference ships six CommonRoad XMLs but only configures three
(SURVEY.md §2.1 scenario row: USA_Peach-2_1_T-1, ZAM_Tutorial-1_2_T-1 and
ZAM_Tutorial_Urban-3_2 are "present, unconfigured").  Each gets a config
here, exercising capabilities the original three never touch:

  * ZAM_Tutorial-1_2_T-1 — planning problem with NO goalState at all:
    successor-chain route fallback + YAML ``time_step_limit``.
  * ZAM_Tutorial_Urban-3_2 — obstacle DEAD AHEAD on the centerline (a
    symmetric saddle for local solvers): ``reference_detour`` pre-pass;
    dt = 0.25; same-direction neighbor lane (generalized road-edge
    selection — the reference's lanelets[0/1].right_vertices rule would
    call the lane divider a road edge).
  * USA_Peach-2_1_T-1 — 74-lanelet intersection network, ego starts at
    rest; progress windowing + curvature speed profile re-time the route
    to 215 steps.
"""
import os

import numpy as np
import pytest

from mpc_tpu.io.config import load_config
from mpc_tpu.planner import closed_loop as cl

from asset_paths import CFG, GOLD, SCN  # noqa: F401


def _dist_to_path(points, path, step=0.25):
    """Min distance of each point to the (densified) path polyline."""
    seg = np.diff(path, axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    n = np.maximum((lens / step).astype(int), 1)
    dense = np.concatenate(
        [np.linspace(path[i], path[i + 1], n[i], endpoint=False)
         for i in range(len(seg))] + [path[-1:]])
    return np.linalg.norm(points[:, None] - dense[None], axis=-1).min(-1)


def _run(config_name):
    c = load_config(os.path.join(CFG, config_name), SCN)
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    return c, cl.closed_loop_jit(lcfg, params)


def test_tutorial_highway_goalless():
    c, res = _run("config_LF_ZAM_Tutorial-1_2_T-1.yaml")
    X = np.asarray(res.X)
    assert X.shape[0] == c.iter_length
    assert (np.asarray(res.status) >= 0).all()
    # tracks its (successor-chain) reference path (densify the polyline:
    # vertices are spaced v_des*dt ~ 4 m apart, so vertex distance alone
    # overestimates cross-track error)
    d = _dist_to_path(X[:, :2], c.reference_path)
    assert float(d.max()) < 1.0


def test_tutorial_urban_head_on_obstacle():
    from mpc_tpu.utils import native

    c, res = _run("config_CA_ZAM_Tutorial_Urban-3_2.yaml")
    assert c.delta_t == 0.25
    X = np.asarray(res.X, dtype=float)
    obs = np.array([c.static_obstacle["position_x"],
                    c.static_obstacle["position_y"]])
    # detour carries the ego around the dead-ahead car with full clearance
    dmin = float(np.min(np.linalg.norm(X[:, :2] - obs, axis=1)))
    assert dmin > 1.9
    hit = native.traj_obstacle_collision(
        X, c.vehicle.l, c.vehicle.w, obs,
        c.static_obstacle["length"], c.static_obstacle["width"],
        c.static_obstacle["orientation"])
    assert hit < 0
    # stays on the road (generalized road edges: the same-direction
    # neighbor lane is road, its divider is not an edge)
    hl = native.traj_boundary_collision(X, c.vehicle.l, c.vehicle.w,
                                        c.left_road_boundary)
    assert hl < 0


def test_peach_intersection_from_rest():
    """USA_Peach: rest start + 90-deg urban corners through a 74-lanelet
    intersection network.

    Exercises progress windowing + the curvature speed profile (without
    them the ego either never moves — the schedule outruns a rest start —
    or overshoots the first corner and deadlocks against the v >= 0
    bound) under the forcespro-mode IP solver: the full 215-step route
    completes within ~1 m of the path everywhere and reaches the goal."""
    c, res = _run("config_LF_USA_Peach-2_1_T-1.yaml")
    X = np.asarray(res.X)
    assert X.shape[0] == c.iter_length
    assert abs(X[0, 3]) < 1e-6  # starts at rest
    assert (np.asarray(res.status) >= 0).all()
    d = _dist_to_path(X[:, :2], c.reference_path)
    assert float(d.max()) < 1.5
    # reaches the goal point at the end of the run
    goal_dist = np.linalg.norm(X[:, :2] - c.reference_path[-1], axis=1)
    assert float(goal_dist.min()) < 2.0
    # the speed profile actually limits corner speed: slower through the
    # first corner than the cruise v_des
    assert float(X[10:40, 3].max()) < 0.75 * c.desired_velocity


def test_detour_noop_when_obstacle_clears_path():
    """The detour pre-pass must not perturb paths that already clear the
    obstacle (parity configs keep their exact reference paths)."""
    from mpc_tpu.utils.geometry import lateral_detour

    path = np.stack([np.linspace(0, 100, 101), np.zeros(101)], axis=1)
    out = lateral_detour(path, np.array([50.0, 5.0]),
                         required_clearance=3.0)
    np.testing.assert_array_equal(out, path)
    bent = lateral_detour(path, np.array([50.0, 0.1]),
                          required_clearance=3.0)
    assert abs(bent[:, 1]).max() > 2.0
    # endpoints pinned
    np.testing.assert_allclose(bent[0], path[0], atol=1e-9)
    np.testing.assert_allclose(bent[-1], path[-1], atol=1e-6)


def test_tutorial_urban_all_steps_feasible():
    """N=12 (warmup engaged) keeps the whole Urban run violation-free."""
    c, res = _run("config_CA_ZAM_Tutorial_Urban-3_2.yaml")
    assert (np.asarray(res.status) >= 0).all()
    assert float(np.asarray(res.viol).max()) < 0.05


def test_synthetic_curve_scenario_ships_clean():
    """Shipped synthetic curved-road CA scenario (scenarios/SYN_Curve-1.xml).

    Self-contained (no reference checkout): curvature 0.008 arc, static
    obstacle at mid-arc, reference_detour + progress windowing + curvature
    speed profile.  Every step must be feasible and the swept trajectory
    collision-free.
    """
    from mpc_tpu.utils import native

    c = load_config(os.path.join("configs", "config_CA_SYN_Curve-1.yaml"),
                    "scenarios")
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    res = cl.closed_loop_jit(lcfg, params)
    status = np.asarray(res.status)
    assert (status >= 0).all(), np.nonzero(status < 0)[0]
    X = np.asarray(res.X)
    ob = c.static_obstacle
    hit = native.traj_obstacle_collision(
        X, c.vehicle.l, c.vehicle.w,
        (ob["position_x"], ob["position_y"]), ob["length"], ob["width"],
        ob["orientation"])
    assert hit == -1
    # obstacle is ON the original centerline: the planner must actually
    # have deviated around it, not sailed through a hole in the check
    d_obs = np.hypot(X[:, 0] - ob["position_x"], X[:, 1] - ob["position_y"])
    assert 2.0 < d_obs.min() < 8.0
