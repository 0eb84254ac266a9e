"""Unit tests for the model layer: dynamics, costs, constraints, geometry.

Float64 NumPy oracles per the test strategy in SURVEY.md §4c; parity targets
cite the reference formulation (reference/MPC_Planner/*.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mpc_tpu.models import dynamics as D
from mpc_tpu.models import costs as CO
from mpc_tpu.models import constraints as C
from mpc_tpu.models.vehicle import get_vehicle
from mpc_tpu.utils import geometry as G

WB = 2.578


def test_vehicle2_bounds():
    # values the reference reads at optimizer.py:37-46
    p = get_vehicle("parameters_vehicle2")
    assert p.steering.min == -1.066 and p.steering.max == 1.066
    assert p.steering.v_min == -0.4 and p.steering.v_max == 0.4
    assert p.longitudinal.v_max == 50.8 and p.longitudinal.a_max == 11.5
    assert abs(p.wheelbase - 2.578) < 1e-3
    assert p.l == 4.508 and p.w == 1.610


def test_ks_ode_matches_reference_formula():
    # configuration.py:364-368: [v cos psi, v sin psi, u0, u1, v/l tan delta]
    x = jnp.array([1.0, 2.0, 0.1, 10.0, 0.3])
    u = jnp.array([0.05, 1.5])
    f = np.asarray(D.ks_ode(x, u, WB))
    expected = np.array([
        10.0 * np.cos(0.3), 10.0 * np.sin(0.3), 0.05, 1.5,
        10.0 / WB * np.tan(0.1)])
    np.testing.assert_allclose(f, expected, rtol=1e-6)


def test_rk4_euler_convergence():
    # RK4 with one big step should be much closer to a fine-Euler reference
    x = jnp.array([0.0, 0.0, 0.2, 15.0, 0.1])
    u = jnp.array([0.1, 2.0])
    dt = 0.1

    def ode_np(s):
        return np.array([s[3] * np.cos(s[4]), s[3] * np.sin(s[4]), 0.1, 2.0,
                         s[3] / WB * np.tan(s[2])])

    fine = np.asarray(x, dtype=np.float64)
    for _ in range(1000):
        fine = fine + dt / 1000 * ode_np(fine)
    rk4 = np.asarray(D.rk4_step(x, u, dt, WB))
    eul = np.asarray(D.euler_step(x, u, dt, WB))
    assert np.linalg.norm(rk4 - fine) < 1e-4
    assert np.linalg.norm(rk4 - fine) < np.linalg.norm(eul - fine)


def test_linearize_step_matches_fd():
    step = D.make_step_fn("rk4", 0.1, WB)
    x = jnp.array([1.0, -2.0, 0.15, 12.0, 0.4])
    u = jnp.array([-0.1, 3.0])
    A, B, c = D.linearize_step(step, x, u)
    eps = 1e-2  # large FD step: float32 roundoff dominates below this
    for i in range(5):
        dx = jnp.zeros(5).at[i].set(eps)
        fd = (step(x + dx, u) - step(x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A[:, i]), np.asarray(fd),
                                   atol=5e-3)
    for i in range(2):
        du = jnp.zeros(2).at[i].set(eps)
        fd = (step(x, u + du) - step(x, u - du)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(B[:, i]), np.asarray(fd),
                                   atol=5e-3)


def test_circle_approximation_values():
    # vehicle2 rectangle 4.508 x 1.610 -> r=1.2, spacing 3.0
    # (round-up quirk of configuration.py:40-66)
    r, d = C.approx_circle_radius(4.508, 1.610)
    assert r == pytest.approx(1.2) and d == 3.0
    # ZAM obstacle 6 x 3.5 -> r=2.1, spacing 4.0
    r, d = C.approx_circle_radius(6.0, 3.5)
    assert r == 2.1 and d == 4.0
    # degenerate dummy obstacle (lane following, configuration.py:479-483)
    r, d = C.approx_circle_radius(0.0, 0.0)
    assert r == 0.0 and d == 0.0


def test_circle_centers_match_reference_form():
    # configuration.py:83-91: centers at +-(disc_distance/2)/2 along heading
    cc = np.asarray(C.circle_centers(
        jnp.array(10.0), jnp.array(5.0), 4.508, 1.610, jnp.array(0.5)))
    d = 3.0 / 2 / 2  # disc_distance=3.0 -> distance_centers=1.5 -> half=0.75
    np.testing.assert_allclose(cc[0], [10.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(
        cc[1], [10.0 + d * np.cos(0.5), 5.0 + d * np.sin(0.5)], rtol=1e-6)
    np.testing.assert_allclose(
        cc[2], [10.0 - d * np.cos(0.5), 5.0 - d * np.sin(0.5)], rtol=1e-6)


def test_stage_cost_matches_reference_weighted_squares():
    w = CO.Weights.from_dict({
        "weight_x": 2.3, "weight_y": 2.3, "weight_steering_angle": 500.0,
        "weight_velocity": 0.1, "weight_heading_angle": 10.0,
        "weight_velocity_steering_angle": 2.0, "weight_long_acceleration": 0.2,
        "weight_x_terminate": 80.0, "weight_y_terminate": 80.0,
        "weight_steering_angle_terminate": 100.0,
        "weight_velocity_terminate": 0.1,
        "weight_heading_angle_terminate": 100.0})
    x = jnp.array([1.0, 2.0, 0.1, 20.0, 0.3])
    xr = jnp.array([1.5, 1.0, 0.0, 19.0, 0.2])
    u = jnp.array([0.05, 1.0])
    got = float(CO.stage_cost(x, u, xr, w))
    # optimizer.py:173-179 expanded by hand
    want = (2.3 * 0.25 + 2.3 * 1.0 + 500 * 0.01 + 0.1 * 1.0 + 10 * 0.01
            + 2 * 0.0025 + 0.2 * 1.0)
    assert abs(got - want) < 1e-4
    gotN = float(CO.terminal_cost(x, xr, w))
    wantN = 80 * 0.25 + 80 * 1.0 + 100 * 0.01 + 0.1 * 1.0 + 100 * 0.01
    assert abs(gotN - wantN) < 1e-3


def test_forcespro_ineq_rows():
    obs = C.ObstacleParams(
        centers=jnp.array([[59.9, 0.1], [61.9, 0.2], [57.9, 0.0]]),
        min_dist=jnp.asarray(3.3))
    x = jnp.array([50.0, 0.0, 0.05, 20.0, 0.0])
    u = jnp.array([0.0, 2.0])
    h, lo, hi = C.stage_ineq_forcespro(x, u, obs, 4.508, 1.610, WB, 11.5)
    assert h.shape == (10,) and lo.shape == (10,) and hi.shape == (10,)
    psi_dot = 20.0 * np.tan(0.05) / WB
    np.testing.assert_allclose(float(h[0]), 4.0 + (20 * psi_dot) ** 2,
                               rtol=1e-5)
    assert float(hi[0]) == pytest.approx(11.5 ** 2)
    # distance rows are kept in sqrt form (identical feasible set to the
    # reference's squared rows d^2 >= r^2 — see constraints.py docstring)
    np.testing.assert_allclose(np.asarray(lo[1:]), 3.3 * np.ones(9))
    # cross-check one pair against hand geometry: ego center at x with
    # psi=0 -> front circle at x+0.75
    ego_front = np.array([50.75, 0.0])
    d_exp = np.linalg.norm(ego_front - np.array([59.9, 0.1]))
    np.testing.assert_allclose(float(h[4]), d_exp, rtol=1e-5)


def test_casadi_ineq_friction_masking():
    obs = C.ObstacleParams(centers=jnp.zeros((3, 2)),
                           min_dist=jnp.asarray(0.0))
    x = jnp.array([50.0, 0.0, 0.3, 20.0, 0.0])
    u = jnp.array([0.0, 2.0])
    h0, _, _ = C.stage_ineq_casadi(x, u, obs, 4.508, 1.610, WB, 11.5,
                                   friction_active=jnp.asarray(True))
    h1, _, _ = C.stage_ineq_casadi(x, u, obs, 4.508, 1.610, WB, 11.5,
                                   friction_active=jnp.asarray(False))
    # optimizer.py:378: |a^2 + v^2 tan(delta)/l|
    want = abs(4.0 + 400.0 * np.tan(0.3) / WB)
    np.testing.assert_allclose(float(h0[0]), want, rtol=1e-5)
    assert float(h1[0]) == 0.0


def test_geometry_resample_and_orientation():
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    assert G.compute_polyline_length(line) == pytest.approx(20.0)
    rs = G.resample_polyline(line, 1.0)
    seg = np.diff(rs, axis=0)
    steps = np.hypot(seg[:, 0], seg[:, 1])
    assert np.all(steps <= 1.0 + 1e-6)
    assert rs.shape[0] >= 20
    theta = G.compute_orientation_from_polyline(line)
    assert theta[0] == pytest.approx(0.0)
    assert theta[-1] == pytest.approx(np.pi / 2)


def test_chaikin_preserves_endpoints():
    line = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]])
    sm = G.chaikins_corner_cutting(line)
    np.testing.assert_allclose(sm[0], line[0])
    np.testing.assert_allclose(sm[-1], line[-1])
    assert sm.shape[0] > line.shape[0]
    # smoothed corner is cut: max y decreases
    assert sm[:, 1].max() < 5.0


def test_arclength_projection():
    path = jnp.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    s = G.arclength_projection_jnp(path, jnp.array([5.0, 3.0]))
    assert float(s) == pytest.approx(5.0, abs=1e-5)
    s2 = G.arclength_projection_jnp(path, jnp.array([11.0, 4.0]))
    assert float(s2) == pytest.approx(14.0, abs=1e-5)
