"""Functional tests of the AL-SQP solver on small NMPC instances."""

import numpy as np
import jax.numpy as jnp
import jax

from mpc_tpu.models import costs as CO
from mpc_tpu.ops import sqp

W_LF = CO.Weights.from_dict({
    "weight_x": 2.3, "weight_y": 2.3, "weight_steering_angle": 500.0,
    "weight_velocity": 0.1, "weight_heading_angle": 10.0,
    "weight_velocity_steering_angle": 2.0, "weight_long_acceleration": 0.2,
    "weight_x_terminate": 80.0, "weight_y_terminate": 80.0,
    "weight_steering_angle_terminate": 100.0, "weight_velocity_terminate": 0.1,
    "weight_heading_angle_terminate": 100.0})


def straight_params(H, v=20.0, dt=0.1):
    """Reference: drive straight along +x at constant speed.

    Row k targets X_k exactly (x = v*dt*k), so u == 0 is the true optimum.
    """
    x0 = jnp.array([0.0, 0.0, 0.0, v, 0.0])
    ts = jnp.arange(0, H + 1, dtype=jnp.float32)
    x_ref = jnp.stack([
        v * dt * ts, jnp.zeros(H + 1), jnp.zeros(H + 1),
        jnp.full((H + 1,), v), jnp.zeros(H + 1)], axis=1)
    return sqp.OcpParams(
        x0=x0, x_ref=x_ref,
        obs_centers=jnp.array([[-100.0, 0.0]] * 3),
        min_dist=jnp.asarray(1.2),  # r_ego + 0 (dummy obstacle)
        weights=W_LF)


def test_straight_line_tracking():
    cfg = sqp.SolverConfig(horizon=10)
    params = straight_params(10)
    sol = sqp.solve(cfg, params, sqp.init_state(cfg))
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    # the exact optimum is u=0 everywhere (reference already satisfies the
    # dynamics from x0)
    assert np.abs(U).max() < 1e-2
    np.testing.assert_allclose(X[:, 1], 0.0, atol=1e-3)  # stays on the line
    assert int(sol.status) >= 0
    assert float(sol.viol) < 1e-3


def test_accelerate_to_reach_ahead_reference():
    # reference path is faster than x0 velocity -> solver must accelerate
    cfg = sqp.SolverConfig(horizon=10)
    params = straight_params(10, v=20.0)
    params = params._replace(x0=params.x0.at[3].set(15.0))
    sol = sqp.solve(cfg, params, sqp.init_state(cfg))
    U = np.asarray(sol.U)
    assert U[0, 1] > 0.5  # strong initial acceleration
    assert U[:, 1].max() <= 11.5 + 1e-2  # a_max box respected


def test_velocity_lower_bound_active():
    # reference demands stopping far behind -> decelerate but v >= 0.
    # stress case: the state bound binds hard against a large tracking
    # gradient, needing extra outer AL updates beyond the defaults
    cfg = sqp.SolverConfig(horizon=10, al_iters=5)
    H = 10
    x0 = jnp.array([0.0, 0.0, 0.0, 2.0, 0.0])
    x_ref = jnp.stack([
        jnp.zeros(H + 1) - 5.0, jnp.zeros(H + 1), jnp.zeros(H + 1),
        jnp.zeros(H + 1), jnp.zeros(H + 1)], axis=1)
    params = sqp.OcpParams(x0=x0, x_ref=x_ref,
                           obs_centers=jnp.array([[-100.0, 0.0]] * 3),
                           min_dist=jnp.asarray(1.2), weights=W_LF)
    sol = sqp.solve(cfg, params, sqp.init_state(cfg))
    X = np.asarray(sol.X)
    assert X[:, 3].min() > -1e-2  # v >= 0 (lbx, reference optimizer.py:484)


def test_obstacle_avoidance_pushes_laterally():
    H = 20
    cfg = sqp.SolverConfig(horizon=H)
    v = 10.0
    dt = 0.1
    ts = jnp.arange(0, H + 1, dtype=jnp.float32)
    # reference path grazes an obstacle sitting slightly below the path
    # (a perfectly symmetric head-on obstacle is a zero-gradient saddle for
    # ANY gradient-based solver; real scenarios are asymmetric, e.g. the ZAM
    # overtaking goal sits in the adjacent lane)
    x_ref = jnp.stack([v * dt * ts, jnp.zeros(H + 1), jnp.zeros(H + 1),
                       jnp.full((H + 1,), v), jnp.zeros(H + 1)], axis=1)
    params = sqp.OcpParams(
        x0=jnp.array([0.0, 0.0, 0.0, v, 0.0]),
        x_ref=x_ref,
        obs_centers=jnp.array([[12.0, -0.6], [13.0, -0.6], [11.0, -0.6]]),
        min_dist=jnp.asarray(2.0),
        weights=W_LF)
    sol = sqp.solve(cfg, params, sqp.init_state(cfg))
    X = np.asarray(sol.X)
    # trajectory must clear the obstacle circles by ~min_dist
    d = np.min(np.linalg.norm(
        X[:, None, :2] - np.asarray(params.obs_centers)[None], axis=-1))
    assert d > 1.8  # soft-slack AL: small residual violation allowed
    assert X[:, 1].max() > 0.5  # swerves up (away from the obstacle)
    assert float(sol.viol) < 0.2


def test_casadi_formulation_runs():
    cfg = sqp.SolverConfig(horizon=10, integrator="euler",
                           formulation="casadi", use_terminal_cost=False)
    params = straight_params(10)
    sol = sqp.solve(cfg, params, sqp.init_state(cfg))
    assert np.abs(np.asarray(sol.U)).max() < 5e-2
    assert float(sol.viol) < 1e-3


def test_batched_solve_matches_single():
    cfg = sqp.SolverConfig(horizon=10)
    p1 = straight_params(10)
    p2 = straight_params(10, v=15.0)
    batch = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    states = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        sqp.init_state(cfg), sqp.init_state(cfg))
    sols = sqp.solve_batch(cfg, batch, states)
    s1 = sqp.solve(cfg, p1, sqp.init_state(cfg))
    np.testing.assert_allclose(np.asarray(sols.U[0]), np.asarray(s1.U),
                               rtol=1e-4, atol=1e-5)


def test_warm_start_improves_kkt():
    cfg = sqp.SolverConfig(horizon=10)
    params = straight_params(10, v=15.0)
    params = params._replace(x0=params.x0.at[3].set(12.0))
    cold = sqp.solve(cfg, params, sqp.init_state(cfg))
    warm = sqp.solve(cfg, params, cold.state)
    assert float(warm.kkt_stat) <= float(cold.kkt_stat) * 1.5 + 1e-3
    np.testing.assert_allclose(np.asarray(warm.U), np.asarray(cold.U),
                               atol=5e-2)
