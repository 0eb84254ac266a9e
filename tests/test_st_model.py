"""Single-track (ST) model family end-to-end.

The reference defines ``ST_casadi`` (7 states, tire dynamics,
``configuration.py:370-398``) but never wires it to a planner — only KS is
solved (``optimizer.py:98, 536``).  Here ST is a first-class model family:
the same AL / IP solvers, the lanes-trailing vec path, and the closed loop
all accept ``model='st'``.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_tpu.models import dynamics as dyn
from mpc_tpu.models.costs import Weights
from mpc_tpu.models.vehicle import VEHICLE_2
from mpc_tpu.ops import sqp
from mpc_tpu.ops import sqp_vec

WEIGHTS = {
    "weight_x": 2.3, "weight_y": 2.3, "weight_steering_angle": 500.0,
    "weight_velocity": 0.1, "weight_heading_angle": 160.0,
    "weight_velocity_steering_angle": 0.8, "weight_long_acceleration": 0.8,
    "weight_x_terminate": 80.0, "weight_y_terminate": 80.0,
    "weight_steering_angle_terminate": 100.0,
    "weight_velocity_terminate": 0.01,
    "weight_heading_angle_terminate": 110.0}


def _lane_ocp(H=10, v=15.0, dt=0.1, y0=0.5, dtype=jnp.float32):
    ts = np.arange(H + 1) * dt
    x_ref = jnp.asarray(np.stack(
        [30.0 + v * ts, 0 * ts, 0 * ts, np.full_like(ts, v), 0 * ts], 1),
        dtype)
    return sqp.OcpParams(
        x0=jnp.asarray([30.0, y0, 0.0, v, 0.0], dtype),
        x_ref=x_ref,
        obs_centers=jnp.asarray(
            [[-100.0, 0.0], [-100.0, 0.0], [-100.0, 0.0]], dtype),
        min_dist=jnp.asarray(3.3, dtype),
        weights=Weights.from_dict(WEIGHTS, dtype))


def test_st_ode_consistency_with_ks_at_kinematic_state():
    """At a kinematically-consistent state and gentle inputs, the ST
    low-speed branch reduces exactly to KS-cog; at speed the first five
    high-speed derivatives agree with KS for beta ~ 0."""
    x5 = jnp.asarray([10.0, 2.0, 0.05, 0.05, 0.2])  # v = 0.05 < 0.1: low
    u = jnp.asarray([0.01, 0.3])
    x7 = dyn.ks_to_st_state(x5, VEHICLE_2.wheelbase, VEHICLE_2.b)
    f = dyn.st_ode(x7, u, VEHICLE_2)
    # low-speed branch: positions advance along beta_kin + psi
    beta_kin = float(jnp.arctan(jnp.tan(x5[2]) * VEHICLE_2.b
                                / VEHICLE_2.wheelbase))
    assert np.isclose(float(f[0]),
                      0.05 * np.cos(beta_kin + 0.2), atol=1e-6)
    assert np.isclose(float(f[2]), 0.01, atol=1e-7)
    assert np.isclose(float(f[3]), 0.3, atol=1e-7)


def test_st_state_lift():
    x5 = jnp.asarray([0.0, 0.0, 0.1, 20.0, 0.0])
    x7 = dyn.ks_to_st_state(x5, VEHICLE_2.wheelbase, VEHICLE_2.b)
    assert x7.shape == (7,)
    psi_dot = 20.0 * np.tan(0.1) / VEHICLE_2.wheelbase
    assert np.isclose(float(x7[5]), psi_dot, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x7[:5]), np.asarray(x5))


@pytest.mark.parametrize("method", ["al", "ip"])
def test_st_solve_tracks_lane(method):
    """Open-loop ST solve pulls a laterally-offset start back to the lane."""
    cfg = sqp.SolverConfig(horizon=10, model="st", vehicle=VEHICLE_2,
                           method=method)
    params = _lane_ocp()
    sol = jax.jit(lambda p, s: sqp.solve(cfg, p, s))(
        params, sqp.init_state(cfg))
    X = np.asarray(sol.X)
    assert X.shape == (11, 7)
    assert int(sol.status) >= 0
    assert float(sol.viol) < 1e-2
    # lateral error decreases monotonically-ish and ends < half the start
    assert abs(X[-1, 1]) < 0.5 * abs(X[0, 1])
    # ST extra states stay physical
    assert np.all(np.abs(X[:, 6]) < 0.2)  # slip angle < ~11 deg


def test_st_vec_path_matches_vmapped_solver():
    """The lanes-trailing hot path produces the vmapped solver's iterates
    for the ST model too (same fixed iteration structure)."""
    cfg = sqp.SolverConfig(horizon=8, model="st", vehicle=VEHICLE_2,
                           sqp_iters=2, al_iters=2)
    B = 4
    key = jax.random.PRNGKey(0)
    base = _lane_ocp(H=8)
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), base)
    pert = jax.random.normal(key, (B, 5), jnp.float32) * jnp.asarray(
        [0.3, 0.2, 0.0, 0.3, 0.01])
    params = params._replace(x0=params.x0 + pert)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    ref = sqp.solve_batch(cfg, params, state)
    vec = sqp_vec.solve_batch_vec_jit(cfg, params, state)
    np.testing.assert_allclose(np.asarray(vec.X), np.asarray(ref.X),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vec.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)


def test_st_closed_loop_synthetic():
    """Closed-loop ST run on the synthetic overtake track: feasible steps,
    bounded tracking error, obstacle cleared."""
    from mpc_tpu.planner import closed_loop as cl
    from mpc_tpu.utils import synthetic

    lcfg, params = synthetic.make_bench_loop(
        n_steps=12, horizon=10, n_lanes=2, method="al",
        model="st", vehicle=VEHICLE_2)
    assert params.x_init.shape == (2, 7)
    res = cl.closed_loop_batch_vec(lcfg, params)
    X = np.asarray(res.X)
    assert X.shape == (2, 12, 7)
    assert np.all(np.asarray(res.status) >= 0)
    # tracks the overtake line: lateral deviation from the reference path
    # stays bounded (looser than KS — the ST yaw/slip dynamics genuinely lag
    # the swerve, which is the point of modeling them)
    path = np.asarray(params.track.path[0])  # (T+H+1, 2)
    for lane in range(2):
        for t in range(12):
            d = np.min(np.linalg.norm(path - X[lane, t, :2], axis=1))
            assert d < 1.5, (lane, t, d)


def test_st_closed_loop_from_yaml_config():
    """`dynamics_model: st` flows from the YAML layer through the loop."""
    import os
    from mpc_tpu.io.config import load_config
    from mpc_tpu.planner import closed_loop as cl

    from asset_paths import CFG, GOLD, SCN

    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    c = type(c)(**{**c.__dict__, "dynamics_model": "st"})
    # mu0=30: the ST plant brakes later than KS at the frozen end-of-path
    # window, activating the CasADi-parity friction row (|a^2 + ...| <=
    # a_max binds at |a| ~ 3.4); the stiffer initial AL penalty keeps the
    # active row within tolerance
    lcfg = cl.make_loop_config(c, noised=False, mu0=30.0)
    assert lcfg.solver.model == "st"
    assert lcfg.solver.vehicle is not None
    params = cl.make_loop_params(c, lcfg)
    assert params.x_init.shape == (7,)
    res = cl.closed_loop_jit(lcfg, params)
    X = np.asarray(res.X)
    assert X.shape == (c.iter_length, 7)
    assert np.all(np.asarray(res.status) >= 0)
    # KS-golden comparison: at 20 m/s on the straight ZAM road the ST and
    # KS trajectories stay close (tire dynamics matter little here)
    g = np.loadtxt(os.path.join(
        GOLD, "2D_plots_casadi_ZAM_Over-1_1_lane_following",
        "planned states.txt"))
    dev = np.abs(X[:, :2] - g[:, :2]).max()
    assert dev < 1.0
