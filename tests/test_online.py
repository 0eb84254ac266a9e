"""Streaming online planner (serving-style per-step API)."""
import os

import numpy as np
import pytest

from mpc_tpu.io.config import load_config
from mpc_tpu.models import dynamics as dyn
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.planner.online import OnlinePlanner

from asset_paths import CFG, GOLD, SCN  # noqa: F401

def test_online_matches_offline_closed_loop():
    """Driving the online planner with the SAME plant the offline loop uses
    must reproduce the offline trajectory."""
    c = load_config(os.path.join(CFG,
                                 "config_LF_ZAM_Over-1_1.yaml"),
                    SCN)
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    offline = cl.closed_loop_jit(lcfg, params)

    planner = OnlinePlanner(c)
    plant = dyn.make_step_fn(lcfg.plant_integrator, lcfg.solver.dt,
                             lcfg.solver.wheelbase)
    x = np.asarray(params.x_init)
    X, U = [], []
    for _ in range(10):
        u, info = planner.step(x)
        assert info.status >= 0
        X.append(x.copy())
        U.append(u)
        x = np.asarray(plant(x, u))
    np.testing.assert_allclose(np.asarray(X), np.asarray(offline.X)[:10],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(U), np.asarray(offline.U)[:10],
                               rtol=1e-3, atol=1e-3)


def test_online_handles_disturbed_measurements():
    """External disturbances (measured state != predicted state) keep the
    warm-started solver feasible — the deployment property the offline
    loops never exercise."""
    c = load_config(os.path.join(CFG,
                                 "config_CA_ZAM_Over-1_1.yaml"),
                    SCN)
    planner = OnlinePlanner(c)
    lcfg = planner.lcfg
    plant = dyn.make_step_fn(lcfg.plant_integrator, lcfg.solver.dt,
                             lcfg.solver.wheelbase)
    rng = np.random.default_rng(0)
    x = np.asarray(planner.params.x_init)
    for t in range(15):
        u, info = planner.step(x)
        assert info.status >= 0, t
        x = np.array(plant(x, u))
        x[:2] += rng.normal(0, 0.05, 2)  # position disturbance
    # reset() restarts cleanly
    planner.reset()
    u, info = planner.step(np.asarray(planner.params.x_init))
    assert info.status >= 0


def test_batched_online_matches_batch_vec():
    """The serving chain (closed_loop_batch_step fed its own predicted
    states) must reproduce closed_loop_batch_vec exactly: same engine,
    same warmup, same noise stream."""
    import jax
    import jax.numpy as jnp

    from mpc_tpu.utils import synthetic

    B, T, H = 4, 6, 9
    lcfg, params = synthetic.make_bench_loop(
        n_steps=T, horizon=H, n_lanes=B, method="al",
        al_iters=2, sqp_iters=2)
    ref = cl.closed_loop_batch_vec(lcfg, params)

    carry = cl.init_batch_carry(lcfg, params)
    xs, us, sts = [], [], []
    for _ in range(T):
        carry, (x, u, status, viol, cost, stat) = cl.closed_loop_batch_step(
            lcfg, params, carry)
        xs.append(np.asarray(x))
        us.append(np.asarray(u))
        sts.append(np.asarray(status))
    np.testing.assert_allclose(np.stack(xs, 1), np.asarray(ref.X),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.stack(us, 1), np.asarray(ref.U),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.stack(sts, 1), np.asarray(ref.status))


def test_batched_online_planner_fleet():
    """BatchedOnlinePlanner: a fleet on the ZAM LF scenario with per-lane
    measured-state disturbances keeps every lane feasible and tracking."""
    import jax.numpy as jnp

    from mpc_tpu.planner.online import BatchedOnlinePlanner

    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    c = type(c)(**{**c.__dict__, "framework": "forcespro"})
    B = 3
    fleet = BatchedOnlinePlanner(c, n_lanes=B, ip_sqp_iters=2, ip_iters=6,
                                 ip_warm_duals=True)
    rng = np.random.default_rng(3)
    x = np.asarray(fleet.params.x_init)
    from mpc_tpu.models import dynamics as dyn_mod
    step = dyn_mod.make_step_fn("rk4", fleet.lcfg.solver.dt,
                                fleet.lcfg.solver.wheelbase)
    for k in range(8):
        u, info = fleet.step(x)
        assert u.shape == (B, 2)
        assert (info.status >= 0).all(), (k, info.status)
        # external plant: RK4 + per-lane measurement disturbance
        x = np.stack([np.asarray(step(jnp.asarray(x[i]), jnp.asarray(u[i])))
                      for i in range(B)])
        x[:, :2] += rng.normal(0, 0.02, (B, 2))
    ref_path = c.reference_path
    # every lane still near the reference line after 8 disturbed steps
    for i in range(B):
        d = np.min(np.linalg.norm(ref_path - x[i, :2], axis=1))
        assert d < 1.0, (i, d)


def test_batched_online_heterogeneous_fleet():
    """BatchedOnlinePlanner.from_scenarios: one ZAM lane + one USA lane
    served in the same compiled batch, each tracking its own reference."""
    import jax.numpy as jnp

    from mpc_tpu.models import dynamics as dyn_mod
    from mpc_tpu.planner.online import BatchedOnlinePlanner

    cz = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    cu = load_config(os.path.join(CFG, "config_LF_USA_Lanker-2_18_T-1.yaml"),
                     SCN)
    cz = type(cz)(**{**cz.__dict__, "framework": "forcespro"})
    cu = type(cu)(**{**cu.__dict__, "framework": "forcespro"})
    fleet = BatchedOnlinePlanner.from_scenarios(
        [cz, cu], ip_sqp_iters=2, ip_iters=6, ip_warm_duals=True)
    assert fleet.n_lanes == 2
    x = np.asarray(fleet.params.x_init)
    step = dyn_mod.make_step_fn("rk4", fleet.lcfg.solver.dt,
                                fleet.lcfg.solver.wheelbase)
    for k in range(6):
        u, info = fleet.step(x)
        assert (info.status >= 0).all(), (k, info.status)
        x = np.stack([np.asarray(step(jnp.asarray(x[i]), jnp.asarray(u[i])))
                      for i in range(2)])
    # each lane advanced along ITS OWN reference path
    for i, c in enumerate([cz, cu]):
        ref = c.reference_path
        d = np.min(np.linalg.norm(ref - x[i, :2], axis=1))
        assert d < 1.0, (i, d)
    # and the lanes genuinely went different places (heterogeneous batch)
    assert np.linalg.norm(x[0, :2] - x[1, :2]) > 10.0
