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
