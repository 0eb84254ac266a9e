"""Multi-scenario batched planning (``parallel.multi``).

The reference plans one scenario per process (the user edits a constant,
``test_mpc_planner.py:16``); here ZAM and USA run in ONE device batch and
each lane must reproduce its single-scenario closed loop.
"""
import os

import numpy as np
import pytest

from mpc_tpu.io.config import load_config
from mpc_tpu.parallel import multi
from mpc_tpu.planner import closed_loop as cl

from asset_paths import CFG, GOLD, SCN  # noqa: F401


def test_mixed_scenarios_match_single_runs():
    zam = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    usa = load_config(os.path.join(CFG, "config_LF_USA_Lanker-2_18_T-1.yaml"),
                      SCN)
    res, lens = multi.plan_multi([zam, usa], noised=False)
    assert lens == [30, 70]
    X = np.asarray(res.X)
    assert X.shape[0] == 2 and X.shape[1] == 70

    for i, c in enumerate((zam, usa)):
        lcfg = cl.make_loop_config(c, noised=False)
        params = cl.make_loop_params(c, lcfg)
        single = np.asarray(cl.closed_loop_jit(lcfg, params).X)
        batched = X[i, :lens[i]]
        # same formulation, same data; fp-order differences only — compare
        # at a tolerance the chaotic tail cannot exceed over LF scenarios
        dev = np.abs(batched[:, :2] - single[:, :2]).max()
        assert dev < 0.05, (c.scenario_name, dev)
        assert (np.asarray(res.status)[i, :lens[i]] >= 0).all()


def test_short_lane_brakes_toward_frozen_target_after_its_end():
    """Past a lane's own iter_length its window freezes at the path end
    (reference ``optimizer.py:670-683`` semantics): the lane brakes toward
    the frozen target rather than chasing a moving reference.  (The casadi
    formulation has no terminal-stop: the vehicle coasts while braking,
    exactly as the reference would if its loop ran longer.)"""
    zam = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    usa = load_config(os.path.join(CFG, "config_LF_USA_Lanker-2_18_T-1.yaml"),
                      SCN)
    res, lens = multi.plan_multi([zam, usa], noised=False)
    X = np.asarray(res.X)
    v_tail = X[0, lens[0]:, 3]
    # monotone deceleration throughout the tail, well below cruise speed
    assert np.all(np.diff(v_tail) < 0.05)
    assert v_tail[-1] < 0.5 * zam.desired_velocity


def test_mixed_framework_rejected():
    import dataclasses
    zam = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    other = dataclasses.replace(zam, framework="forcespro")
    with pytest.raises(ValueError, match="mixed frameworks"):
        multi.make_multi_scenario_batch([zam, other])


def test_heterogeneous_boundary_batch():
    """A boundary-constrained CA scenario batches with an unconstrained LF
    scenario: the whole batch compiles with boundary rows, unconstrained
    lanes get far-away dummy polylines (inactive rows), and each lane
    reproduces its own single-scenario run."""
    import dataclasses
    ca = load_config(
        os.path.join(CFG, "config_CA_ZAM_Over-1_1_forcespro.yaml"), SCN)
    assert ca.boundary_constraints
    lf = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    lf = dataclasses.replace(lf, framework="forcespro")  # batch needs one fw

    lcfg, params, lens = multi.make_multi_scenario_batch(
        [ca, lf], noised=False)
    assert lcfg.solver.boundary_rows
    assert params.boundaries.shape[0] == 2  # lanes
    # lane 1 (unconstrained) carries the far-away dummy polylines
    assert float(np.abs(np.asarray(params.boundaries)[1][..., 1]).min()) > 1e5

    res = cl.closed_loop_batch(lcfg, params)
    X = np.asarray(res.X)
    assert (np.asarray(res.status) >= 0).all()
    for i, c in enumerate((ca, lf)):
        single_lcfg = cl.make_loop_config(
            c, horizon=lcfg.solver.horizon + 1, noised=False,
            boundary_rows=True)
        sp = cl.make_loop_params(c, single_lcfg)
        if not c.boundary_constraints:
            import jax.numpy as jnp
            dummy_b, dummy_s = cl.dummy_boundaries(jnp.float32)
            sp = sp._replace(boundaries=dummy_b, boundary_signs=dummy_s)
        single = np.asarray(cl.closed_loop_jit(single_lcfg, sp).X)
        # vmapped-batch vs single-lane compilation: fp-order differences
        # only, same band as test_mixed_scenarios_match_single_runs
        dev = np.abs(X[i, :lens[i], :2] - single[:, :2]).max()
        assert dev < 0.05, (c.scenario_name, dev)


def test_mixed_moving_static_obstacle_batch():
    """A moving-obstacle lane batches with a static-obstacle lane: the
    static lane rides the per-stage obstacle path with a constant track."""
    import dataclasses
    ca = load_config(os.path.join(CFG, "config_CA_ZAM_Over-1_1.yaml"), SCN)
    traj = np.stack([
        np.linspace(ca.static_obstacle["position_x"],
                    ca.static_obstacle["position_x"] + 15.0, 40),
        np.full(40, ca.static_obstacle["position_y"]),
        np.zeros(40)], 1)
    moving = dataclasses.replace(ca, obstacle_trajectory=traj)

    lcfg, params, lens = multi.make_multi_scenario_batch(
        [moving, ca], noised=False)
    need = lcfg.n_steps + lcfg.solver.horizon + 2
    assert params.obs_track.shape == (2, need, 3, 2)
    # static lane's track is constant
    ot = np.asarray(params.obs_track)
    assert np.ptp(ot[1], axis=0).max() == 0.0
    assert np.ptp(ot[0, :, 0, 0]) > 10.0  # moving lane actually moves

    res = cl.closed_loop_batch(lcfg, params)
    X = np.asarray(res.X)
    assert np.isfinite(X).all()
    assert (np.asarray(res.status) >= 0).all()
    # the static lane matches its plain single-scenario run
    single_lcfg = cl.make_loop_config(ca, noised=False)
    single = np.asarray(cl.closed_loop_jit(
        single_lcfg, cl.make_loop_params(ca, single_lcfg)).X)
    dev = np.abs(X[1, :, :2] - single[:, :2]).max()
    assert dev < 0.05
