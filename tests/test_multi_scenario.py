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

REF = "/root/reference"
CFG = os.path.join(REF, "test/config_files")
SCN = os.path.join(REF, "scenarios")

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference checkout not available")


@needs_ref
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


@needs_ref
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


@needs_ref
def test_mixed_framework_rejected():
    import dataclasses
    zam = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    other = dataclasses.replace(zam, framework="forcespro")
    with pytest.raises(ValueError, match="mixed frameworks"):
        multi.make_multi_scenario_batch([zam, other])
