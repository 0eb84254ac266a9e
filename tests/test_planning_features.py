"""Unit tests for the planning-feature layer (speed profile, road edges,
progress windowing) — the pieces integration-tested by
tests/test_new_scenarios.py."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_tpu.planner import reference as ref_mod

from asset_paths import CFG, GOLD, SCN  # noqa: F401

def _l_track(v=10.0, dt=0.1):
    """Straight 50 m, 90-degree arc (r = 8 m), straight 50 m."""
    s1 = np.stack([np.linspace(0, 50, 51), np.zeros(51)], 1)
    th = np.linspace(-np.pi / 2, 0.0, 26)
    arc = np.stack([50 + 8 * np.cos(th), 8 + 8 * np.sin(th)], 1)[1:]
    s2 = np.stack([np.full(50, 58.0), np.linspace(9, 58, 50)], 1)
    return np.concatenate([s1, arc, s2])


def test_speed_profile_slows_for_the_corner():
    path = _l_track()
    prof = ref_mod.speed_profile(path, v_des=15.0, a_lat_max=4.0,
                                 a_long_max=5.0, wheelbase=2.578,
                                 steer_rate_max=0.4)
    assert prof.shape == (len(path),)
    # straights near cruise, corner at sqrt(a_lat * r) = sqrt(4 * 8) ~ 5.7
    assert prof[:20].min() > 10.0
    assert prof[55:70].min() < 6.5
    assert prof[-10:].min() > 10.0
    # decel/accel limited: no jump exceeds sqrt(v^2 + 2 a ds) between
    # neighboring points
    s = np.concatenate([[0], np.cumsum(np.linalg.norm(
        np.diff(path, axis=0), axis=1))])
    ds = np.diff(s)
    up = np.sqrt(prof[:-1] ** 2 + 2 * 5.0 * ds) + 1e-6
    assert np.all(prof[1:] <= up)


def test_speed_profile_straight_road_is_cruise():
    path = np.stack([np.linspace(0, 100, 101), np.zeros(101)], 1)
    prof = ref_mod.speed_profile(path, v_des=12.0, a_lat_max=4.0,
                                 a_long_max=5.0, wheelbase=2.578,
                                 steer_rate_max=0.4)
    np.testing.assert_allclose(prof, 12.0, atol=1e-6)


def test_build_track_with_profile_and_ramp():
    path = np.stack([np.linspace(0, 30, 31), np.zeros(31)], 1)
    psi = np.zeros(31)
    prof = np.linspace(10.0, 8.0, 31)
    tr = ref_mod.build_track(path, psi, prof, horizon=5, mode="forcespro")
    v = np.asarray(tr.vdes)
    # forcespro ramp caps the last H entries toward 0
    assert v[30] < 1e-6
    np.testing.assert_allclose(v[:26], prof[:26])
    with pytest.raises(ValueError, match="profile has"):
        ref_mod.build_track(path, psi, prof[:-1], horizon=5,
                            mode="forcespro")


def test_progress_index_local_monotone_and_clamped():
    path = np.stack([np.linspace(0, 20, 21), np.zeros(21)], 1)
    tr = ref_mod.build_track(path, np.zeros(21), 10.0, horizon=4,
                             mode="casadi")
    x = jnp.asarray([5.2, 0.3, 0, 10, 0])
    i1 = int(ref_mod.progress_index_local(tr, x, jnp.asarray(0), ahead=16))
    assert i1 == 5
    # never goes backward past prev
    i2 = int(ref_mod.progress_index_local(tr, x, jnp.asarray(8), ahead=16))
    assert i2 >= 8
    # clamped at the true path end even when prev is deep in the padding
    i3 = int(ref_mod.progress_index_local(
        tr, jnp.asarray([100.0, 0, 0, 10, 0]), jnp.asarray(24), ahead=16))
    assert i3 <= int(tr.T)


def test_road_edges_zam_picks_far_edges():
    """On the ZAM two-lane road (oncoming REVERSED neighbor) the selected
    edges must be the outer road edges, reproducing the reference's
    hardcoded choice (configuration.py:432-433)."""
    from mpc_tpu.io.config import load_config

    c = load_config(os.path.join(CFG,
                                 "config_LF_ZAM_Over-1_1.yaml"),
                    SCN)
    from mpc_tpu.io.scenario import load_scenario

    left, right = c.left_road_boundary, c.right_road_boundary
    assert left is not None and right is not None
    # on the reference's own two-lane road the generalized extreme-offset
    # selection must reproduce its hardcoded pick: right = lanelets[0]
    # .right_vertices (ego lane outer edge), left = lanelets[1]
    # .right_vertices (the REVERSED oncoming lane's "right" = far edge)
    s = load_scenario(os.path.join(SCN, "ZAM_Over-1_1_LF.xml"))
    lids = sorted(s.lanelets)
    np.testing.assert_allclose(right, s.lanelets[lids[0]].right_vertices)
    np.testing.assert_allclose(left, s.lanelets[lids[1]].right_vertices)


def test_progress_window_batch_vec_matches_single():
    """The lanes-trailing batched loop carries per-lane progress bases;
    identical lanes must reproduce the single-lane progress run."""
    import dataclasses
    import jax
    from mpc_tpu.io.config import load_config
    from mpc_tpu.planner import closed_loop as cl

    c = load_config(os.path.join(CFG,
                                 "config_LF_ZAM_Over-1_1.yaml"),
                    SCN)
    c = dataclasses.replace(c, progress_window=True)
    lcfg = cl.make_loop_config(c, noised=False)
    assert lcfg.progress_window
    params = cl.make_loop_params(c, lcfg)
    single = cl.closed_loop_jit(lcfg, params)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (2,) + x.shape), params)
    vec = cl.closed_loop_batch_vec(lcfg, batched)
    np.testing.assert_allclose(np.asarray(vec.X[0]), np.asarray(single.X),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vec.X[0]), np.asarray(vec.X[1]))
    assert (np.asarray(vec.status) >= 0).all()
