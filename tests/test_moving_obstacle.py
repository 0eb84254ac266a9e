"""Moving-obstacle tracking (capability beyond the reference, which freezes
dynamic obstacles at their initial state — configuration.py:472-476)."""
import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.models.costs import Weights
from mpc_tpu.ops import sqp
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils.synthetic import ZAM_LIKE_WEIGHTS


def test_per_stage_obstacle_centers_in_solver():
    """(H+1, 3, 2) obs_centers: the solver must dodge where the obstacle
    WILL be, not where it is now."""
    H = 20
    v, dt = 10.0, 0.1
    ts = np.arange(H + 1) * dt
    x_ref = jnp.asarray(np.stack(
        [v * dt * np.arange(H + 1), np.zeros(H + 1), np.zeros(H + 1),
         np.full(H + 1, v), np.zeros(H + 1)], 1), jnp.float32)
    w = Weights.from_dict(ZAM_LIKE_WEIGHTS)

    # obstacle crosses the lane from the side: at stage m it sits at
    # x=12 (reached by ego around stage 12), crossing y=0 exactly then
    ys = np.linspace(-4.0, 2.7, H + 1)
    centers = np.stack([np.stack([np.full(H + 1, 12.0), ys], 1)] * 3, 1)
    params_moving = sqp.OcpParams(
        x0=jnp.asarray([0.0, 0.0, 0.0, v, 0.0], jnp.float32),
        x_ref=x_ref,
        obs_centers=jnp.asarray(centers, jnp.float32),  # (H+1, 3, 2)
        min_dist=jnp.asarray(2.0, jnp.float32), weights=w)
    # same obstacle frozen at its INITIAL position (y=-6, far from the lane)
    params_frozen = params_moving._replace(
        obs_centers=jnp.asarray(centers[0], jnp.float32))

    cfg = sqp.SolverConfig(horizon=H)
    sol_m = sqp.solve(cfg, params_moving, sqp.init_state(cfg))
    sol_f = sqp.solve(cfg, params_frozen, sqp.init_state(cfg))
    Xm, Xf = np.asarray(sol_m.X), np.asarray(sol_f.X)
    # frozen: obstacle at y=-4 never matters -> straight line
    assert np.abs(Xf[:, 1]).max() < 0.2
    # moving: around stage ~12 the obstacle reaches the lane -> must dodge
    d_at = np.linalg.norm(Xm[12, :2] - centers[12, 0])
    assert d_at > 1.8
    assert np.abs(Xm[:, 1]).max() > 0.5  # it actually moved laterally


def test_obstacle_track_windowing_in_loop(tmp_path):
    """Closed loop slices the obstacle track per step (config pipeline)."""
    import dataclasses
    from mpc_tpu.io.config import build_config
    from mpc_tpu.io.scenario import load_scenario
    import subprocess, sys, os
    out = tmp_path / "SYN_Dyn-1.xml"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "tools/make_scenario.py", "--out", str(out),
         "--length", "100", "--obstacle", "0.5", "--v0", "15"],
        check=True, capture_output=True, env=env, cwd=root, timeout=120)
    s = load_scenario(str(out))
    settings = {
        "scenario_settings": {"scenario_name": "SYN_Dyn-1",
                              "use_case": "collision_avoidance"},
        "general_planning_settings": {
            "framework_name": "casadi", "predict_horizon": 10,
            "noised": False, "track_dynamic_obstacle": True},
        "vehicle_settings": {1: {
            "reference_point": "rear",
            "vehicle_model": "parameters_vehicle2", "wheelbase": 2.578,
            "resampling_reference_path": True}},
        "weights_setting": ZAM_LIKE_WEIGHTS,
    }
    c = build_config(settings, s)
    # the generated obstacle is static (no trajectory), so tracking falls
    # back to None; fabricate a trajectory to exercise the loop plumbing
    traj = np.stack([
        np.linspace(c.static_obstacle["position_x"],
                    c.static_obstacle["position_x"] + 10.0, 40),
        np.full(40, c.static_obstacle["position_y"]),
        np.zeros(40)], 1)
    c = dataclasses.replace(c, obstacle_trajectory=traj)
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    assert params.obs_track is not None
    assert params.obs_track.shape == (
        c.iter_length + lcfg.solver.horizon + 2, 3, 2)
    res = cl.closed_loop_jit(lcfg, params)
    X = np.asarray(res.X)
    assert X.shape[0] == c.iter_length
    assert np.isfinite(X).all()


def test_obstacle_track_respected_by_batched_vec_loop():
    """closed_loop_batch_vec must window the moving-obstacle track per step
    (it silently froze obstacles before round 2).

    The obstacle vacates the lane laterally over the run: a track-aware
    planner sails nearly straight (the blocker is gone when the ego
    arrives), a frozen-obstacle planner swerves.  Also checks vec==vmapped
    on a short, non-chaotic prefix.
    """
    import dataclasses
    from mpc_tpu.io.config import load_config
    from asset_paths import CFG, SCN

    c = load_config(f"{CFG}/config_CA_ZAM_Over-1_1.yaml", SCN)
    ox = c.static_obstacle["position_x"]
    oy = c.static_obstacle["position_y"]
    traj = np.stack([
        np.full(40, ox),
        np.concatenate([np.linspace(oy, oy + 12.0, 10),
                        np.full(30, oy + 12.0)]),
        np.zeros(40)], 1)
    c = dataclasses.replace(c, obstacle_trajectory=traj)
    lcfg = cl.make_loop_config(c, noised=False, method="al")
    params = cl.make_loop_params(c, lcfg)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (2,) + x.shape)
        if x is not None else None, params, is_leaf=lambda x: x is None)
    res_vec = cl.closed_loop_batch_vec(lcfg, batched)
    # vec matches the vmapped loop before chaotic amplification sets in
    res_ref = cl.closed_loop_batch(lcfg, batched)
    dev10 = np.abs(np.asarray(res_vec.X)[:, :10]
                   - np.asarray(res_ref.X)[:, :10]).max()
    assert dev10 < 0.05, dev10
    # track-aware: obstacle has cleared the lane by arrival -> no swerve
    y_moving = np.abs(np.asarray(res_vec.X)[0, :, 1]
                      - np.asarray(params.track.path)[:lcfg.n_steps, 1])
    frozen = batched._replace(obs_track=None)
    res_frozen = cl.closed_loop_batch_vec(lcfg, frozen)
    y_frozen = np.abs(np.asarray(res_frozen.X)[0, :, 1]
                      - np.asarray(params.track.path)[:lcfg.n_steps, 1])
    assert y_moving.max() < 0.5 * y_frozen.max() + 0.1, (
        y_moving.max(), y_frozen.max())
