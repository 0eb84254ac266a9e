"""End-to-end closed-loop parity vs the reference's committed goldens.

Golden trajectories under ``/root/reference/test/2D_plots_*`` were produced
with ``noised: True`` (SURVEY.md §6 caveat), so comparisons are tolerance
bands around deterministic runs, not bit-exact (SURVEY.md §4b).
"""
import os

import numpy as np
import pytest

from mpc_tpu.io.config import load_config
from mpc_tpu.planner import closed_loop as cl

from asset_paths import CFG, GOLD, SCN  # noqa: F401


def _run(config_name):
    c = load_config(os.path.join(CFG, config_name), SCN)
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    res = cl.closed_loop_jit(lcfg, params)
    return c, res


def _golden(dirname):
    return np.loadtxt(os.path.join(GOLD, dirname, "planned states.txt"))


def test_zam_lf_casadi_parity():
    c, res = _run("config_LF_ZAM_Over-1_1.yaml")
    X = np.asarray(res.X)
    g = _golden("2D_plots_casadi_ZAM_Over-1_1_lane_following")
    assert X.shape == g.shape == (30, 5)
    # deterministic run vs noised golden (sigma=0.1 on inputs)
    dev = np.abs(X - g).max(axis=0)
    assert dev[0] < 0.3 and dev[1] < 0.4          # position
    assert dev[3] < 0.3                           # velocity
    # headline metric parity (golden RMSD 0.2589 / 0.0996, mpc_planner.py:279)
    ref = c.reference_path
    rmsd_x = np.sqrt(np.sum((ref[:, 0] - X[:, 0]) ** 2) / (len(X) - 1))
    rmsd_y = np.sqrt(np.sum((ref[:, 1] - X[:, 1]) ** 2) / (len(X) - 1))
    assert rmsd_x < 0.4 and rmsd_y < 0.2
    assert (np.asarray(res.status) >= 0).all()
    assert float(np.asarray(res.viol).max()) < 1e-2


def test_zam_ca_casadi_parity():
    c, res = _run("config_CA_ZAM_Over-1_1.yaml")
    X = np.asarray(res.X)
    g = _golden("2D_plots_casadi_ZAM_Over-1_1_collision_avoidance")
    dev = np.abs(X - g).max(axis=0)
    assert dev[0] < 0.8 and dev[1] < 0.8
    # obstacle clearance: golden clears the obstacle center by 3.46 m
    obs = np.array([c.static_obstacle["position_x"],
                    c.static_obstacle["position_y"]])
    dmin = np.min(np.linalg.norm(X[:, :2] - obs, axis=1))
    assert dmin > 3.2
    assert (np.asarray(res.status) >= 0).all()


def test_usa_lf_casadi_parity():
    c, res = _run("config_LF_USA_Lanker-2_18_T-1.yaml")
    X = np.asarray(res.X)
    g = _golden("2D_plots_casadi_USA_Lanker-2_18_T-1_lane_following")
    assert X.shape == g.shape == (70, 5)
    dev = np.abs(X - g).max(axis=0)
    assert dev[0] < 0.8 and dev[1] < 0.8
    ref = c.reference_path
    rmsd_x = np.sqrt(np.sum((ref[:, 0] - X[:, 0]) ** 2) / (len(X) - 1))
    rmsd_y = np.sqrt(np.sum((ref[:, 1] - X[:, 1]) ** 2) / (len(X) - 1))
    # golden RMSD: 0.4065 / 0.1670
    assert rmsd_x < 0.6 and rmsd_y < 0.3
    assert (np.asarray(res.status) >= 0).all()


def test_zam_lf_forcespro_mode():
    """FORCESPRO-parity mode (RK4 plant, ramped v_des, terminal cost)."""
    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    c = type(c)(**{**c.__dict__, "framework": "forcespro"})
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    res = cl.closed_loop_jit(lcfg, params)
    X = np.asarray(res.X)
    g = _golden("2D_plots_forcespro_ZAM_Over-1_1_lane_following")
    assert X.shape == g.shape
    # forcespro goldens are noisier (RMSD_x 1.84 with noise); band is loose
    dev = np.abs(X - g).max(axis=0)
    assert dev[1] < 1.2  # lateral
    # deceleration ramp engages: final velocity well below v_des
    assert X[-1, 3] < c.desired_velocity - 2.0
    assert (np.asarray(res.status) >= 0).all()


def test_zam_ca_forcespro_parity():
    """FORCESPRO CA at the reference's exact operating point (N=10,
    forcespro CA weight set — the commented block in the reference's
    config_CA_ZAM_Over-1_1.yaml) vs its committed golden."""
    c, res = _run("config_CA_ZAM_Over-1_1_forcespro_ref.yaml")
    X = np.asarray(res.X)
    g = _golden("2D_plots_forcespro_ZAM_Over-1_1_collision_avoidance")
    assert X.shape == g.shape == (30, 5)
    dev = np.abs(X - g).max(axis=0)
    # noised golden + different inner solver (BFGS-SQP vs IP-RTI): our
    # deterministic run brakes earlier and swerves wider mid-overtake, so
    # the pointwise bands are loose; the hard guarantees (clearance,
    # feasibility) are asserted tight below
    assert dev[1] < 3.5   # lateral: stays within the road's width of golden
    assert np.abs(X[-1] - g[-1])[:2].max() < 2.0  # reconverges by the end
    obs = np.array([c.static_obstacle["position_x"],
                    c.static_obstacle["position_y"]])
    dmin = np.min(np.linalg.norm(X[:, :2] - obs, axis=1))
    assert dmin > 3.3     # golden clears by 3.95
    assert (np.asarray(res.status) >= 0).all()  # every step feasible
    assert float(np.asarray(res.viol).max()) < 0.05


def test_usa_lf_forcespro_parity():
    """FORCESPRO LF on the urban curved scenario vs its committed golden
    (70 steps; golden RMSD 0.48/0.60 m at noised sigma=0.1)."""
    c = load_config(os.path.join(CFG, "config_LF_USA_Lanker-2_18_T-1.yaml"),
                    SCN)
    c = type(c)(**{**c.__dict__, "framework": "forcespro"})
    lcfg = cl.make_loop_config(c, noised=False)
    params = cl.make_loop_params(c, lcfg)
    res = cl.closed_loop_jit(lcfg, params)
    X = np.asarray(res.X)
    g = _golden("2D_plots_forcespro_USA_Lanker-2_18_T-1_lane_following")
    assert X.shape == g.shape == (70, 5)
    dev = np.abs(X - g).max(axis=0)
    assert dev[0] < 2.0 and dev[1] < 2.0  # position vs noised golden
    ref = c.reference_path
    rmsd_x = np.sqrt(np.sum((ref[:, 0] - X[:, 0]) ** 2) / (len(X) - 1))
    rmsd_y = np.sqrt(np.sum((ref[:, 1] - X[:, 1]) ** 2) / (len(X) - 1))
    # golden RMSD: 0.4813 / 0.6010 (with noise); deterministic must not be
    # materially worse
    assert rmsd_x < 0.7 and rmsd_y < 0.8
    assert (np.asarray(res.status) >= 0).all()


def test_noise_reproducibility():
    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    lcfg = cl.make_loop_config(c, noised=True)
    assert lcfg.noise_std == 0.1  # lane-following sigma, optimizer.py:350
    p1 = cl.make_loop_params(c, lcfg, seed=7)
    p2 = cl.make_loop_params(c, lcfg, seed=7)
    r1 = cl.closed_loop_jit(lcfg, p1)
    r2 = cl.closed_loop_jit(lcfg, p2)
    np.testing.assert_array_equal(np.asarray(r1.X), np.asarray(r2.X))
    p3 = cl.make_loop_params(c, lcfg, seed=8)
    r3 = cl.closed_loop_jit(lcfg, p3)
    assert np.abs(np.asarray(r1.X) - np.asarray(r3.X)).max() > 1e-4


def test_boundary_constraints_keep_vehicle_on_road():
    """Optional road-boundary rows (reference ships them commented out,
    optimizer.py:113-161): the forcespro-mode CA overtake must stay inside
    the road with them enabled."""
    from mpc_tpu.utils import native
    c = load_config(os.path.join(CFG, "config_CA_ZAM_Over-1_1_forcespro.yaml"), SCN)
    assert c.boundary_constraints
    lcfg = cl.make_loop_config(c, noised=False)
    assert lcfg.solver.boundary_rows
    params = cl.make_loop_params(c, lcfg)
    assert params.boundaries.shape[0] == 2
    res = cl.closed_loop_jit(lcfg, params)
    X = np.asarray(res.X, dtype=float)
    hit_l = native.traj_boundary_collision(X, c.vehicle.l, c.vehicle.w,
                                           c.left_road_boundary)
    hit_r = native.traj_boundary_collision(X, c.vehicle.l, c.vehicle.w,
                                           c.right_road_boundary)
    assert hit_l < 0 and hit_r < 0  # no boundary crossing
    # still clears the obstacle
    obs = np.array([c.static_obstacle["position_x"],
                    c.static_obstacle["position_y"]])
    assert np.min(np.linalg.norm(X[:, :2] - obs, axis=1)) > 3.2


@pytest.mark.parametrize("config_name,tag,framework", [
    ("config_LF_ZAM_Over-1_1.yaml", "zam_lf_casadi", None),
    ("config_CA_ZAM_Over-1_1.yaml", "zam_ca_casadi", None),
    ("config_LF_USA_Lanker-2_18_T-1.yaml", "usa_lf_casadi", None),
    ("config_LF_ZAM_Over-1_1.yaml", "zam_lf_forcespro", "forcespro"),
    ("config_CA_ZAM_Over-1_1_forcespro_ref.yaml", "zam_ca_forcespro", None),
    ("config_LF_USA_Lanker-2_18_T-1.yaml", "usa_lf_forcespro", "forcespro"),
])
def test_deterministic_regression_goldens(config_name, tag, framework):
    """Our own committed deterministic goldens: catches behavior drift that
    the (noisy) reference-golden tolerance bands would miss.

    Run in float64 (goldens recorded by ``tools/make_goldens.py``): the CA
    loop amplifies rounding noise ~1e6x over 30 steps, so float32 goldens
    would be machine-specific; float64 keeps cross-platform drift ~1e-9,
    letting the tolerance sit far below any formulation change."""
    import jax
    import jax.numpy as jnp

    here = os.path.dirname(os.path.abspath(__file__))
    golden = np.loadtxt(os.path.join(here, "goldens", f"{tag}_states.txt"))
    with jax.enable_x64(True):
        c = load_config(os.path.join(CFG, config_name), SCN)
        if framework is not None:
            c = type(c)(**{**c.__dict__, "framework": framework})
        lcfg = cl.make_loop_config(c, noised=False)
        params = cl.make_loop_params(c, lcfg, dtype=jnp.float64)
        res = cl.closed_loop_jit(lcfg, params)
        X = np.asarray(res.X)
    np.testing.assert_allclose(X, golden, atol=1e-4)


def test_true_rti_one_qp_all_scenarios():
    """The 1-QP deployment recipes (``RTI1_SETTINGS`` LF /
    ``RTI1_CA_SETTINGS`` CA) report status >= 0 on every step of all three
    reference scenarios (VERDICT r2 missing #1: FORCESPRO deploys
    ``maxqps=1`` and asserts every exitflag, optimizer.py:237, 330).

    The CA recipe extends the horizon to 13 transitions (N=14 — affordable
    here at 2.18 ms/step on TPU, still under the reference's 2.35 ms H=9
    budget), warms up the cold start at full strength, and gates the
    APPLIED prefix (gate_stages=1); realized-trajectory safety is then
    asserted directly: obstacle clearance above the true bound and applied
    friction within the true a_max^2 — the two quantities the reference's
    own recorded CA run violates (+27% friction, PARITY.md)."""
    cases = [
        ("config_LF_ZAM_Over-1_1.yaml", cl.RTI1_SETTINGS, False),
        ("config_CA_ZAM_Over-1_1.yaml", cl.RTI1_CA_SETTINGS, True),
        ("config_LF_USA_Lanker-2_18_T-1.yaml", cl.RTI1_SETTINGS, False),
    ]
    for name, settings, is_ca in cases:
        c = load_config(os.path.join(CFG, name), SCN)
        c = type(c)(**{**c.__dict__, "framework": "forcespro"})
        lcfg = cl.make_loop_config(c, noised=False, **settings)
        params = cl.make_loop_params(c, lcfg)
        res = cl.closed_loop_jit(lcfg, params)
        st = np.asarray(res.status)
        assert (st >= 0).all(), (name, st.min(), np.where(st < 0)[0])
        if name == "config_LF_ZAM_Over-1_1.yaml":
            # tracking stays reference-grade at the 1-QP budget
            X = np.asarray(res.X)
            ref = c.reference_path
            rmsd_y = np.sqrt(np.sum((ref[:len(X), 1] - X[:, 1]) ** 2)
                             / (len(X) - 1))
            assert rmsd_y < 0.3
            assert float(np.asarray(res.viol).max()) < \
                lcfg.solver.tol_infeas
        if is_ca:
            X, U = np.asarray(res.X), np.asarray(res.U)
            obs = np.array([c.static_obstacle["position_x"],
                            c.static_obstacle["position_y"]])
            dmin = float(np.linalg.norm(X[:, :2] - obs, axis=1).min())
            assert dmin > float(params.min_dist), (name, dmin)
            # realized (applied) friction within the TRUE bound:
            # a^2 + (v^2 tan(delta) / wheelbase)^2 <= a_max^2  (+2% tol)
            wb = lcfg.solver.wheelbase
            fr = U[:, 1] ** 2 + (X[:, 3] ** 2 * np.tan(X[:, 2]) / wb) ** 2
            assert fr.max() <= lcfg.solver.a_max ** 2 * 1.02, fr.max()


def test_steady_state_warm_solves_report_converged():
    """status==1 must carry information at production budgets (VERDICT r2
    weak #1): warm steady-state solves on the benign LF track report
    converged for a majority of steps in BOTH methods, at the calibrated
    tolerances (tools/calibrate_status.py, STATUS_CALIB.json)."""
    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    # casadi formulation -> AL method (production default)
    lcfg = cl.make_loop_config(c, noised=False)
    res = cl.closed_loop_jit(lcfg, cl.make_loop_params(c, lcfg))
    warm = np.asarray(res.status)[5:]
    assert (warm == 1).mean() >= 0.4, warm
    # forcespro formulation -> IP method
    cf = type(c)(**{**c.__dict__, "framework": "forcespro"})
    lcfg_ip = cl.make_loop_config(cf, noised=False)
    res_ip = cl.closed_loop_jit(lcfg_ip, cl.make_loop_params(cf, lcfg_ip))
    warm_ip = np.asarray(res_ip.status)[5:]
    assert (warm_ip == 1).mean() >= 0.5, warm_ip
    # and the distinction is real: not every step converges
    assert (np.asarray(res.status) == 1).mean() < 1.0 or \
        (np.asarray(res_ip.status) == 1).mean() < 1.0


def test_gate_stages_status_semantics():
    """_gated_status re-derives the feasibility half of status from the
    TRUE problem over the gated prefix: a prefix-clean tail violation
    upgrades -7 -> 0, a prefix violation downgrades to -7 regardless of
    the solver's own (possibly tightened-problem) report."""
    import types

    from mpc_tpu.ops import sqp
    from tests.test_sqp import straight_params

    H = 6
    scfg = sqp.SolverConfig(horizon=H)
    p = straight_params(H, v=10.0)
    p = p._replace(obs_centers=jnp_arr([[3.0, 0.0]] * 3))
    # feasible straight plan (stays on y=0, obstacle rows violated: the
    # path drives THROUGH the obstacle at x=3)
    U = np.zeros((H, 2), np.float32)
    X = np.stack([np.linspace(0, 6, H + 1), np.zeros(H + 1),
                  np.zeros(H + 1), np.full(H + 1, 10.0),
                  np.zeros(H + 1)], 1).astype(np.float32)
    sol = types.SimpleNamespace(X=jnp_arr(X), U=jnp_arr(U),
                                status=jnp_arr(0, np.int32))
    # stage 0 (x=0) is ~3 m from the obstacle center = at the bound edge;
    # use min_dist small so prefix is clean, tail (x≈3) violates
    p_clean_prefix = p._replace(min_dist=jnp_arr(1.0, np.float32))
    from mpc_tpu.planner.closed_loop import _gated_status
    st = _gated_status(scfg, p_clean_prefix,
                       types.SimpleNamespace(X=sol.X, U=sol.U,
                                             status=jnp_arr(-7, np.int32)),
                       1)
    assert int(st) == 0  # tail-only violation upgrades under prefix gate
    # prefix itself violating (huge min_dist) must report -7 even though
    # the solver said 0
    p_bad_prefix = p._replace(min_dist=jnp_arr(50.0, np.float32))
    st2 = _gated_status(scfg, p_bad_prefix, sol, 1)
    assert int(st2) == -7


def jnp_arr(x, dtype=None):
    import jax.numpy as jnp
    return jnp.asarray(x, dtype)


def test_rti_backoff_semantics():
    """rti_margin / rti_amax_scale contract (round-4 code-review fix): the
    SOLVER sees the tightened problem, while status is re-derived from the
    TRUE problem — a plan inside the backoff band must NOT report -7.

    Mechanism-level (deterministic): the behavioral CA sweeps live in the
    RTI recipe tests; chaotic swerve-commitment sensitivity makes a
    full-loop backoff assertion flaky across backends.
    """
    import dataclasses
    import types

    from mpc_tpu.ops import sqp
    from mpc_tpu.planner.closed_loop import (_step_status, _tighten_ocp,
                                             _tightened_solver_cfg)
    from tests.test_sqp import straight_params

    H = 6
    c = load_config(os.path.join(CFG, "config_LF_ZAM_Over-1_1.yaml"), SCN)
    lcfg = cl.make_loop_config(c, noised=False, rti_margin=0.4,
                               rti_amax_scale=0.9)
    # plumbing: knobs land on the LoopConfig, not the SolverConfig
    assert lcfg.rti_margin == 0.4 and lcfg.rti_amax_scale == 0.9
    scfg_t = _tightened_solver_cfg(lcfg)
    assert scfg_t.a_max == pytest.approx(lcfg.solver.a_max * 0.9)

    p = straight_params(H, v=10.0)
    p = p._replace(obs_centers=jnp_arr([[5.0, -4.0]] * 3, np.float32),
                   min_dist=jnp_arr(3.0, np.float32))
    lcfg6 = dataclasses.replace(lcfg, solver=dataclasses.replace(
        lcfg.solver, horizon=H))
    ocp_t = _tighten_ocp(lcfg6, p)
    assert float(ocp_t.min_dist) == pytest.approx(3.4)

    # plan passes the obstacle at ~3.2 m: violates the TIGHTENED bound
    # (3.4) but satisfies the TRUE one (3.0 + ego offsets...) — craft
    # clearance between the two bounds exactly: distance to centers ~4 >
    # 3.4?  Use y=0 path, obstacle at (5, -3.2): center distance at x=5 is
    # 3.2 in [3.0, 3.4).
    p2 = p._replace(obs_centers=jnp_arr([[5.0, -3.2]] * 3, np.float32))
    lcfg2 = dataclasses.replace(lcfg6)
    U = np.zeros((H, 2), np.float32)
    X = np.stack([np.linspace(0, 6, H + 1), np.zeros(H + 1),
                  np.zeros(H + 1), np.full(H + 1, 10.0),
                  np.zeros(H + 1)], 1).astype(np.float32)
    # the tightened solver would report -7 (its bound is 3.4)
    sol = types.SimpleNamespace(X=jnp_arr(X), U=jnp_arr(U),
                                status=jnp_arr(-7, np.int32))
    st = _step_status(lcfg2, lcfg2.solver, p2, sol)
    assert int(st) == 0  # true bound (3.0 circle clearance) holds

    # and a genuinely true-violating plan stays -7
    p3 = p._replace(obs_centers=jnp_arr([[5.0, -1.0]] * 3, np.float32))
    st2 = _step_status(lcfg2, lcfg2.solver, p3, sol)
    assert int(st2) == -7
