"""Fused Pallas whole-solve kernel vs the vmapped/vec reference solvers.

Runs the kernel in interpret mode on CPU (the suite backend); the compiled
path is exercised by the TPU bench (tools/fused_ablation.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.ops import fused_gn, sqp, sqp_vec
from tests.test_sqp import W_LF, straight_params


def _batchify(params, n, key=0):
    from mpc_tpu.parallel import batch as pb
    b = pb.replicate_ocp(params, n)
    return pb.perturb_x0(b, jax.random.PRNGKey(key),
                         jnp.asarray([0.5, 0.2, 0.0, 0.5, 0.02],
                                     jnp.float32))


@pytest.mark.parametrize("formulation,integrator", [
    ("forcespro", "rk4"),
    ("casadi", "euler"),
])
def test_fused_matches_reference_solver(formulation, integrator):
    H, B = 12, 4
    cfg = sqp.SolverConfig(horizon=H, formulation=formulation,
                           integrator=integrator,
                           use_terminal_cost=(formulation == "forcespro"),
                           sqp_iters=2, al_iters=2)
    p = straight_params(H, v=16.0)
    p = p._replace(x0=p.x0.at[3].set(14.0),
                   obs_centers=jnp.array([[10.0, -1.6]] * 3))
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))

    ref = sqp.solve_batch(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)

    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.X), np.asarray(ref.X),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=1e-3, atol=1e-2)
    # warm-start state fields carry over
    np.testing.assert_allclose(np.asarray(got.state.mu),
                               np.asarray(ref.state.mu), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.state.lam_lo),
                               np.asarray(ref.state.lam_lo),
                               rtol=2e-2, atol=2e-2)


def test_fused_kkt_and_status_semantics():
    """The in-kernel adjoint stationarity matches the AD-based residual."""
    H, B = 10, 2
    cfg = sqp.SolverConfig(horizon=H)
    p = straight_params(H, v=15.0)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    ref = sqp_vec.solve_batch_vec(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.kkt_stat),
                               np.asarray(ref.kkt_stat),
                               rtol=5e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(ref.status))


def test_fused_warm_start_improves():
    """Re-solving from the returned state keeps improving (RTI contract)."""
    H, B = 10, 2
    cfg = sqp.SolverConfig(horizon=H, sqp_iters=2, al_iters=2)
    p = straight_params(H, v=15.0)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    s1 = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    s2 = fused_gn.solve_batch_fused(cfg, params, s1.state, interpret=True)
    assert float(jnp.max(s2.kkt_stat)) <= float(jnp.max(s1.kkt_stat)) + 1e-5


@pytest.mark.parametrize("B", [1, 5])
def test_fused_padded_lanes_are_benign(B):
    """B not a multiple of the 1024-lane tile: padded lanes must not poison
    the real lanes (benign v=1/unit-weight pad problem, fused_gn pad_rows).
    Real-lane outputs must be finite and match the XLA path."""
    H = 8
    cfg = sqp.SolverConfig(horizon=H, sqp_iters=2, al_iters=2)
    p = straight_params(H, v=15.0)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    ref = sqp_vec.solve_batch_vec(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    for leaf in jax.tree.leaves(got._replace(state=None)):
        assert np.all(np.isfinite(np.asarray(leaf, np.float64)))
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)


def test_fused_moving_obstacle_matches_reference():
    """(B, H+1, 3, 2) per-stage obstacle centers ride the kernel's moving
    mode and must match the vmapped solver (VERDICT r2 item 5)."""
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, sqp_iters=2, al_iters=2)
    p = straight_params(H, v=14.0)
    # obstacle drifting across the horizon
    ts = jnp.arange(H + 1, dtype=jnp.float32)[:, None, None]
    obs0 = jnp.array([[11.0, -1.8]] * 3)
    obs_track = obs0[None] + ts * jnp.array([0.3, 0.05])
    p = p._replace(obs_centers=obs_track)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert fused_gn.eligible(cfg, params)
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)


def _straight_corridor(dtype=jnp.float32, y_left=2.5, y_right=-4.0):
    """Two straight boundary lines (left above, right below), inside-positive
    signs — signed distance to a straight line is AFFINE, so the kernels'
    per-stage linearization is exact and parity with the XLA path is tight.
    """
    n = 64
    xs = np.linspace(1e3, -1e3, n)
    left = np.stack([xs, np.full(n, y_left)], 1)
    right = np.stack([-xs, np.full(n, y_right)], 1)
    return (jnp.asarray(np.stack([left, right]), dtype),
            jnp.ones((2,), dtype))


def test_fused_boundary_rows_match_reference():
    """Active road-boundary rows through the kernel's linearized path must
    match the vmapped solver's exact polyline rows (VERDICT r2 item 5).
    The reference ships this constraint set commented out
    (optimizer.py:113-161); here it is first-class on the fast engine."""
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, sqp_iters=2, al_iters=2,
                           boundary_rows=True)
    p = straight_params(H, v=14.0)
    # reference line hugs the left edge -> boundary row activates
    p = p._replace(x_ref=p.x_ref.at[:, 1].set(1.8),
                   obs_centers=jnp.full((3, 2), -1e4))
    bnds, signs = _straight_corridor()
    p = p._replace(boundaries=bnds, boundary_signs=signs)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert fused_gn.eligible(cfg, params)
    ref = sqp_vec.solve_batch_vec(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
    # the boundary row genuinely binds: lateral position pulled below the
    # reference toward the feasible side
    assert float(jnp.max(got.X[..., 1])) < 1.6


def test_fused_fallback_on_ineligible():
    """Boundary rows / ip method fall back to the vec path transparently."""
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip")
    p = straight_params(H)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert not fused_gn.eligible(cfg, params)
    sol = fused_gn.solve_batch_fused(cfg, params, state)
    assert sol.U.shape == (B, H, 2)


def test_fused_unguarded_rti_matches_reference():
    """``alphas=()`` (unguarded full RTI step, the reference deployment's
    maxqps=1 semantics — step applied with NO merit test,
    ``/root/reference/MPC_Planner/optimizer.py:237, 326-342``) agrees
    across the fused kernel, the lanes-trailing vec path, and the vmapped
    per-lane reference path."""
    H, B = 12, 4
    cfg = sqp.SolverConfig(horizon=H, sqp_iters=2, al_iters=2, alphas=())
    p = straight_params(H, v=16.0)
    p = p._replace(x0=p.x0.at[3].set(14.0),
                   obs_centers=jnp.array([[10.0, -1.6]] * 3))
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))

    ref = sqp.solve_batch(cfg, params, state)
    vec = sqp_vec.solve_batch_vec(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)

    for other in (vec, got):
        np.testing.assert_allclose(np.asarray(other.U), np.asarray(ref.U),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(other.X), np.asarray(ref.X),
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(other.viol),
                                   np.asarray(ref.viol), atol=1e-3)
