"""Fused Pallas IP (hard-constrained RTI-SQP) kernel vs the vmapped spec.

``sqp._solve_ip`` + ``ops.ipqp`` is the executable spec; the kernel
(``ops.fused_ip``) must reproduce it.  Interpret mode on CPU; the compiled
path is exercised by the TPU ablation (tools/fused_ablation.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.ops import fused_ip, sqp
from tests.test_sqp import straight_params


def _batchify(params, n, key=0):
    from mpc_tpu.parallel import batch as pb
    b = pb.replicate_ocp(params, n)
    return pb.perturb_x0(b, jax.random.PRNGKey(key),
                         jnp.asarray([0.5, 0.2, 0.0, 0.5, 0.02],
                                     jnp.float32))


def _obstacle_params(H, v=14.0):
    p = straight_params(H, v=v)
    return p._replace(x0=p.x0.at[3].set(v),
                      obs_centers=jnp.array([[12.0, -1.6]] * 3))


@pytest.mark.parametrize("warm", [False, True])
def test_fused_ip_matches_reference_solver(warm):
    H, B = 9, 4
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=2,
                           ip_iters=6, ip_warm_duals=warm)
    params = _batchify(_obstacle_params(H), B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))

    ref = sqp.solve_batch(cfg, params, state)
    got = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)

    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.X), np.asarray(ref.X),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.kkt_stat),
                               np.asarray(ref.kkt_stat),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(ref.status))
    # carried duals match (warm-start contract across MPC steps)
    np.testing.assert_allclose(np.asarray(got.state.lam_hi),
                               np.asarray(ref.state.lam_hi),
                               rtol=5e-2, atol=5e-2)


def test_fused_ip_warm_restart_consistency():
    """Warm re-solve through the kernel matches the XLA warm re-solve."""
    H, B = 9, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=1,
                           ip_iters=6, ip_warm_duals=True)
    params = _batchify(_obstacle_params(H), B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    r1 = sqp.solve_batch(cfg, params, state)
    g1 = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)
    r2 = sqp.solve_batch(cfg, params, r1.state)
    g2 = fused_ip.solve_batch_fused_ip(cfg, params, g1.state,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(g2.U), np.asarray(r2.U),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(g2.viol), np.asarray(r2.viol),
                               atol=1e-3)


def test_fused_ip_padded_lanes_are_benign():
    """B=3 pads to a full 1024-lane tile; outputs stay finite + exact."""
    H, B = 8, 3
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=1,
                           ip_iters=4)
    params = _batchify(_obstacle_params(H), B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)
    for leaf in jax.tree.leaves(got._replace(state=None)):
        assert np.all(np.isfinite(np.asarray(leaf, np.float64)))
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)


def test_fused_ip_moving_obstacle_matches_reference():
    """(B, H+1, 3, 2) per-stage centers through the IP kernel's moving
    mode must match the vmapped solver (VERDICT r2 item 5)."""
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=1,
                           ip_iters=6)
    p = _obstacle_params(H)
    ts = jnp.arange(H + 1, dtype=jnp.float32)[:, None, None]
    p = p._replace(obs_centers=p.obs_centers[None]
                   + ts * jnp.array([0.3, 0.05]))
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert fused_ip.eligible_ip(cfg, params)
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)


def test_fused_ip_boundary_rows_match_reference():
    """Active boundary rows through the IP kernel's linearized path vs the
    vmapped solver's exact polyline rows (straight lines => exact)."""
    from tests.test_fused_gn import _straight_corridor
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=1,
                           ip_iters=6, boundary_rows=True)
    p = straight_params(H, v=14.0)
    p = p._replace(x_ref=p.x_ref.at[:, 1].set(1.8),
                   obs_centers=jnp.full((3, 2), -1e4))
    bnds, signs = _straight_corridor()
    p = p._replace(boundaries=bnds, boundary_signs=signs)
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert fused_ip.eligible_ip(cfg, params)
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
    assert float(jnp.max(got.X[..., 1])) < 1.6


@pytest.mark.parametrize("ladder", [(1.0,), ()])
def test_fused_ip_alphas_variants_match_reference(ladder):
    """The configurable RTI ladder (single rung / UNGUARDED full step —
    the reference's maxqps=1 semantics) through the kernel vs the vmapped
    spec (VERDICT r4 item 2)."""
    H, B = 9, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=1,
                           ip_iters=4, ip_warm_duals=True,
                           ip_alphas=ladder)
    params = _batchify(_obstacle_params(H), B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_ip.solve_batch_fused_ip(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(ref.status))


def test_fused_ip_fallback_on_ineligible():
    """Boundary rows WITHOUT boundary data fall back to the vmapped path."""
    H, B = 6, 2
    cfg = sqp.SolverConfig(horizon=H, method="ip", boundary_rows=True)
    params = _batchify(_obstacle_params(H), B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert not fused_ip.eligible_ip(cfg, params)
