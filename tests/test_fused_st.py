"""Fused kernels on the 7-state ST model family (dual-number Jacobians).

The kernels carry a tiny in-kernel forward-mode AD (``fused_gn._Dual``) so
the ST tire-dynamics ODE is written once and its exact RK4 (A, B) falls
out — validated here against ``jax.jacfwd`` and the vmapped XLA solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.models import dynamics as dyn
from mpc_tpu.models.vehicle import VEHICLE_2
from mpc_tpu.ops import fused_gn, sqp
from tests.test_st_model import _lane_ocp


def _batchify(params, n, key=0):
    from mpc_tpu.parallel import batch as pb
    b = pb.replicate_ocp(params, n)
    return pb.perturb_x0(b, jax.random.PRNGKey(key),
                         jnp.asarray([0.5, 0.2, 0.0, 0.5, 0.02],
                                     jnp.float32))


@pytest.mark.parametrize("integrator", ["rk4", "euler"])
def test_dual_lin_step_matches_jacfwd(integrator):
    """In-kernel dual-number (A, B) == jax.jacfwd of the ST step."""
    step = dyn.make_step_fn(integrator, 0.1, VEHICLE_2.wheelbase, "st",
                            VEHICLE_2)
    x7 = jnp.asarray([12.0, 1.0, 0.08, 14.0, 0.15, 0.4, 0.02], jnp.float32)
    u = jnp.asarray([0.05, 1.2], jnp.float32)
    A_ref = jax.jacfwd(step, argnums=0)(x7, u)
    B_ref = jax.jacfwd(step, argnums=1)(x7, u)
    # evaluate the kernel helper on (8,128) registers
    reg = lambda v: jnp.full((8, 128), v, jnp.float32)
    xl = [reg(float(x7[i])) for i in range(7)]
    ul = [reg(float(u[i])) for i in range(2)]
    A, Bm = fused_gn._st_lin_step(xl, ul, 0.1, VEHICLE_2, integrator)
    A_got = np.asarray([[float(A[i][j][0, 0]) for j in range(7)]
                        for i in range(7)])
    B_got = np.asarray([[float(Bm[i][j][0, 0]) for j in range(2)]
                        for i in range(7)])
    np.testing.assert_allclose(A_got, np.asarray(A_ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(B_got, np.asarray(B_ref), rtol=2e-4,
                               atol=2e-5)
    # value path too
    xn = fused_gn._st_step_rows(xl, ul, 0.1, VEHICLE_2, integrator)
    np.testing.assert_allclose(
        np.asarray([float(v[0, 0]) for v in xn]),
        np.asarray(step(x7, u)), rtol=1e-5, atol=1e-6)


def test_fused_st_matches_reference_solver():
    """Fused AL kernel with model='st' == the vmapped XLA solver."""
    H, B = 8, 2
    cfg = sqp.SolverConfig(horizon=H, model="st", vehicle=VEHICLE_2,
                           sqp_iters=2, al_iters=2)
    p = _lane_ocp(H, v=14.0)
    p = p._replace(obs_centers=jnp.array([[11.0, -1.8]] * 3))
    params = _batchify(p, B)
    state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
    assert fused_gn.eligible(cfg, params)
    ref = sqp.solve_batch(cfg, params, state)
    got = fused_gn.solve_batch_fused(cfg, params, state, interpret=True)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.X[..., :5]),
                               np.asarray(ref.X[..., :5]),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.viol), np.asarray(ref.viol),
                               atol=1e-3)
