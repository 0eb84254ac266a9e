"""Lanes-trailing batched solve vs the vmapped reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops import riccati as R
from mpc_tpu.ops import riccati_vec as RV
from mpc_tpu.ops import sqp
from mpc_tpu.ops import sqp_vec
from tests.test_riccati import _random_problem
from tests.test_sqp import straight_params


def test_backward_vec_matches_vmap():
    rng = np.random.default_rng(51)
    B, H = 6, 12
    probs = [_random_problem(rng, H) for _ in range(B)]
    st = [jnp.asarray(np.stack([p[i] for p in probs]), jnp.float32)
          for i in range(11)]
    Q, Rm, M, qx, qu, QH, qH, A, Bm, r, dx0 = st
    quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
    dyn = R.LinDyn(A=A, B=Bm, r=r)
    ref = jax.vmap(lambda q, a, b, d: R.backward_pass(q, a, b, d, 1e-6))(
        quad, QH, qH, dyn)
    vec = RV.backward_pass_vec(quad, QH, qH, dyn, 1e-6)
    np.testing.assert_allclose(np.asarray(vec.K), np.asarray(ref.K),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vec.d), np.asarray(ref.d),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vec.dV1), np.asarray(ref.dV1),
                               rtol=1e-2)


def test_rollout_vec_matches_reference():
    rng = np.random.default_rng(52)
    B, H = 4, 10
    cfg = sqp.SolverConfig(horizon=H)
    x0 = jnp.asarray(rng.standard_normal((B, 5)) * 0.1
                     + np.array([0, 0, 0, 15, 0]), jnp.float32)
    U = jnp.asarray(0.1 * rng.standard_normal((B, H, 2)), jnp.float32)
    X = jax.vmap(lambda p, u: sqp._rollout(cfg, p, u))(x0, U)
    K = jnp.asarray(0.1 * rng.standard_normal((B, H, 2, 5)), jnp.float32)
    d = jnp.asarray(0.1 * rng.standard_normal((B, H, 2)), jnp.float32)
    u_lo, u_hi, _, _ = cfg.bounds.as_arrays(jnp.float32)
    alphas = (1.0, 0.35, 0.12)
    Xa, Ua = RV.feedback_rollout_vec(None, cfg.dt, cfg.wheelbase, x0, X, U,
                                     K, d, alphas, u_lo, u_hi, "rk4")
    for ai, a in enumerate(alphas):
        Xr, Ur = jax.vmap(
            lambda p, Xb, Ub, Kb, db: sqp._feedback_rollout(
                cfg, p, Xb, Ub, Kb, db, a))(x0, X, U, K, d)
        np.testing.assert_allclose(np.asarray(Ua[ai]), np.asarray(Ur),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Xa[ai]), np.asarray(Xr),
                                   rtol=1e-4, atol=1e-4)


def test_solve_batch_vec_matches_reference():
    cfg = sqp.SolverConfig(horizon=10)
    base = straight_params(10, v=17.0)
    n = 4
    from mpc_tpu.parallel import batch as pb
    params = pb.replicate_ocp(base, n)
    params = pb.perturb_x0(params, jax.random.PRNGKey(3),
                           jnp.array([0.4, 0.1, 0.0, 0.3, 0.0]))
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape),
        sqp.init_state(cfg))
    ref = sqp.solve_batch(cfg, params, states)
    vec = sqp_vec.solve_batch_vec_jit(cfg, params, states)
    np.testing.assert_allclose(np.asarray(vec.U), np.asarray(ref.U),
                               rtol=1e-3, atol=1e-3)
    # status codes may flip between 0/1 when kkt_stat sits at the tolerance
    # boundary (float32 noise); the feasible/infeasible sign must agree
    np.testing.assert_array_equal(np.asarray(vec.status) >= 0,
                                  np.asarray(ref.status) >= 0)


def test_closed_loop_batch_vec_matches_reference():
    from mpc_tpu.planner import closed_loop as cl
    from mpc_tpu.utils import synthetic
    lcfg, params = synthetic.make_bench_loop(n_steps=6, horizon=10,
                                             n_lanes=4, method="al")
    r1 = cl.closed_loop_batch(lcfg, params)
    r2 = cl.closed_loop_batch_vec(lcfg, params)
    np.testing.assert_allclose(np.asarray(r2.X), np.asarray(r1.X), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(r2.status) >= 0,
                                  np.asarray(r1.status) >= 0)


