"""Parallel-scan Riccati vs the sequential sweep and the dense KKT oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops import pscan, riccati as R
from tests.test_riccati import _dense_oracle, _random_problem

NX, NU = 5, 2


def _to_jnp(prob):
    return [jnp.asarray(p, jnp.float32) for p in prob]


def test_pscan_matches_sequential_backward():
    rng = np.random.default_rng(3)
    for H in (2, 10, 33, 64):
        prob = _random_problem(rng, H)
        Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = _to_jnp(prob)
        quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
        dyn = R.LinDyn(A=A, B=B, r=r)
        g_seq = R.backward_pass(quad, QH, qH, dyn, reg=1e-6)
        g_par = pscan.backward_pass_pscan(quad, QH, qH, dyn, reg=1e-6)
        np.testing.assert_allclose(np.asarray(g_par.K), np.asarray(g_seq.K),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_par.d), np.asarray(g_seq.d),
                                   rtol=2e-3, atol=2e-3)


def test_pscan_full_solve_matches_oracle():
    rng = np.random.default_rng(4)
    for H in (5, 30):
        prob = _random_problem(rng, H)
        dX_o, dU_o = _dense_oracle(*prob)
        Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = _to_jnp(prob)
        quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
        dyn = R.LinDyn(A=A, B=B, r=r)
        dX, dU, _ = pscan.solve_lqr_pscan(quad, QH, qH, dyn, dx0, reg=0.0)
        np.testing.assert_allclose(np.asarray(dU), dU_o, rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(dX), dX_o, rtol=5e-3, atol=5e-3)


def test_pscan_value_functions_match_sequential():
    """P_k from the suffix scan == P_k from the sequential recursion."""
    rng = np.random.default_rng(5)
    prob = _random_problem(rng, 12)
    Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = _to_jnp(prob)
    quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
    dyn = R.LinDyn(A=A, B=B, r=r)
    P, p = pscan.value_functions(quad, QH, qH, dyn, reg=0.0)
    # sequential reference: run the scan and reconstruct P_0 via the
    # backward recursion done in float64 numpy
    Pn = np.asarray(QH, np.float64)
    pn = np.asarray(qH, np.float64)
    Qn, Rn, Mn = (np.asarray(v, np.float64) for v in (Q, Rm, M))
    qxn, qun = np.asarray(qx, np.float64), np.asarray(qu, np.float64)
    An, Bn, rn = (np.asarray(v, np.float64) for v in (A, B, r))
    for k in reversed(range(12)):
        Qxx = Qn[k] + An[k].T @ Pn @ An[k]
        Quu = Rn[k] + Bn[k].T @ Pn @ Bn[k]
        Qux = Mn[k].T + Bn[k].T @ Pn @ An[k]
        gx = qxn[k] + An[k].T @ (pn + Pn @ rn[k])
        gu = qun[k] + Bn[k].T @ (pn + Pn @ rn[k])
        Kk = -np.linalg.solve(Quu, Qux)
        dk = -np.linalg.solve(Quu, gu)
        Pn = Qxx + Qux.T @ Kk
        Pn = 0.5 * (Pn + Pn.T)
        pn = gx + Qux.T @ dk
    np.testing.assert_allclose(np.asarray(P[0]), Pn, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(p[0]), pn, rtol=5e-3, atol=2e-2)


def test_pscan_batched():
    rng = np.random.default_rng(6)
    probs = [_random_problem(rng, 8) for _ in range(4)]
    stacked = [jnp.asarray(np.stack([p[i] for p in probs]), jnp.float32)
               for i in range(11)]
    Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = stacked

    def solve_one(Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0):
        return pscan.solve_lqr_pscan(
            R.StageQuad(Q, Rm, M, qx, qu), QH, qH,
            R.LinDyn(A, B, r), dx0, reg=0.0)[1]

    dU_b = jax.vmap(solve_one)(Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0)
    for i, p in enumerate(probs):
        _, dU_o = _dense_oracle(*p)
        np.testing.assert_allclose(np.asarray(dU_b[i]), dU_o, rtol=1e-2,
                                   atol=1e-2)


def test_sqp_with_pscan_backend_matches_scan():
    from mpc_tpu.ops import sqp
    from tests.test_sqp import straight_params
    p = straight_params(12, v=16.0)
    p = p._replace(x0=p.x0.at[3].set(14.0))
    cfg_seq = sqp.SolverConfig(horizon=12)
    cfg_par = sqp.SolverConfig(horizon=12, lqr_backend="pscan")
    s1 = sqp.solve(cfg_seq, p, sqp.init_state(cfg_seq))
    s2 = sqp.solve(cfg_par, p, sqp.init_state(cfg_par))
    np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U),
                               rtol=1e-3, atol=1e-3)


def test_pscan_stage_sharded_over_mesh():
    """Horizon/stage parallelism (the sequence-parallelism analog,
    SURVEY.md §2.3): the associative-scan backward pass compiles and
    executes with the STAGE axis sharded over the mesh's sp axis, and
    matches the sequential sweep.  On real hardware the scan's combine
    steps become ICI collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mpc_tpu.parallel import mesh as pm

    n_dev = min(len(jax.devices()), 8)
    mesh = pm.make_mesh((1, n_dev), devices=jax.devices()[:n_dev])

    rng = np.random.default_rng(7)
    H = 128  # long horizon: 16 stages per device on the 8-way mesh
    prob = _random_problem(rng, H)
    Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = _to_jnp(prob)
    quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
    dyn = R.LinDyn(A=A, B=B, r=r)
    g_seq = R.backward_pass(quad, QH, qH, dyn, reg=1e-6)

    def stage_shard(x):
        spec = P("sp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    quad_s = jax.tree.map(stage_shard, quad)
    dyn_s = jax.tree.map(stage_shard, dyn)
    with mesh:
        g_par = jax.jit(lambda q, d: pscan.backward_pass_pscan(
            q, QH, qH, d, reg=1e-6))(quad_s, dyn_s)
        g_par = jax.tree.map(jax.block_until_ready, g_par)
    np.testing.assert_allclose(np.asarray(g_par.K), np.asarray(g_seq.K),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_par.d), np.asarray(g_seq.d),
                               rtol=2e-3, atol=2e-3)
