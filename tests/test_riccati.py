"""Riccati LQR backend vs a dense float64 KKT oracle (SURVEY.md §4c)."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_tpu.ops import riccati as R

NX, NU = 5, 2


def _random_problem(rng, H):
    def spd(n, scale=1.0):
        m = rng.standard_normal((n, n))
        return scale * (m @ m.T + n * np.eye(n))

    Q = np.stack([spd(NX) for _ in range(H)])
    Rm = np.stack([spd(NU) for _ in range(H)])
    M = 0.1 * rng.standard_normal((H, NX, NU))
    qx = rng.standard_normal((H, NX))
    qu = rng.standard_normal((H, NU))
    QH = spd(NX)
    qH = rng.standard_normal(NX)
    A = np.stack([np.eye(NX) + 0.1 * rng.standard_normal((NX, NX))
                  for _ in range(H)])
    B = rng.standard_normal((H, NX, NU))
    r = 0.1 * rng.standard_normal((H, NX))
    dx0 = rng.standard_normal(NX)
    return Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0


def _dense_oracle(Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0):
    """Solve the stagewise QP as one dense equality-constrained KKT system."""
    H = Q.shape[0]
    nz = (H + 1) * NX + H * NU

    def ix(k):
        return slice(k * NX, (k + 1) * NX)

    def iu(k):
        return slice((H + 1) * NX + k * NU, (H + 1) * NX + (k + 1) * NU)

    Hm = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(H):
        Hm[ix(k), ix(k)] += Q[k]
        Hm[iu(k), iu(k)] += Rm[k]
        Hm[ix(k), iu(k)] += M[k]
        Hm[iu(k), ix(k)] += M[k].T
        g[ix(k)] += qx[k]
        g[iu(k)] += qu[k]
    Hm[ix(H), ix(H)] += QH
    g[ix(H)] += qH

    # constraints: dx_0 = dx0;  dx_{k+1} = A dx_k + B du_k + r_k
    nc = (H + 1) * NX
    Cm = np.zeros((nc, nz))
    d = np.zeros(nc)
    Cm[0:NX, ix(0)] = np.eye(NX)
    d[0:NX] = dx0
    for k in range(H):
        row = slice((k + 1) * NX, (k + 2) * NX)
        Cm[row, ix(k + 1)] = np.eye(NX)
        Cm[row, ix(k)] = -A[k]
        Cm[row, iu(k)] = -B[k]
        d[row] = r[k]

    KKT = np.block([[Hm, Cm.T], [Cm, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, d])
    sol = np.linalg.solve(KKT, rhs)
    z = sol[:nz]
    dX = z[:(H + 1) * NX].reshape(H + 1, NX)
    dU = z[(H + 1) * NX:].reshape(H, NU)
    return dX, dU


def test_riccati_matches_dense_kkt():
    rng = np.random.default_rng(0)
    for H in (3, 10, 30):
        prob = _random_problem(rng, H)
        dX_o, dU_o = _dense_oracle(*prob)
        Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = [
            jnp.asarray(p, jnp.float64 if jax.config.jax_enable_x64
                        else jnp.float32) for p in prob]
        quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
        dyn = R.LinDyn(A=A, B=B, r=r)
        dX, dU, gains = R.solve_lqr(quad, QH, qH, dyn, dx0, reg=0.0)
        np.testing.assert_allclose(np.asarray(dU), dU_o, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dX), dX_o, rtol=2e-3, atol=2e-3)


def test_riccati_batched_vmap():
    rng = np.random.default_rng(1)
    H, B_lanes = 10, 7
    probs = [_random_problem(rng, H) for _ in range(B_lanes)]
    stacked = [jnp.asarray(np.stack([p[i] for p in probs]), jnp.float32)
               for i in range(11)]
    Q, Rm, M, qx, qu, QH, qH, A, Bm, r, dx0 = stacked

    def solve_one(Q, Rm, M, qx, qu, QH, qH, A, Bm, r, dx0):
        return R.solve_lqr(R.StageQuad(Q, Rm, M, qx, qu), QH, qH,
                           R.LinDyn(A, Bm, r), dx0, reg=0.0)[1]

    dU_b = jax.vmap(solve_one)(Q, Rm, M, qx, qu, QH, qH, A, Bm, r, dx0)
    for i, p in enumerate(probs):
        _, dU_o = _dense_oracle(*p)
        np.testing.assert_allclose(np.asarray(dU_b[i]), dU_o, rtol=5e-3,
                                   atol=5e-3)


def test_gains_predict_decrease():
    rng = np.random.default_rng(2)
    prob = _random_problem(rng, 10)
    args = [jnp.asarray(p, jnp.float32) for p in prob]
    Q, Rm, M, qx, qu, QH, qH, A, B, r, dx0 = args
    quad = R.StageQuad(Q=Q, R=Rm, M=M, qx=qx, qu=qu)
    dyn = R.LinDyn(A=A, B=B, r=r)
    gains = R.backward_pass(quad, QH, qH, dyn, reg=0.0)
    # convex QP with zero init: expected model decrease dV1 + dV2/2 < 0 for
    # a non-trivial gradient; dV2 >= 0 (curvature along feedforward)
    assert float(gains.dV2) >= 0.0
    assert float(gains.dV1) <= 1e-6
