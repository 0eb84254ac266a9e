"""Fully lanes-trailing ("rows-native") batched AL solve — the speed-of-light
throughput path.

``sqp_vec`` moved the two sequential scans to lanes-trailing layout but still
assembles the quadratic model in (B, H, ...) tensors and transposes at the
kernel boundary; those transposes of tile-padded arrays dominate what's
left.  Here EVERYTHING — constraint rows, Jacobians (via ``jax.linearize``
+ 7 basis tangents), cost quadratics, Riccati sweep, rollouts, merits, AL
updates — lives in (feat, stage, lane) layout, so every tensor tiles the
(8, 128) vector registers near-perfectly and no transpose of a padded array
ever happens.

Scope: AL method, no road-boundary rows (those configs use ``sqp_vec`` /
``sqp``).  Validated against ``sqp.solve_batch`` in
``tests/test_sqp_vec.py``.

STATUS: experimental.  On the current TPU runtime this full-rows
formulation measures SLOWER than the partially-vectorized ``sqp_vec``
(483 ms vs 195 ms at B=4096, H=30) — the many small ``jnp.stack``s and the
J'diag(gn)J einsum lowering outweigh the layout gains outside the scans.
``closed_loop_batch_vec`` therefore dispatches to ``sqp_vec``; this module
is kept as the reference rows-native implementation for future kernel work.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.models import constraints as CM
from mpc_tpu.ops import sqp as S

NX = 5
NU = 2
NZ = NX + NU
NR = S.NROWS  # 14


# ---------------------------------------------------------------------------
# layout helpers: (B, H, ...) <-> (feat, H, B)
# ---------------------------------------------------------------------------


def to_rows(x: jax.Array) -> jax.Array:
    """(B, S, ...) -> (feat, S, B)."""
    B, Sdim = x.shape[0], x.shape[1]
    feat = int(np.prod(x.shape[2:])) if x.ndim > 2 else 1
    return jnp.moveaxis(x.reshape(B, Sdim, feat), (0, 1, 2), (2, 1, 0))


def from_rows(x: jax.Array, shape) -> jax.Array:
    """(feat, S, B) -> (B, S, *shape)."""
    feat, Sdim, B = x.shape
    return jnp.moveaxis(x, (0, 1, 2), (2, 1, 0)).reshape(B, Sdim, *shape)


# ---------------------------------------------------------------------------
# rows-native model evaluation
# ---------------------------------------------------------------------------


class RowsParams(NamedTuple):
    """Per-lane data pre-packed in rows layout.

    x0:     (NX, B)
    x_ref:  (NX, S, B)
    obs:    (6, B)   flattened obstacle circle centers
    mind:   (B,)
    wq, wr, wqN: (NX/NU/NX, B)
    """

    x0: jax.Array
    x_ref: jax.Array
    obs: jax.Array
    mind: jax.Array
    wq: jax.Array
    wr: jax.Array
    wqN: jax.Array


def pack_params(params: S.OcpParams) -> RowsParams:
    return RowsParams(
        x0=params.x0.T,
        x_ref=to_rows(params.x_ref),
        obs=params.obs_centers.reshape(params.obs_centers.shape[0], 6).T,
        mind=params.min_dist,
        wq=params.weights.q.T,
        wr=params.weights.r.T,
        wqN=params.weights.qN.T,
    )


def _ego_circles(cfg, x):
    """x: list of 5 rows (each (S, B) or (L,)) -> 3 circle centers."""
    _, disc = CM.approx_circle_radius(cfg.ego_length, cfg.ego_width)
    dd = disc / 2.0 / 2.0
    c, s = jnp.cos(x[4]), jnp.sin(x[4])
    return [(x[0], x[1]),
            (x[0] + dd * c, x[1] + dd * s),
            (x[0] - dd * c, x[1] - dd * s)]


def rows_h(cfg: S.SolverConfig, x, u, rp: RowsParams, is_term, fric_mask):
    """Constraint rows h, shape (NR, S, B).

    x: list of NX rows (S, B); u: list of NU rows; is_term/fric_mask: (S, 1).
    """
    u0 = jnp.where(is_term, 0.0, u[0])
    u1 = jnp.where(is_term, 0.0, u[1])
    v, delta = x[3], x[2]
    if cfg.formulation == "forcespro":
        psi_dot = v * jnp.tan(delta) / cfg.wheelbase
        fric = u1 * u1 + (v * psi_dot) ** 2
    else:
        fric = jnp.abs(u1 * u1 + v * (jnp.tan(delta) * v) / cfg.wheelbase)
        fric = jnp.where(fric_mask, fric, 0.0)

    ego = _ego_circles(cfg, x)
    obs = [(rp.obs[2 * j][None], rp.obs[2 * j + 1][None]) for j in range(3)]
    dists = []
    if cfg.formulation == "forcespro":
        pairs = [(i, j) for i in range(3) for j in range(3)]
    else:
        pairs = [(i, i) for i in range(3) for _ in range(3)]
    for (i, j) in pairs:
        dx = ego[i][0] - obs[j][0]
        dy = ego[i][1] - obs[j][1]
        dists.append(jnp.sqrt(dx * dx + dy * dy + 1e-9))
    rows = [fric] + dists + [u0, u1, delta, v]
    return jnp.stack(rows)


def rows_bounds(cfg: S.SolverConfig, rp: RowsParams, Sdim, B, is_term,
                dtype):
    """lo/hi bounds, (NR, S, B)."""
    inf = jnp.inf
    u_lo, u_hi, x_lo, x_hi = cfg.bounds.as_arrays(dtype)
    zero = jnp.zeros((Sdim, B), dtype)
    one = jnp.ones((Sdim, B), dtype)
    if cfg.formulation == "forcespro":
        f_lo, f_hi = zero, cfg.a_max ** 2 * one
        d_lo = jnp.broadcast_to(rp.mind[None], (Sdim, B))
    else:
        f_lo, f_hi = zero, cfg.a_max * one
        d_lo = jnp.broadcast_to(rp.mind[None], (Sdim, B))
    inf_m = inf * one
    lo = [f_lo] + [d_lo] * 9 + [
        jnp.where(is_term, -inf, u_lo[0]) * one,
        jnp.where(is_term, -inf, u_lo[1]) * one,
        x_lo[2] * one, x_lo[3] * one]
    hi = [f_hi] + [inf_m] * 9 + [
        jnp.where(is_term, inf, u_hi[0]) * one,
        jnp.where(is_term, inf, u_hi[1]) * one,
        x_hi[2] * one, x_hi[3] * one]
    # the reference casadi bounds leave aLong unbounded below — encoded in
    # cfg.bounds already (make_box_bounds)
    return jnp.stack(lo), jnp.stack(hi)


def _al_terms(h, lo, hi, lam_lo, lam_hi, mu):
    c_hi = h - hi
    c_lo = lo - h
    t_hi = lam_hi + mu * c_hi
    t_lo = lam_lo + mu * c_lo
    act_hi = t_hi > 0
    act_lo = t_lo > 0
    m_hi = jnp.where(act_hi, t_hi, 0.0)
    m_lo = jnp.where(act_lo, t_lo, 0.0)
    psi = (m_hi * m_hi - lam_hi * lam_hi
           + m_lo * m_lo - lam_lo * lam_lo) / (2.0 * mu)
    grad_h = m_hi - m_lo
    gn = mu * (act_hi.astype(h.dtype) + act_lo.astype(h.dtype))
    return psi, grad_h, gn


def _objective_rows(cfg, x, u, rp: RowsParams):
    """Objective over rows; x: NX-list of (S, B), u: NU-list of (H, B)."""
    H = cfg.horizon
    dxs = [x[i][:H] - rp.x_ref[i, :H] for i in range(NX)]
    stage = sum(rp.wq[i][None] * dxs[i] * dxs[i] for i in range(NX))
    stage = stage + sum(rp.wr[i][None] * u[i] * u[i] for i in range(NU))
    total = jnp.sum(stage, axis=0)
    if cfg.use_terminal_cost:
        dxt = [x[i][H] - rp.x_ref[i, H] for i in range(NX)]
        total = total + sum(rp.wqN[i] * dxt[i] * dxt[i] for i in range(NX))
    return total  # (B,)


def _dyn_step_rows(cfg, x, u):
    """One integrator step on rows; x: NX-list, u: NU-list of same shape."""
    wb = cfg.wheelbase
    dt = cfg.dt

    def ode(xx, uu):
        v, delta, psi = xx[3], xx[2], xx[4]
        return [v * jnp.cos(psi), v * jnp.sin(psi), uu[0], uu[1],
                v / wb * jnp.tan(delta)]

    def add(xx, s, k):
        return [xx[i] + s * k[i] for i in range(NX)]

    if cfg.integrator == "rk4":
        k1 = ode(x, u)
        k2 = ode(add(x, dt / 2, k1), u)
        k3 = ode(add(x, dt / 2, k2), u)
        k4 = ode(add(x, dt, k3), u)
        return [x[i] + dt / 6 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i])
                for i in range(NX)]
    k1 = ode(x, u)
    return add(x, dt, k1)


def _rollout_rows(cfg, x0_rows, U_rows):
    """x0: (NX, B); U_rows: (NU, H, B) -> X_rows (NX, H+1, B)."""
    def step(carry, u_stage):
        x = [carry[i] for i in range(NX)]
        u = [u_stage[i] for i in range(NU)]
        xn = _dyn_step_rows(cfg, x, u)
        return jnp.stack(xn), carry

    xH, Xs = jax.lax.scan(step, x0_rows, jnp.moveaxis(U_rows, 1, 0))
    X = jnp.concatenate([jnp.moveaxis(Xs, 0, 1), xH[:, None]], axis=1)
    return X  # (NX, H+1, B)


# ---------------------------------------------------------------------------
# quadratic model assembly (rows-native jacobians via linearize)
# ---------------------------------------------------------------------------


def _build_quad_rows(cfg, X_rows, U_rows, rp, lam_lo, lam_hi, mu,
                     is_term, fric_mask):
    """AL Gauss-Newton stage quadratics, all in rows layout.

    Returns (Q (25,H,B), R (4,H,B), M (10,H,B), qx (5,H,B), qu (2,H,B),
    P_H (25,B), p_H (5,B)) plus the current merit pieces.
    """
    Sdim = cfg.horizon + 1
    B = X_rows.shape[-1]
    dtype = X_rows.dtype
    U_ext = jnp.concatenate([U_rows, U_rows[:, -1:]], axis=1)  # (NU, S, B)

    def h_of_z(z):
        x = [z[i] for i in range(NX)]
        u = [z[NX + i] for i in range(NU)]
        return rows_h(cfg, x, u, rp, is_term, fric_mask)

    Z = jnp.concatenate([X_rows, U_ext], axis=0)  # (NZ, S, B)
    h, lin = jax.linearize(h_of_z, Z)
    eye = jnp.eye(NZ, dtype=dtype)
    J = jnp.stack([lin(jnp.broadcast_to(
        eye[i][:, None, None], Z.shape)) for i in range(NZ)])  # (NZ, NR, S, B)

    lo, hi = rows_bounds(cfg, rp, Sdim, B, is_term, dtype)
    psi, grad_h, gn = _al_terms(h, lo, hi, lam_lo, lam_hi, mu)

    # constraint contributions
    g_con = jnp.einsum("zrsb,rsb->zsb", J, grad_h)          # (NZ, S, B)
    H_con = jnp.einsum("zrsb,rsb,wrsb->zwsb", J, gn, J)     # (NZ, NZ, S, B)

    H = cfg.horizon
    dx = X_rows - rp.x_ref                                   # (NX, S, B)

    Q_rows = []
    for i in range(NX):
        for j in range(NX):
            base = 2.0 * rp.wq[i][None] if i == j else 0.0
            Q_rows.append(base + H_con[i, j, :H])
    R_rows = []
    for i in range(NU):
        for j in range(NU):
            base = 2.0 * rp.wr[i][None] if i == j else 0.0
            R_rows.append(base + H_con[NX + i, NX + j, :H])
    M_rows = [H_con[i, NX + j, :H] for i in range(NX) for j in range(NU)]
    qx_rows = [2.0 * rp.wq[i][None] * dx[i, :H] + g_con[i, :H]
               for i in range(NX)]
    qu_rows = [2.0 * rp.wr[i][None] * U_rows[i] + g_con[NX + i, :H]
               for i in range(NU)]

    if cfg.use_terminal_cost:
        PH_rows = [(2.0 * rp.wqN[i] if i == j else 0.0) + H_con[i, j, H]
                   for i in range(NX) for j in range(NX)]
        pH_rows = [2.0 * rp.wqN[i] * dx[i, H] + g_con[i, H]
                   for i in range(NX)]
    else:
        PH_rows = [H_con[i, j, H] for i in range(NX) for j in range(NX)]
        pH_rows = [g_con[i, H] for i in range(NX)]

    return (jnp.stack(Q_rows), jnp.stack(R_rows), jnp.stack(M_rows),
            jnp.stack(qx_rows), jnp.stack(qu_rows),
            jnp.stack(PH_rows), jnp.stack(pH_rows))


def _linearize_dyn_rows(cfg, X_rows, U_rows):
    """A (25, H, B), Bm (10, H, B) via linearize + 7 basis tangents."""
    H = cfg.horizon

    def f(z):
        x = [z[i] for i in range(NX)]
        u = [z[NX + i] for i in range(NU)]
        return jnp.stack(_dyn_step_rows(cfg, x, u))

    Z = jnp.concatenate([X_rows[:, :H], U_rows], axis=0)  # (NZ, H, B)
    _, lin = jax.linearize(f, Z)
    eye = jnp.eye(NZ, dtype=X_rows.dtype)
    cols = [lin(jnp.broadcast_to(eye[i][:, None, None], Z.shape))
            for i in range(NZ)]  # each (NX, H, B)
    A_rows = jnp.stack([cols[j][i] for i in range(NX) for j in range(NX)])
    B_rows = jnp.stack([cols[NX + j][i]
                        for i in range(NX) for j in range(NU)])
    return A_rows, B_rows


# ---------------------------------------------------------------------------
# rows-native Riccati backward + line-search rollout
# ---------------------------------------------------------------------------


def _mat(v, n, m):
    return [[v[i * m + j] for j in range(m)] for i in range(n)]


def _backward_rows(Q, R, M, qx, qu, PH, pH, A, Bm, reg):
    """All inputs (feat, H, B) / (feat, B); returns K (10,H,B), d (2,H,B)."""
    def step(carry, stage):
        Pv, pv = carry
        Qv, Rv, Mv, qxv, quv, Av, Bv = stage
        P = _mat(Pv, NX, NX)
        p = [pv[i] for i in range(NX)]
        Qm = _mat(Qv, NX, NX)
        Rm = _mat(Rv, NU, NU)
        Mm = _mat(Mv, NX, NU)
        Am = _mat(Av, NX, NX)
        Bmat = _mat(Bv, NX, NU)
        PA = [[sum(P[i][k] * Am[k][j] for k in range(NX)) for j in range(NX)]
              for i in range(NX)]
        PB = [[sum(P[i][k] * Bmat[k][j] for k in range(NX))
               for j in range(NU)] for i in range(NX)]
        Qxx = [[Qm[i][j] + sum(Am[k][i] * PA[k][j] for k in range(NX))
                for j in range(NX)] for i in range(NX)]
        Quu = [[Rm[i][j] + sum(Bmat[k][i] * PB[k][j] for k in range(NX))
                for j in range(NU)] for i in range(NU)]
        Qux = [[Mm[j][i] + sum(Bmat[k][i] * PA[k][j] for k in range(NX))
                for j in range(NX)] for i in range(NU)]
        # defects are zero (single shooting): Pr_p = p
        gx = [qxv[i] + sum(Am[k][i] * p[k] for k in range(NX))
              for i in range(NX)]
        gu = [quv[i] + sum(Bmat[k][i] * p[k] for k in range(NX))
              for i in range(NU)]
        a = Quu[0][0] + reg
        b = Quu[0][1]
        c = Quu[1][0]
        dd = Quu[1][1] + reg
        idet = 1.0 / (a * dd - b * c)
        Qi = [[dd * idet, -b * idet], [-c * idet, a * idet]]
        K = [[-(Qi[i][0] * Qux[0][j] + Qi[i][1] * Qux[1][j])
              for j in range(NX)] for i in range(NU)]
        d = [-(Qi[i][0] * gu[0] + Qi[i][1] * gu[1]) for i in range(NU)]
        P_new = [[Qxx[i][j] + Qux[0][i] * K[0][j] + Qux[1][i] * K[1][j]
                  for j in range(NX)] for i in range(NX)]
        P_sym = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(NX)]
                 for i in range(NX)]
        p_new = [gx[i] + Qux[0][i] * d[0] + Qux[1][i] * d[1]
                 for i in range(NX)]
        K_flat = jnp.stack([K[i][j] for i in range(NU) for j in range(NX)])
        return ((jnp.stack([P_sym[i][j] for i in range(NX)
                            for j in range(NX)]), jnp.stack(p_new)),
                (K_flat, jnp.stack(d)))

    stages = tuple(jnp.moveaxis(v, 1, 0) for v in (Q, R, M, qx, qu, A, Bm))
    (_, _), (K, d) = jax.lax.scan(step, (PH, pH), stages, reverse=True)
    return jnp.moveaxis(K, 0, 1), jnp.moveaxis(d, 0, 1)  # (10,H,B),(2,H,B)


def _ls_rollout_rows(cfg, x0_rows, X_rows, U_rows, K, d, alphas):
    """Rollout all alphas: returns Xa (NX, S, A, B), Ua (NU, H, A, B)."""
    A = len(alphas)
    B = x0_rows.shape[-1]
    dtype = x0_rows.dtype
    al = jnp.asarray(alphas, dtype)[:, None]  # (A, 1)
    u_lo, u_hi, _, _ = cfg.bounds.as_arrays(dtype)

    x_init = jnp.broadcast_to(x0_rows[:, None, :], (NX, A, B))

    def step(carry, stage):
        xa = carry  # (NX, A, B)
        xb, ub, kr, dv = stage
        x = [xa[i] for i in range(NX)]
        Km = _mat(kr, NU, NX)
        dxb = [x[i] - xb[i][None] for i in range(NX)]
        u = []
        for i in range(NU):
            fb = sum(Km[i][j][None] * dxb[j] for j in range(NX))
            ui = ub[i][None] + al * dv[i][None] + fb
            u.append(jnp.clip(ui, u_lo[i], u_hi[i]))
        xn = _dyn_step_rows(cfg, x, u)
        return jnp.stack(xn), (carry, jnp.stack(u))

    stages = (jnp.moveaxis(X_rows[:, :cfg.horizon], 1, 0),
              jnp.moveaxis(U_rows, 1, 0),
              jnp.moveaxis(K, 1, 0), jnp.moveaxis(d, 1, 0))
    xH, (Xs, Us) = jax.lax.scan(step, x_init, stages)
    Xa = jnp.concatenate([jnp.moveaxis(Xs, 0, 1), xH[:, None]],
                         axis=1)  # (NX, S, A, B)
    Ua = jnp.moveaxis(Us, 0, 1)  # (NU, H, A, B)
    return Xa, Ua


def _merit_rows(cfg, X_rows, U_rows, rp, lam_lo, lam_hi, mu,
                is_term, fric_mask):
    """AL merit per lane; X (NX, S, B), U (NU, H, B) -> (B,)."""
    U_ext = jnp.concatenate([U_rows, U_rows[:, -1:]], axis=1)
    x = [X_rows[i] for i in range(NX)]
    u = [U_ext[i] for i in range(NU)]
    h = rows_h(cfg, x, u, rp, is_term, fric_mask)
    lo, hi = rows_bounds(cfg, rp, X_rows.shape[1], X_rows.shape[-1],
                         is_term, X_rows.dtype)
    psi, _, _ = _al_terms(h, lo, hi, lam_lo, lam_hi, mu)
    obj = _objective_rows(cfg, x, [U_rows[i] for i in range(NU)], rp)
    return obj + jnp.sum(psi, axis=(0, 1))


# ---------------------------------------------------------------------------
# the solve
# ---------------------------------------------------------------------------


def solve_batch_rows(cfg: S.SolverConfig, params: S.OcpParams,
                     state: S.SqpState) -> S.Solution:
    """Rows-native batched AL solve; same contract as ``sqp.solve_batch``."""
    if cfg.method != "al" or cfg.boundary_rows:
        return S.solve_batch(cfg, params, state)

    H = cfg.horizon
    Sdim = H + 1
    dtype = params.x0.dtype
    B = params.x0.shape[0]

    rp = pack_params(params)
    idx = np.arange(Sdim)
    is_term = jnp.asarray((idx >= H)[:, None])            # (S, 1)
    if cfg.formulation == "casadi":
        fric_mask = jnp.asarray((idx == 0)[:, None])
    else:
        fric_mask = jnp.asarray(np.ones((Sdim, 1), bool))

    # state to rows layout: (B, S, NR) -> (NR, S, B)
    lam_lo = jnp.moveaxis(state.lam_lo, (0, 1, 2), (2, 1, 0))
    lam_hi = jnp.moveaxis(state.lam_hi, (0, 1, 2), (2, 1, 0))
    mu = jnp.moveaxis(state.mu, (0, 1, 2), (2, 1, 0))
    prev_viol = jnp.moveaxis(state.prev_viol, (0, 1, 2), (2, 1, 0))
    U_rows = jnp.moveaxis(state.U, (0, 1, 2), (2, 1, 0))  # (NU, H, B)

    X_rows = _rollout_rows(cfg, rp.x0, U_rows)

    alphas = cfg.alphas

    def gn_iter(carry, _):
        X, U = carry
        Q, R, M, qx, qu, PH, pH = _build_quad_rows(
            cfg, X, U, rp, lam_lo, lam_hi, mu, is_term, fric_mask)
        A_rows, B_rows = _linearize_dyn_rows(cfg, X, U)
        K, d = _backward_rows(Q, R, M, qx, qu, PH, pH, A_rows, B_rows,
                              cfg.reg)
        Xa, Ua = _ls_rollout_rows(cfg, rp.x0, X, U, K, d, alphas)
        # merits for all alphas: fold A into lanes
        A_n = len(alphas)
        Xf = Xa.reshape(NX, Sdim, A_n * B)
        Uf = Ua.reshape(NU, H, A_n * B)

        def rep(a):
            return jnp.repeat(a[..., None, :], A_n, axis=-2).reshape(
                *a.shape[:-1], A_n * a.shape[-1]) if a.ndim > 1 else a

        rp_f = RowsParams(
            x0=rp.x0, x_ref=rep(rp.x_ref), obs=rep(rp.obs),
            mind=jnp.tile(rp.mind, A_n), wq=rep(rp.wq), wr=rep(rp.wr),
            wqN=rep(rp.wqN))
        merits = _merit_rows(cfg, Xf, Uf, rp_f, rep(lam_lo), rep(lam_hi),
                             rep(mu), is_term, fric_mask).reshape(A_n, B)
        merit0 = _merit_rows(cfg, X, U, rp, lam_lo, lam_hi, mu, is_term,
                             fric_mask)
        best = jnp.argmin(merits, axis=0)                  # (B,)
        improved = jnp.min(merits, axis=0) < merit0
        sel = jax.nn.one_hot(best, A_n, dtype=dtype)       # (B, A)
        Xb = jnp.einsum("xsab,ba->xsb", Xa, sel)
        Ub = jnp.einsum("xhab,ba->xhb", Ua, sel)
        X_new = jnp.where(improved[None, None], Xb, X)
        U_new = jnp.where(improved[None, None], Ub, U)
        return (X_new, U_new), None

    def outer(carry, _):
        X, U, ll, lh, m, pv = carry
        (X, U), _ = jax.lax.scan(gn_iter, (X, U), None,
                                 length=cfg.sqp_iters)
        U_ext = jnp.concatenate([U, U[:, -1:]], axis=1)
        h = rows_h(cfg, [X[i] for i in range(NX)],
                   [U_ext[i] for i in range(NU)], rp, is_term, fric_mask)
        lo, hi = rows_bounds(cfg, rp, Sdim, B, is_term, dtype)
        t_hi = lh + m * (h - hi)
        t_lo = ll + m * (lo - h)
        lh = jnp.clip(jnp.where(t_hi > 0, t_hi, 0.0), 0.0, cfg.lam_max)
        ll = jnp.clip(jnp.where(t_lo > 0, t_lo, 0.0), 0.0, cfg.lam_max)
        viol = jnp.maximum(jnp.maximum(lo - h, h - hi), 0.0)
        viol = jnp.where(jnp.isfinite(viol), viol, 0.0)
        stalled = viol > cfg.viol_improve * pv
        active = viol > cfg.tol_feas
        m = jnp.clip(jnp.where(stalled & active, m * cfg.mu_factor, m),
                     cfg.mu0, cfg.mu_max)
        return (X, U, ll, lh, m, viol), None

    init = (X_rows, U_rows, lam_lo, lam_hi, mu, prev_viol)
    (X, U, lam_lo, lam_hi, mu, prev_viol), _ = jax.lax.scan(
        outer, init, None, length=cfg.al_iters)

    # diagnostics (rows form, no autodiff KKT here: predicted-decrease proxy)
    U_ext = jnp.concatenate([U, U[:, -1:]], axis=1)
    h = rows_h(cfg, [X[i] for i in range(NX)],
               [U_ext[i] for i in range(NU)], rp, is_term, fric_mask)
    lo, hi = rows_bounds(cfg, rp, Sdim, B, is_term, dtype)
    viol_rows = jnp.maximum(jnp.maximum(lo - h, h - hi), 0.0)
    viol_rows = jnp.where(jnp.isfinite(viol_rows), viol_rows, 0.0)
    viol = jnp.max(viol_rows, axis=(0, 1))                 # (B,)
    obj = _objective_rows(cfg, [X[i] for i in range(NX)],
                          [U[i] for i in range(NU)], rp)
    merit = _merit_rows(cfg, X, U, rp, lam_lo, lam_hi, mu, is_term,
                        fric_mask)
    # status: feasibility-based (stationarity proxy: merit-objective gap)
    feasible = viol < jnp.asarray(cfg.tol_infeas, dtype)
    converged = viol < cfg.tol_feas
    status = jnp.where(converged, 1, jnp.where(feasible, 0, -7)).astype(
        jnp.int32)

    new_state = S.SqpState(
        U=jnp.moveaxis(U, (0, 1, 2), (2, 1, 0)),
        lam_lo=jnp.moveaxis(lam_lo, (0, 1, 2), (2, 1, 0)),
        lam_hi=jnp.moveaxis(lam_hi, (0, 1, 2), (2, 1, 0)),
        mu=jnp.moveaxis(mu, (0, 1, 2), (2, 1, 0)),
        prev_viol=jnp.moveaxis(prev_viol, (0, 1, 2), (2, 1, 0)))
    return S.Solution(
        X=from_rows(X, (NX,)).reshape(B, Sdim, NX),
        U=new_state.U,
        state=new_state, status=status,
        kkt_stat=merit - obj,  # AL-gap proxy
        viol=viol, cost=obj, merit=merit)


solve_batch_rows_jit = partial(jax.jit, static_argnums=0)(solve_batch_rows)
