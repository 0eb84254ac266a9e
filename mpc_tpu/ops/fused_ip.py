"""Fused Pallas TPU kernel: the ENTIRE hard-constrained RTI-SQP solve.

Round 2 fused the soft-constrained AL solve (``ops.fused_gn``) and left the
forcespro-parity mode — ``method='ip'``, the mode that reproduces the
reference's flagship hard-constrained deployment
(``/root/reference/MPC_Planner/optimizer.py:197-245``) — on the per-lane
vmapped XLA path, ~40x slower.  This kernel runs the full RTI-SQP with the
HPIPM-style primal-dual interior-point stagewise QP (``ops.ipqp``) per
1024-lane tile, everything VMEM-resident:

    for ip_sqp_iters:                  # RTI relinearizations
        init slacks/duals from row margins (or warm duals)
        for ip_iters:                  # primal-dual Newton steps
            stage quadratics with sigma = z/s row weights (analytic
                                        sparse row gradients; no jacfwd)
            Riccati backward sweep     (closed-form 2x2 Quu inverse)
            linear forward pass        (ddX, ddU)
            slack/dual recovery + fraction-to-boundary step
            barrier update from the complementarity gap
        exact-penalty RTI line search  (true-rollout merit ladder,
                                        objective + rho * viol)
    diagnostics pass                   (viol rows, cost, Lagrangian
                                        stationarity via the adjoint
                                        recursion with the final QP duals)

Semantics mirror ``sqp._solve_ip`` + ``ipqp`` exactly (same s_min/mu0/
sigma/tau constants, same alphas ladder, same exact-penalty merit), so the
vmapped XLA path remains the executable spec; equivalence is tested in
``tests/test_fused_ip.py`` (interpret mode on CPU, compiled on TPU).

Layout identical to ``fused_gn``: every per-lane scalar is an (8, 128)
vector register over the 1024-lane tile; 5x5/2x2 algebra unrolls into VPU
FMAs.  Eligibility: KS or ST model, method='ip'; static or per-stage
moving
obstacle centers; optional road-boundary rows via the shared per-stage
linearization (``fused_gn.linearize_boundaries``).  Reference analog: the
generated FORCESPRO BFGS-SQP C solver (``test/FORCESNLPsolver/lib/``) —
one self-contained native solve per call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_tpu.ops import sqp as S
from mpc_tpu.ops.ipqp import _S_FLOOR, _WARM_KAPPA, _Z_MAX
from mpc_tpu.ops.fused_gn import (
    LANE_TILE, NR, NU, NX, _LANES, _Rows, _SUB, _assemble_quad, _cdiv,
    _compute_rows, _lin_step, _pack, _read_vec, _row_bounds, _row_values,
    _stage_cost_rows, _step_rows, _term_cost_rows, _unpack, make_consts)

# ipqp.py constants (init_ip / ip_iteration / solve_qp defaults)
_S_MIN = 1e-2
_MU0 = 1.0
_SIGMA_B = 0.2
_TAU = 0.995
_MU_MIN = 1e-8
# sqp._solve_ip RTI line-search ladder default (SolverConfig.ip_alphas;
# () = unguarded full RTI step, the reference's maxqps=1 semantics)
_IP_ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.03)


def _row_lin(r, bounds, dX, dU):
    """Linearized row values c_i = h_i + J_i . (dX, dU) (sparse grads).

    dU entries may be zeros at the terminal stage (g_a already zeroed).
    """
    gd, gv, ga = r.gf
    cs = [r.h_f + gd * dX[2] + gv * dX[3] + ga * dU[1]]
    for (dist, ux, uy, gp) in r.circ:
        cs.append(dist + ux * dX[0] + uy * dX[1] + gp * dX[4])
    cs.append(r.box[0] + dU[0])
    cs.append(r.box[1] + dU[1])
    cs.append(r.box[2] + dX[2])
    cs.append(r.box[3] + dX[3])
    for (hb, nx_, ny_, gp) in r.bnd:
        cs.append(hb + nx_ * dX[0] + ny_ * dX[1] + gp * dX[4])
    return cs


def _n_finite(bounds) -> int:
    n = 0
    for lo, hi in bounds:
        n += (lo is not None) + (hi is not None)
    return n


def _make_ip_kernel(cfg: S.SolverConfig, H: int,
                    moving: bool = False):
    consts = make_consts(cfg)
    nxk = S.solver_nx(cfg)  # 5 (KS) or 7 (ST)
    dt = float(cfg.dt)
    inv_l = consts["inv_l"]
    integ = cfg.integrator
    if cfg.model == "st":
        from mpc_tpu.ops.fused_gn import _st_lin_step, _st_step_rows
        _veh = cfg.vehicle

        def step_f(x, u):
            return _st_step_rows(x, u, dt, _veh, integ)

        def lin_f(x, u):
            return _st_lin_step(x, u, dt, _veh, integ)
    else:
        def step_f(x, u):
            return _step_rows(x, u, dt, inv_l, integ)

        def lin_f(x, u):
            return _lin_step(x, u, dt, inv_l, integ)
    reg = float(cfg.reg)
    rho = float(cfg.ip_ls_rho)
    _fr_scale = (consts["a_max"] ** 2 if consts["formulation"] == "forcespro"
                 else consts["a_max"])
    # bound-relative friction (sqp.row_scales): scales the penalty merit,
    # the -7 gate, and the reported viol; pviol rows stay raw
    nr = S.nrows(cfg)
    inv_scale = [1.0 / _fr_scale] + [1.0] * (nr - 1)
    u_clip = ((consts["u_lo0"], consts["u_lo1"]),
              (consts["u_hi0"], consts["u_hi1"]))
    big = 1e30

    def kernel(x0_ref, xref_ref, obs_ref, mind_ref, w_ref, bnd_ref,
               u_ref, zlo_ref, zhi_ref,
               X_ref, u_out, zlo_out, zhi_out, pviol_out, diag_ref,
               K_scr, dff_scr, dX_scr, dU_scr, ddX_scr, ddU_scr,
               slo_scr, shi_scr, dslo_scr, dshi_scr, dzlo_scr, dzhi_scr,
               rows_scr, ab_scr):
        u_out[...] = u_ref[...]
        zlo_out[...] = zlo_ref[...]
        zhi_out[...] = zhi_ref[...]
        if moving:
            # per-stage predicted obstacle centers: obs_ref is (H+1, 6)
            def obs_at(k):
                return [obs_ref[k, i] for i in range(6)]
        else:
            _obs0 = [obs_ref[i] for i in range(6)]

            def obs_at(k):
                return _obs0
        if consts["boundary"]:
            def bnd_at(k):
                return [bnd_ref[k, i] for i in range(18)]
        else:
            def bnd_at(k):
                return None
        mind = mind_ref[0]
        wq = [w_ref[i] for i in range(nxk)]
        wr = [w_ref[nxk + i] for i in range(NU)]
        wqN = [w_ref[nxk + NU + i] for i in range(nxk)]
        x0 = [x0_ref[i] for i in range(nxk)]

        bounds_k = _row_bounds(consts, mind, is_term=False)
        bounds_T = _row_bounds(consts, mind, is_term=True)
        n_act = float(H * _n_finite(bounds_k) + _n_finite(bounds_T))

        zero = jnp.zeros_like(x0[0])
        zero_u = [zero, zero]

        def clip_u(u):
            return [jnp.clip(u[i], u_clip[0][i], u_clip[1][i])
                    for i in range(NU)]

        # --- outer-iterate linearization cache ------------------------------
        # The Newton loop evaluates rows (tan/cos/sin + 9 sqrt) and the
        # RK4-chain (A, B) Jacobians at the OUTER iterate, which is FIXED
        # across all ip_iters Newton steps (and across the bwd/fwd/steps
        # sweeps within one).  Rows are stored by whichever rollout wrote
        # the trajectory (the initial rollout or the merit write pass);
        # the (A, B) Jacobians get one dedicated pass per SQP
        # relinearization.  Every consumer reads registers instead of
        # redoing the transcendental-heavy chain.  Bit-identical math.
        def store_rows(k, r):
            vals = [zero + r.h_f, zero + r.gf[0], zero + r.gf[1],
                    zero + r.gf[2]]
            for c in r.circ:
                vals.extend(zero + ci for ci in c)
            vals.extend(zero + bi for bi in r.box)
            for b in r.bnd:
                vals.extend(zero + bi for bi in b)
            rows_scr[k] = jnp.stack(vals)

        def cached_rows(k):
            v = rows_scr[k]
            r = _Rows()
            r.h_f = v[0]
            r.gf = (v[1], v[2], v[3])
            r.circ = [(v[4 + 4 * i], v[5 + 4 * i], v[6 + 4 * i],
                       v[7 + 4 * i]) for i in range(9)]
            r.box = (v[40], v[41], v[42], v[43])
            r.bnd = ([(v[44 + 4 * i], v[45 + 4 * i], v[46 + 4 * i],
                       v[47 + 4 * i]) for i in range(6)]
                     if consts["boundary"] else [])
            return r

        def cached_ab(k):
            v = ab_scr[k]
            A = [[v[i * nxk + j] for j in range(nxk)] for i in range(nxk)]
            Bm = [[v[nxk * nxk + i * NU + j] for j in range(NU)]
                  for i in range(nxk)]
            return A, Bm

        def ip_weights(r, bounds, dXk, dUk, slo, shi, zlo, zhi, mu_b):
            """(algr, cs): per-row (w_rows, sigma_rows) + linearized values.

            ipqp.ip_iteration's rs/sig/q/w row algebra, statically masked.
            """
            cs = _row_lin(r, bounds, dXk, dUk)
            algr = []
            for i, (lo, hi) in enumerate(bounds):
                w_i = zero
                sig_i = zero
                # w = mu/s + sig*rs per side: the current z cancels against
                # the dz elimination's -z (see ipqp.ip_iteration)
                if hi is not None:
                    rs_hi = shi[i] - (hi - cs[i])
                    sg = zhi[i] / shi[i]
                    w_i = w_i + mu_b / shi[i] + sg * rs_hi
                    sig_i = sig_i + sg
                if lo is not None:
                    rs_lo = slo[i] - (cs[i] - lo)
                    sg = zlo[i] / slo[i]
                    w_i = w_i - mu_b / slo[i] - sg * rs_lo
                    sig_i = sig_i + sg
                algr.append((w_i, sig_i))
            return algr, cs

        # --- initial rollout: X <- rollout(x0, U); rows cached en route -----
        def roll_body(k, x):
            X_ref[k] = jnp.stack(x)
            u = _read_vec(u_out, k, NU)
            store_rows(k, _compute_rows(x, u, obs_at(k), consts, False,
                                        k_is0=(k == 0), bnd=bnd_at(k)))
            return jnp.stack(step_f(x, u))

        xH = jax.lax.fori_loop(0, H, lambda k, xs: roll_body(
            k, [xs[i] for i in range(nxk)]), jnp.stack(x0))
        X_ref[H] = xH
        store_rows(H, _compute_rows([xH[i] for i in range(nxk)], zero_u,
                                    obs_at(H), consts, True, k_is0=False,
                                    bnd=bnd_at(H)))

        def penalty_merit_rollout(alpha, write: bool, merit: bool = True):
            """phi(alpha) = objective + rho * viol of rollout(clip(U + a dU)).

            alpha: (8,128) per-lane; write=True stores the new (X, U).
            The RTI step is a pure dU step (no feedback), matching
            ``sqp._solve_ip``'s try_alpha.  merit=False (the unguarded
            write pass, whose return value is discarded) skips the
            objective/violation accumulation.
            """
            def body(k, carry):
                x, acc = carry
                xl = [x[i] for i in range(nxk)]
                ub = _read_vec(u_out, k, NU)
                dk = _read_vec(dU_scr, k, NU)
                u = clip_u([ub[i] + alpha * dk[i] for i in range(NU)])
                r = _compute_rows(xl, u, obs_at(k), consts, False,
                                  k_is0=(k == 0), bnd=bnd_at(k))
                if write:
                    store_rows(k, r)
                if merit:
                    hs = _row_values(r)
                    v = zero
                    for i, (lo, hi) in enumerate(bounds_k):
                        vi = zero
                        if hi is not None:
                            vi = jnp.maximum(vi, hs[i] - hi)
                        if lo is not None:
                            vi = jnp.maximum(vi, lo - hs[i])
                        v = v + jnp.maximum(vi, 0.0) * inv_scale[i]
                    xref_k = _read_vec(xref_ref, k, nxk)
                    acc = (acc + _stage_cost_rows(xl, u, xref_k, wq, wr)
                           + rho * v)
                if write:
                    X_ref[k] = jnp.stack(xl)
                    u_out[k] = jnp.stack(u)
                return (jnp.stack(step_f(xl, u)), acc)

            xH2, acc = jax.lax.fori_loop(0, H, body, (jnp.stack(x0), zero))
            xT = [xH2[i] for i in range(nxk)]
            rT = _compute_rows(xT, zero_u, obs_at(H), consts, True,
                               k_is0=False, bnd=bnd_at(H))
            if write:
                store_rows(H, rT)
            if merit:
                hsT = _row_values(rT)
                vT = zero
                for i, (lo, hi) in enumerate(bounds_T):
                    vi = zero
                    if hi is not None:
                        vi = jnp.maximum(vi, hsT[i] - hi)
                    if lo is not None:
                        vi = jnp.maximum(vi, lo - hsT[i])
                    vT = vT + jnp.maximum(vi, 0.0) * inv_scale[i]
                xrefT = _read_vec(xref_ref, H, nxk)
                if cfg.use_terminal_cost:
                    acc = acc + _term_cost_rows(xT, xrefT, wqN)
                acc = acc + rho * vT
            if write:
                X_ref[H] = xH2
            # NaN rollouts lose the ladder (sqp._solve_ip: phi = inf on nan)
            acc = jnp.where(jnp.isfinite(acc), acc, big)
            return acc

        # ==== RTI-SQP iterations ===========================================
        # all solver state lives in refs, so the relinearization loop rolls
        # into one fori_loop (no unrolling: ~ip_sqp_iters x faster compiles)
        def sqp_body(_sqp_i, _c):
            # --- cache (A, B) at the current linearization point (rows are
            # already in rows_scr: the rollout that produced the current
            # trajectory stored them; (A, B) is filled by the FIRST Newton
            # iteration's backward sweep, which walks every stage anyway) --

            # --- init IP state at the current linearization point ----------
            def init_stage(k, bounds, is_term, warm):
                r = cached_rows(k)
                cs = _row_values(r)
                slo_n, shi_n, zlo_n, zhi_n = [], [], [], []
                for i, (lo, hi) in enumerate(bounds):
                    def warm_z(z0, zc):
                        # ipqp.init_ip warm clip: band around central path
                        return jnp.clip(jnp.where(z0 > 0, z0, zc),
                                        zc / _WARM_KAPPA, zc * _WARM_KAPPA)

                    # infeasible-start relaxation (mirrors ipqp.init_ip):
                    # VIOLATED rows (margin <= 0) start at slack 1 / dual
                    # _MU0; feasible-but-tight rows keep the s_min clamp
                    if lo is not None:
                        ml = cs[i] - lo
                        sl = jnp.where(ml <= 0, 1.0,
                                       jnp.maximum(ml, _S_MIN))
                        zl = (warm_z(zlo_out[k][i], _MU0 / sl)
                              if warm else _MU0 / sl)
                    else:
                        sl = jnp.ones_like(zero)
                        zl = zero
                    if hi is not None:
                        mh = hi - cs[i]
                        sh = jnp.where(mh <= 0, 1.0,
                                       jnp.maximum(mh, _S_MIN))
                        zh = (warm_z(zhi_out[k][i], _MU0 / sh)
                              if warm else _MU0 / sh)
                    else:
                        sh = jnp.ones_like(zero)
                        zh = zero
                    slo_n.append(sl)
                    shi_n.append(sh)
                    zlo_n.append(zl)
                    zhi_n.append(zh)
                slo_scr[k] = jnp.stack(slo_n)
                shi_scr[k] = jnp.stack(shi_n)
                zlo_out[k] = jnp.stack(zlo_n)
                zhi_out[k] = jnp.stack(zhi_n)
                dX_scr[k] = jnp.stack([zero] * nxk)
                if not is_term:
                    dU_scr[k] = jnp.stack([zero] * NU)
                return 0

            # warm duals chain across SQP iterations AND MPC steps: zlo_out
            # holds the carried duals (inputs at sqp_i=0, previous QP finals
            # after), mirroring sqp._solve_ip's (z_lo, z_hi) scan carry
            warm = bool(cfg.ip_warm_duals)
            jax.lax.fori_loop(
                0, H, lambda k, _: init_stage(k, bounds_k, False, warm), 0)
            init_stage(H, bounds_T, True, warm)

            # --- Newton iterations (fixed count, barrier in the carry) ------
            def newton_impl(mu_b, fill_ab):
                # terminal quadratic with IP weights
                xT = _read_vec(X_ref, H, nxk)
                rT = cached_rows(H)
                dXT = _read_vec(dX_scr, H, nxk)
                algT, _ = ip_weights(
                    rT, bounds_T, dXT, zero_u,
                    _read_vec(slo_scr, H, nr), _read_vec(shi_scr, H, nr),
                    _read_vec(zlo_out, H, nr), _read_vec(zhi_out, H, nr),
                    mu_b)
                x_cT = [xT[i] + dXT[i] for i in range(nxk)]
                QH, qH = _assemble_quad(rT, algT, x_cT, zero_u,
                                        _read_vec(xref_ref, H, nxk),
                                        wq, wr, True, wqN,
                                        cfg.use_terminal_cost)

                # backward Riccati sweep (defect-free: dX is linearly
                # consistent by construction, see module doc)
                def bwd_body(j, carry):
                    P, p = carry
                    k = H - 1 - j
                    Pl = [[P[i, j2] for j2 in range(nxk)] for i in range(nxk)]
                    pl_ = [p[i] for i in range(nxk)]
                    x = _read_vec(X_ref, k, nxk)
                    u = _read_vec(u_out, k, NU)
                    r = cached_rows(k)
                    dXk = _read_vec(dX_scr, k, nxk)
                    dUk = _read_vec(dU_scr, k, NU)
                    algr, _ = ip_weights(
                        r, bounds_k, dXk, dUk,
                        _read_vec(slo_scr, k, nr), _read_vec(shi_scr, k, nr),
                        _read_vec(zlo_out, k, nr), _read_vec(zhi_out, k, nr),
                        mu_b)
                    x_c = [x[i] + dXk[i] for i in range(nxk)]
                    u_c = [u[i] + dUk[i] for i in range(NU)]
                    Q, R, M, qx, qu = _assemble_quad(
                        r, algr, x_c, u_c, _read_vec(xref_ref, k, nxk),
                        wq, wr, False)
                    if fill_ab:
                        A, Bm = lin_f(x, u)
                        ab = [zero + A[i][j2] for i in range(nxk)
                              for j2 in range(nxk)]
                        ab += [zero + Bm[i][j2] for i in range(nxk)
                               for j2 in range(NU)]
                        ab_scr[k] = jnp.stack(ab)
                    else:
                        A, Bm = cached_ab(k)

                    At = [[A[i][j2] for i in range(nxk)] for j2 in range(nxk)]
                    Bt = [[Bm[i][j2] for i in range(nxk)] for j2 in range(NU)]
                    PA = [[sum(Pl[i][t] * A[t][j2] for t in range(nxk))
                           for j2 in range(nxk)] for i in range(nxk)]
                    PB = [[sum(Pl[i][t] * Bm[t][j2] for t in range(nxk))
                           for j2 in range(NU)] for i in range(nxk)]
                    Qxx = [[Q[i][j2] + sum(At[i][t] * PA[t][j2]
                                           for t in range(nxk))
                            for j2 in range(nxk)] for i in range(nxk)]
                    Quu = [[R[i][j2] + sum(Bt[i][t] * PB[t][j2]
                                           for t in range(nxk))
                            for j2 in range(NU)] for i in range(NU)]
                    Mt = [[M[i][j2] for i in range(nxk)] for j2 in range(NU)]
                    Qux = [[Mt[i][j2] + sum(Bt[i][t] * PA[t][j2]
                                            for t in range(nxk))
                            for j2 in range(nxk)] for i in range(NU)]
                    gx = [qx[i] + sum(At[i][t] * pl_[t] for t in range(nxk))
                          for i in range(nxk)]
                    gu = [qu[i] + sum(Bt[i][t] * pl_[t] for t in range(nxk))
                          for i in range(NU)]

                    a = Quu[0][0] + reg
                    b = Quu[0][1]
                    c = Quu[1][0]
                    dd2 = Quu[1][1] + reg
                    inv_det = 1.0 / (a * dd2 - b * c)
                    Qi = [[dd2 * inv_det, -b * inv_det],
                          [-c * inv_det, a * inv_det]]
                    Kk = [[-(Qi[i][0] * Qux[0][j2] + Qi[i][1] * Qux[1][j2])
                           for j2 in range(nxk)] for i in range(NU)]
                    dk = [-(Qi[i][0] * gu[0] + Qi[i][1] * gu[1])
                          for i in range(NU)]
                    K_scr[k] = jnp.stack(
                        [Kk[i][j2] for i in range(NU) for j2 in range(nxk)])
                    dff_scr[k] = jnp.stack(dk)

                    QuxT = [[Qux[i][j2] for i in range(NU)]
                            for j2 in range(nxk)]
                    P_new = [[Qxx[i][j2]
                              + QuxT[i][0] * Kk[0][j2]
                              + QuxT[i][1] * Kk[1][j2]
                              for j2 in range(nxk)] for i in range(nxk)]
                    P_sym = jnp.stack([
                        jnp.stack([0.5 * (P_new[i][j2] + P_new[j2][i])
                                   for j2 in range(nxk)])
                        for i in range(nxk)])
                    p_new = jnp.stack([gx[i] + QuxT[i][0] * dk[0]
                                       + QuxT[i][1] * dk[1]
                                       for i in range(nxk)])
                    return (P_sym, p_new)

                P0 = jnp.stack([jnp.stack(QH[i]) for i in range(nxk)])
                p0 = jnp.stack(qH)
                jax.lax.fori_loop(0, H, bwd_body, (P0, p0))

                # linear forward pass: ddx_0 = 0 (x0 pinned)
                def fwd_body(k, ddx):
                    ddxl = [ddx[i] for i in range(nxk)]
                    ddX_scr[k] = ddx
                    Kk = _read_vec(K_scr, k, NU * nxk)
                    dk = _read_vec(dff_scr, k, NU)
                    ddu = [dk[i] + sum(Kk[i * nxk + j2] * ddxl[j2]
                                       for j2 in range(nxk))
                           for i in range(NU)]
                    ddU_scr[k] = jnp.stack(ddu)
                    A, Bm = cached_ab(k)
                    nxt = [sum(A[i][j2] * ddxl[j2] for j2 in range(nxk))
                           + sum(Bm[i][j2] * ddu[j2] for j2 in range(NU))
                           for i in range(nxk)]
                    return jnp.stack(nxt)

                ddxH = jax.lax.fori_loop(0, H, fwd_body,
                                         jnp.stack([zero] * nxk))
                ddX_scr[H] = ddxH

                # slack/dual steps + fraction-to-boundary ratios
                def steps_stage(k, bounds, is_term, amin):
                    r = cached_rows(k)
                    dXk = _read_vec(dX_scr, k, nxk)
                    dUk = zero_u if is_term else _read_vec(dU_scr, k, NU)
                    ddXk = _read_vec(ddX_scr, k, nxk)
                    ddUk = zero_u if is_term else _read_vec(ddU_scr, k, NU)
                    cs = _row_lin(r, bounds, dXk, dUk)
                    Jd = _row_lin(r, bounds, ddXk, ddUk)
                    Jd = [Jd[i] - cs_raw for i, cs_raw
                          in enumerate(_row_values(r))]
                    slo = _read_vec(slo_scr, k, nr)
                    shi = _read_vec(shi_scr, k, nr)
                    zlo = _read_vec(zlo_out, k, nr)
                    zhi = _read_vec(zhi_out, k, nr)
                    dslo_n, dshi_n, dzlo_n, dzhi_n = [], [], [], []

                    def ftb(v, dv, am):
                        neg = dv < 0
                        ratio = jnp.where(
                            neg, -v / jnp.where(neg, dv, -1.0), big)
                        return jnp.minimum(am, ratio)

                    for i, (lo, hi) in enumerate(bounds):
                        if lo is not None:
                            rs_lo = slo[i] - (cs[i] - lo)
                            sg = zlo[i] / slo[i]
                            dsl = Jd[i] - rs_lo
                            dzl = mu_b / slo[i] - zlo[i] - sg * dsl
                            amin = ftb(slo[i], dsl, amin)
                            amin = ftb(zlo[i], dzl, amin)
                        else:
                            dsl = zero
                            dzl = zero
                        if hi is not None:
                            rs_hi = shi[i] - (hi - cs[i])
                            sg = zhi[i] / shi[i]
                            dsh = -Jd[i] - rs_hi
                            dzh = mu_b / shi[i] - zhi[i] - sg * dsh
                            amin = ftb(shi[i], dsh, amin)
                            amin = ftb(zhi[i], dzh, amin)
                        else:
                            dsh = zero
                            dzh = zero
                        dslo_n.append(dsl)
                        dshi_n.append(dsh)
                        dzlo_n.append(dzl)
                        dzhi_n.append(dzh)
                    dslo_scr[k] = jnp.stack(dslo_n)
                    dshi_scr[k] = jnp.stack(dshi_n)
                    dzlo_scr[k] = jnp.stack(dzlo_n)
                    dzhi_scr[k] = jnp.stack(dzhi_n)
                    return amin

                amin = jax.lax.fori_loop(
                    0, H, lambda k, am: steps_stage(k, bounds_k, False, am),
                    jnp.full_like(zero, big))
                amin = steps_stage(H, bounds_T, True, amin)
                alpha = jnp.minimum(1.0, _TAU * amin)

                # apply + complementarity gap accumulation
                def apply_stage(k, bounds, is_term, gap):
                    dX_scr[k] = dX_scr[k] + alpha * ddX_scr[k]
                    if not is_term:
                        dU_scr[k] = dU_scr[k] + alpha * ddU_scr[k]
                    slo = _read_vec(slo_scr, k, nr)
                    shi = _read_vec(shi_scr, k, nr)
                    zlo = _read_vec(zlo_out, k, nr)
                    zhi = _read_vec(zhi_out, k, nr)
                    dslo = _read_vec(dslo_scr, k, nr)
                    dshi = _read_vec(dshi_scr, k, nr)
                    dzlo = _read_vec(dzlo_scr, k, nr)
                    dzhi = _read_vec(dzhi_scr, k, nr)
                    slo_n, shi_n, zlo_n, zhi_n = [], [], [], []
                    for i, (lo, hi) in enumerate(bounds):
                        if lo is not None:
                            sl = jnp.maximum(slo[i] + alpha * dslo[i],
                                             _S_FLOOR)
                            zl = jnp.minimum(zlo[i] + alpha * dzlo[i],
                                             _Z_MAX)
                            gap = gap + sl * zl
                        else:
                            sl = jnp.ones_like(zero)
                            zl = zero
                        if hi is not None:
                            sh = jnp.maximum(shi[i] + alpha * dshi[i],
                                             _S_FLOOR)
                            zh = jnp.minimum(zhi[i] + alpha * dzhi[i],
                                             _Z_MAX)
                            gap = gap + sh * zh
                        else:
                            sh = jnp.ones_like(zero)
                            zh = zero
                        slo_n.append(sl)
                        shi_n.append(sh)
                        zlo_n.append(zl)
                        zhi_n.append(zh)
                    slo_scr[k] = jnp.stack(slo_n)
                    shi_scr[k] = jnp.stack(shi_n)
                    zlo_out[k] = jnp.stack(zlo_n)
                    zhi_out[k] = jnp.stack(zhi_n)
                    return gap

                gap = jax.lax.fori_loop(
                    0, H, lambda k, g: apply_stage(k, bounds_k, False, g),
                    zero)
                gap = apply_stage(H, bounds_T, True, gap)
                return jnp.maximum(_SIGMA_B * gap / n_act, _MU_MIN)

            # peel Newton iteration 0 (fills the (A, B) cache in its
            # backward sweep); the rest read cached Jacobians
            mu_b0 = jnp.full_like(zero, _MU0)
            if cfg.ip_iters > 0:
                mu_b1 = newton_impl(mu_b0, True)
                jax.lax.fori_loop(
                    1, cfg.ip_iters,
                    lambda _it, mu_b: newton_impl(mu_b, False), mu_b1)

            # --- RTI exact-penalty line search over the dU direction --------
            # (guard NaN directions like sqp._solve_ip's nan_to_num)
            def scrub(k, _):
                d = dU_scr[k]
                dU_scr[k] = jnp.where(jnp.isfinite(d), d, 0.0)
                return 0

            jax.lax.fori_loop(0, H, scrub, 0)
            ones = jnp.ones_like(zero)
            if len(cfg.ip_alphas) == 0:
                # unguarded RTI (reference maxqps=1 semantics): apply the
                # full step with no merit test — ONE rollout instead of
                # len(ladder)+2; the big warm-path lever (VERDICT r4 #2)
                penalty_merit_rollout(ones, write=True, merit=False)
            else:
                best_m = penalty_merit_rollout(zero, write=False)
                best_a = zero
                for a_val in cfg.ip_alphas:
                    m_a = penalty_merit_rollout(a_val * ones, write=False)
                    take = m_a < best_m
                    best_m = jnp.where(take, m_a, best_m)
                    best_a = jnp.where(take, a_val * ones, best_a)
                penalty_merit_rollout(best_a, write=True)
            return 0

        jax.lax.fori_loop(0, cfg.ip_sqp_iters, sqp_body, 0)

        # ==== diagnostics ===================================================
        # viol rows + max, cost, Lagrangian stationarity with the final QP
        # duals lam = z_hi - z_lo (sqp._solve_ip:642-661 semantics).  Rows
        # at the final iterate come from the cache: the merit write pass
        # (or, at ip_sqp_iters=0, the initial rollout) stored them.
        xT = _read_vec(X_ref, H, nxk)
        rT = cached_rows(H)
        xrefT = _read_vec(xref_ref, H, nxk)
        lamT_rows = [zhi_out[H][i] - zlo_out[H][i] for i in range(nr)]
        algT = [(lamT_rows[i], zero) for i in range(nr)]
        _, qHd = _assemble_quad(rT, algT, xT, zero_u, xrefT, wq, wr, True,
                                wqN, cfg.use_terminal_cost)
        hs_T = _row_values(rT)
        violT = zero
        pv_T = []
        for i, (lo, hi) in enumerate(bounds_T):
            vi = zero
            if hi is not None:
                vi = jnp.maximum(vi, hs_T[i] - hi)
            if lo is not None:
                vi = jnp.maximum(vi, lo - hs_T[i])
            vi = jnp.maximum(vi, 0.0)
            pv_T.append(vi)
            violT = jnp.maximum(violT, vi * inv_scale[i])
        pviol_out[H] = jnp.stack(pv_T)
        cost_T = (_term_cost_rows(xT, xrefT, wqN)
                  if cfg.use_terminal_cost else zero)

        def diag_body(j, carry):
            lam, stat, viol, cost = carry
            k = H - 1 - j
            laml = [lam[i] for i in range(nxk)]
            x = _read_vec(X_ref, k, nxk)
            u = _read_vec(u_out, k, NU)
            r = cached_rows(k)
            xref_k = _read_vec(xref_ref, k, nxk)
            lam_rows = [zhi_out[k][i] - zlo_out[k][i] for i in range(nr)]
            algr = [(lam_rows[i], zero) for i in range(nr)]
            _, _, _, qx, qu = _assemble_quad(r, algr, x, u, xref_k, wq, wr,
                                             False)
            A, Bm = lin_f(x, u)
            g_u = [qu[i] + sum(Bm[t][i] * laml[t] for t in range(nxk))
                   for i in range(NU)]
            lam_new = jnp.stack(
                [qx[i] + sum(A[t][i] * laml[t] for t in range(nxk))
                 for i in range(nxk)])
            stat = jnp.maximum(stat, jnp.maximum(jnp.abs(g_u[0]),
                                                 jnp.abs(g_u[1])))
            hs = _row_values(r)
            pv = []
            for i, (lo, hi) in enumerate(bounds_k):
                vi = zero
                if hi is not None:
                    vi = jnp.maximum(vi, hs[i] - hi)
                if lo is not None:
                    vi = jnp.maximum(vi, lo - hs[i])
                vi = jnp.maximum(vi, 0.0)
                pv.append(vi)
                viol = jnp.maximum(viol, vi * inv_scale[i])
            pviol_out[k] = jnp.stack(pv)
            cost = cost + _stage_cost_rows(x, u, xref_k, wq, wr)
            return (lam_new, stat, viol, cost)

        _, stat, viol, cost = jax.lax.fori_loop(
            0, H, diag_body, (jnp.stack(qHd), zero, violT, cost_T))
        diag_ref[0] = stat
        diag_ref[1] = viol
        diag_ref[2] = cost
        diag_ref[3] = cost

    return kernel


def eligible_ip(cfg: S.SolverConfig, params: S.OcpParams) -> bool:
    return (cfg.method == "ip" and cfg.model in ("ks", "st")
            and (not cfg.boundary_rows or params.boundaries is not None)
            and params.obs_centers.ndim in (3, 4)  # static or moving
            and params.x_ref.shape[-1] in (NX, S.solver_nx(cfg)))


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("interpret",))
def _solve_ip_packed(cfg, x0p, xrefp, obsp, mindp, wp, bndp, Up, zlp, zhp,
                     interpret=False):
    tiles = x0p.shape[0]
    H = cfg.horizon
    moving = obsp.ndim == 5  # (tiles, H+1, 6, 8, 128)
    nr = zlp.shape[2]        # NROWS (+6 with boundary rows)
    nx = x0p.shape[1]        # 5 (KS) or 7 (ST)
    kernel = _make_ip_kernel(cfg, H, moving)

    def tile_spec(*mid):
        nd = len(mid)
        return pl.BlockSpec((1,) + mid + (_SUB, _LANES),
                            lambda t: (t,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    def squeezed(*refs):
        ins = refs[:9]
        outs = refs[9:15]
        scr = refs[15:]
        kernel(*[r.at[0] for r in ins], *[r.at[0] for r in outs], *scr)

    dtype = x0p.dtype
    out_shape = (
        jax.ShapeDtypeStruct((tiles, H + 1, nx, _SUB, _LANES), dtype),  # X
        jax.ShapeDtypeStruct(Up.shape, dtype),
        jax.ShapeDtypeStruct(zlp.shape, dtype),
        jax.ShapeDtypeStruct(zhp.shape, dtype),
        jax.ShapeDtypeStruct(zlp.shape, dtype),   # per-row viol
        jax.ShapeDtypeStruct((tiles, 4, _SUB, _LANES), dtype),  # diag
    )

    def nr_scr():
        return pltpu.VMEM((H + 1, nr, _SUB, _LANES), dtype)

    return pl.pallas_call(
        squeezed,
        grid=(tiles,),
        in_specs=[
            tile_spec(nx), tile_spec(H + 1, nx),
            tile_spec(H + 1, 6) if moving else tile_spec(6), tile_spec(1),
            tile_spec(nx + NU + nx),
            # boundary-row linear models, or a 1-wide dummy when disabled
            tile_spec(H + 1, 18) if cfg.boundary_rows else tile_spec(1),
            tile_spec(H, NU), tile_spec(H + 1, nr), tile_spec(H + 1, nr),
        ],
        out_specs=(
            tile_spec(H + 1, nx), tile_spec(H, NU), tile_spec(H + 1, nr),
            tile_spec(H + 1, nr), tile_spec(H + 1, nr), tile_spec(4),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((H, NU * nx, _SUB, _LANES), dtype),   # K
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # d (Riccati)
            pltpu.VMEM((H + 1, nx, _SUB, _LANES), dtype),    # dX
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # dU
            pltpu.VMEM((H + 1, nx, _SUB, _LANES), dtype),    # ddX
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # ddU
            nr_scr(), nr_scr(),                              # s_lo, s_hi
            nr_scr(), nr_scr(), nr_scr(), nr_scr(),          # ds/dz lo/hi
            # outer-iterate linearization cache: packed rows + (A, B)
            pltpu.VMEM((H + 1, 44 + (24 if cfg.boundary_rows else 0),
                        _SUB, _LANES), dtype),
            pltpu.VMEM((H, nx * (nx + NU), _SUB, _LANES), dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0p, xrefp, obsp, mindp, wp, bndp, Up, zlp, zhp)


def solve_batch_fused_ip(cfg: S.SolverConfig, params: S.OcpParams,
                         state: S.SqpState,
                         interpret: bool = False) -> S.Solution:
    """Fused-kernel batched hard-constrained solve; contract of
    ``sqp.solve_batch`` with ``method='ip'``.

    Falls back to the vmapped ``sqp.solve_batch`` when the problem shape is
    outside the kernel envelope (see :func:`eligible_ip`).
    """
    if not eligible_ip(cfg, params):
        return S.solve_batch(cfg, params, state)
    interpret = interpret or jax.default_backend() != "tpu"

    # widen KS-schema params to the configured model's nx (ST)
    params = S.normalize_params(cfg, params)
    nx = S.solver_nx(cfg)
    B = params.x0.shape[0]
    padB = _cdiv(B, LANE_TILE) * LANE_TILE
    dtype = params.x0.dtype

    def pad_rows(x, row):
        if padB == B:
            return x
        fill = jnp.broadcast_to(jnp.asarray(row, x.dtype),
                                (padB - B,) + x.shape[1:])
        return jnp.concatenate([x, fill], axis=0)

    benign_x = np.zeros((nx,), np.float32)
    benign_x[3] = 1.0
    x0p = _pack(pad_rows(params.x0, benign_x), padB)
    xrefp = _pack(pad_rows(params.x_ref, benign_x), padB)
    obs_flat = params.obs_centers.reshape(
        (B, 6) if params.obs_centers.ndim == 3
        else (B, cfg.horizon + 1, 6))
    obsp = _pack(pad_rows(obs_flat, -1e4), padB)
    mindp = _pack(pad_rows(
        jnp.broadcast_to(params.min_dist.reshape(-1, 1), (B, 1)), 0.0), padB)
    wp = _pack(pad_rows(jnp.concatenate(
        [params.weights.q, params.weights.r, params.weights.qN], axis=-1),
        1.0), padB)
    Up = _pack(state.U, padB)
    zlp = _pack(state.lam_lo, padB)
    zhp = _pack(state.lam_hi, padB)
    if cfg.boundary_rows:
        from mpc_tpu.models import constraints as C
        from mpc_tpu.ops.fused_gn import linearize_boundaries
        X0 = jax.vmap(lambda p, U1: S._rollout(cfg, p, U1))(params.x0,
                                                            state.U)
        bnd = linearize_boundaries(cfg, X0, params.boundaries,
                                   params.boundary_signs)
        r_ego = C.approx_circle_radius(cfg.ego_length, cfg.ego_width)[0]
        pad_bnd = np.zeros((18,), np.float32)
        pad_bnd[2::3] = r_ego + 1.0
        bndp = _pack(pad_rows(bnd, pad_bnd), padB)
    else:
        bndp = _pack(jnp.zeros((B, 1), dtype), padB)

    Xp, Unew, zlo, zhi, pvn, diag = _solve_ip_packed(
        cfg, x0p, xrefp, obsp, mindp, wp, bndp, Up, zlp, zhp,
        interpret=interpret)

    X = _unpack(Xp, B)
    U = _unpack(Unew, B)
    z_lo = _unpack(zlo, B)
    z_hi = _unpack(zhi, B)
    prev_viol = _unpack(pvn, B)
    diag = _unpack(diag, B)
    stat, viol, cost = diag[:, 0], diag[:, 1], diag[:, 2]

    converged = (stat < cfg.tol_stat_ip) & (viol < cfg.tol_feas)
    feasible = viol < jnp.asarray(cfg.tol_infeas, dtype)
    status = jnp.where(converged, 1,
                       jnp.where(feasible, 0, -7)).astype(jnp.int32)
    new_state = S.SqpState(U=U, lam_lo=z_lo, lam_hi=z_hi, mu=state.mu,
                           prev_viol=prev_viol)
    return S.Solution(X=X, U=U, state=new_state, status=status,
                      kkt_stat=stat, viol=viol, cost=cost, merit=cost)
