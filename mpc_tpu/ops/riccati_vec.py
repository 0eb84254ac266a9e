"""Lanes-trailing ("struct of vectors") hot-path kernels at the XLA level.

The straightforward batched formulation keeps tensors as (B, H, 5, 5): XLA
tiles the trailing (5, 5) onto (8, 128) vector registers, wasting ~96% of
each tile and inflating HBM traffic inside the sequential scans ~40x (the
measured bottleneck — see the ablation notes in bench history).  Here every
tiny matrix entry is a ROW over the lane axis: tensors are (H, feat, B) and
the 5x5 algebra unrolls into elementwise ops on (B,)-vectors, giving exact
(8, 128) tiling when B is a multiple of 128 (lanes pad otherwise).

Provides drop-in batched equivalents of:
  * ``riccati.backward_pass``  -> ``backward_pass_vec``
  * the iLQR feedback rollout + box clamp -> ``feedback_rollout_vec``
    (all line-search alphas in one pass)

Used by the batched throughput path (``ops.sqp_vec.solve_batch_vec``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mpc_tpu.ops.riccati import LinDyn, RiccatiGains, StageQuad

NX = 5  # KS default; both kernels derive the actual NX from their inputs
NU = 2


def _to_rows(x: jax.Array, feat: int) -> jax.Array:
    """(B, H, ...) -> (H, feat, B)."""
    B, H = x.shape[0], x.shape[1]
    return jnp.moveaxis(x.reshape(B, H, feat), 0, -1)


def _from_rows(x: jax.Array, shape) -> jax.Array:
    """(H, feat, B) -> (B, H, *shape)."""
    H, feat, B = x.shape
    return jnp.moveaxis(x, -1, 0).reshape(B, H, *shape)


def _mat(v, n, m):
    """(n*m, B) -> row-list [[ (B,) ]]."""
    return [[v[i * m + j] for j in range(m)] for i in range(n)]


def _mm(a, b, n, k, m):
    return [[sum(a[i][t] * b[t][j] for t in range(k)) for j in range(m)]
            for i in range(n)]


def _mt(a, n, m):
    return [[a[i][j] for i in range(n)] for j in range(m)]


def _madd(a, b, n, m):
    return [[a[i][j] + b[i][j] for j in range(m)] for i in range(n)]


def _mv(a, x, n, m):
    return [sum(a[i][j] * x[j] for j in range(m)) for i in range(n)]


def _stack(rows, n, m):
    return jnp.stack([rows[i][j] for i in range(n) for j in range(m)])


def backward_pass_vec(quad: StageQuad, QH: jax.Array, qH: jax.Array,
                      dyn: LinDyn, reg) -> RiccatiGains:
    """Batched backward sweep; inputs have leading (B, H, ...) axes.

    Returns gains with leading lane axis (same contract as vmapped
    ``riccati.backward_pass``); dV1/dV2 are (B,).  NX is derived from the
    inputs (5 for KS, 7 for ST); NU must be 2 (closed-form Quu inverse).
    """
    NX = quad.Q.shape[-1]
    assert quad.R.shape[-1] == NU, "backward_pass_vec assumes NU == 2"
    Qr = _to_rows(quad.Q, NX * NX)
    Rr = _to_rows(quad.R, NU * NU)
    Mr = _to_rows(quad.M, NX * NU)
    qxr = _to_rows(quad.qx, NX)
    qur = _to_rows(quad.qu, NU)
    Ar = _to_rows(dyn.A, NX * NX)
    Br = _to_rows(dyn.B, NX * NU)
    rr = _to_rows(dyn.r, NX)
    B_lanes = Qr.shape[-1]
    dtype = Qr.dtype

    PH = jnp.moveaxis(QH.reshape(-1, NX * NX), 0, -1)  # (25, B)
    pH = jnp.moveaxis(qH, 0, -1)                        # (5, B)

    def step(carry, stage):
        Pv, pv = carry
        Q, R, M, qx, qu, A, Bm, r = stage
        P = _mat(Pv, NX, NX)
        p = [pv[i] for i in range(NX)]
        Qm = _mat(Q, NX, NX)
        Rm = _mat(R, NU, NU)
        Mm = _mat(M, NX, NU)
        Am = _mat(A, NX, NX)
        Bmm = _mat(Bm, NX, NU)
        qxv = [qx[i] for i in range(NX)]
        quv = [qu[i] for i in range(NU)]
        rv = [r[i] for i in range(NX)]

        At = _mt(Am, NX, NX)
        Bt = _mt(Bmm, NX, NU)
        PA = _mm(P, Am, NX, NX, NX)
        PB = _mm(P, Bmm, NX, NX, NU)
        Prp = [p[i] + sum(P[i][k2] * rv[k2] for k2 in range(NX))
               for i in range(NX)]
        Qxx = _madd(Qm, _mm(At, PA, NX, NX, NX), NX, NX)
        Quu = _madd(Rm, _mm(Bt, PB, NU, NX, NU), NU, NU)
        Qux = _madd(_mt(Mm, NX, NU), _mm(Bt, PA, NU, NX, NX), NU, NX)
        gx = [qxv[i] + sum(At[i][k2] * Prp[k2] for k2 in range(NX))
              for i in range(NX)]
        gu = [quv[i] + sum(Bt[i][k2] * Prp[k2] for k2 in range(NX))
              for i in range(NU)]

        a = Quu[0][0] + reg
        b = Quu[0][1]
        c = Quu[1][0]
        dd = Quu[1][1] + reg
        inv_det = 1.0 / (a * dd - b * c)
        Qi = [[dd * inv_det, -b * inv_det], [-c * inv_det, a * inv_det]]
        K = [[-(Qi[i][0] * Qux[0][j] + Qi[i][1] * Qux[1][j])
              for j in range(NX)] for i in range(NU)]
        d = [-(Qi[i][0] * gu[0] + Qi[i][1] * gu[1]) for i in range(NU)]

        QuxT = _mt(Qux, NU, NX)
        P_new = _madd(Qxx, _mm(QuxT, K, NX, NU, NX), NX, NX)
        P_sym = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(NX)]
                 for i in range(NX)]
        p_new = [gx[i] + QuxT[i][0] * d[0] + QuxT[i][1] * d[1]
                 for i in range(NX)]

        dv1 = d[0] * gu[0] + d[1] * gu[1]
        qd0 = (Quu[0][0] + reg) * d[0] + Quu[0][1] * d[1]
        qd1 = Quu[1][0] * d[0] + (Quu[1][1] + reg) * d[1]
        dv2 = d[0] * qd0 + d[1] * qd1
        out = (_stack(K, NU, NX), jnp.stack(d), dv1, dv2)
        return (_stack(P_sym, NX, NX), jnp.stack(p_new)), out

    (_, _), (Kr, dr, dv1, dv2) = jax.lax.scan(
        step, (PH, pH), (Qr, Rr, Mr, qxr, qur, Ar, Br, rr), reverse=True)
    K = _from_rows(Kr, (NU, NX))
    d = _from_rows(dr, (NU,))
    return RiccatiGains(K=K, d=d, dV1=jnp.sum(dv1, axis=0),
                        dV2=jnp.sum(dv2, axis=0))


def _ode_rows(model: str, wheelbase: float, vehicle=None):
    """Rows-form ODE: x is an NX-list of same-shape arrays, u an NU-list.

    Mirrors ``models.dynamics.ks_ode`` / ``st_ode`` entrywise so the
    lanes-trailing rollout never materializes (…, NX) state vectors.
    """
    if model == "ks":
        def ode(x, u):
            v, delta, psi = x[3], x[2], x[4]
            return [v * jnp.cos(psi), v * jnp.sin(psi), u[0], u[1],
                    v / wheelbase * jnp.tan(delta)]
        return ode
    if model != "st":
        raise ValueError(f"unknown model '{model}'")
    if vehicle is None:
        raise ValueError("model='st' requires vehicle")
    g = 9.81
    mu = vehicle.tire.p_dy1
    C_Sf = -vehicle.tire.p_ky1 / vehicle.tire.p_dy1
    C_Sr = C_Sf
    lf, lr = vehicle.a, vehicle.b
    l = lf + lr
    h, m, I = vehicle.h_s, vehicle.m, vehicle.I_z

    def ode(x, u):
        delta, v, psi, psi_dot, beta = x[2], x[3], x[4], x[5], x[6]
        u0, u1 = u[0], u[1]
        beta_kin = jnp.arctan(jnp.tan(delta) * lr / l)
        v_safe = jnp.where(jnp.abs(v) < 1e-3, 1e-3, v)
        f_low_psi = v * jnp.cos(beta_kin) * jnp.tan(delta) / l
        d_beta = (lr * u0) / (l * jnp.cos(delta) ** 2
                              * (1.0 + (jnp.tan(delta) ** 2 * lr / l) ** 2))
        dd_psi = (1.0 / l) * (
            u1 * jnp.cos(beta) * jnp.tan(delta)
            - v * jnp.sin(beta) * d_beta * jnp.tan(delta)
            + v * jnp.cos(beta) * u0 / jnp.cos(delta) ** 2)
        f_low = [v * jnp.cos(beta_kin + psi), v * jnp.sin(beta_kin + psi),
                 u0, u1, f_low_psi, dd_psi, d_beta]
        f_high = [
            v * jnp.cos(beta + psi),
            v * jnp.sin(beta + psi),
            u0, u1,
            psi_dot,
            -mu * m / (v_safe * I * (lr + lf))
            * (lf ** 2 * C_Sf * (g * lr - u1 * h)
               + lr ** 2 * C_Sr * (g * lf + u1 * h)) * psi_dot
            + mu * m / (I * (lr + lf))
            * (lr * C_Sr * (g * lf + u1 * h)
               - lf * C_Sf * (g * lr - u1 * h)) * beta
            + mu * m / (I * (lr + lf)) * lf * C_Sf
            * (g * lr - u1 * h) * delta,
            (mu / (v_safe ** 2 * (lr + lf))
             * (C_Sr * (g * lf + u1 * h) * lr
                - C_Sf * (g * lr - u1 * h) * lf) - 1.0) * psi_dot
            - mu / (v_safe * (lr + lf))
            * (C_Sr * (g * lf + u1 * h) + C_Sf * (g * lr - u1 * h)) * beta
            + mu / (v_safe * (lr + lf))
            * (C_Sf * (g * lr - u1 * h)) * delta,
        ]
        low = jnp.abs(v) < 0.1
        return [jnp.where(low, flo, fhi) for flo, fhi in zip(f_low, f_high)]
    return ode


def feedback_rollout_vec(step_ode, dt: float, wheelbase: float,
                         x0: jax.Array, X_bar: jax.Array, U_bar: jax.Array,
                         K: jax.Array, d: jax.Array,
                         alphas: Sequence[float],
                         u_lo: jax.Array, u_hi: jax.Array,
                         integrator: str, model: str = "ks", vehicle=None):
    """Box-clamped iLQR forward pass for ALL alphas in lanes-trailing form.

    x0: (B, NX); X_bar: (B, H+1, NX); U_bar: (B, H, NU); K: (B, H, NU, NX);
    d: (B, H, NU).  Returns Xa: (A, B, H+1, NX), Ua: (A, B, H, NU).
    NX is derived from x0 (5 for KS, 7 for ST).
    """
    A = len(alphas)
    B_lanes = x0.shape[0]
    NX = x0.shape[-1]
    dtype = x0.dtype
    al = jnp.asarray(alphas, dtype)[:, None]  # (A, 1)

    Xb = _to_rows(X_bar[:, :-1], NX)   # (H, NX, B)
    Ub = _to_rows(U_bar, NU)
    Kr = _to_rows(K, NU * NX)
    dr = _to_rows(d, NU)

    x_init = jnp.broadcast_to(jnp.moveaxis(x0, 0, -1)[None], (A, NX, B_lanes))

    ode = _ode_rows(model, wheelbase, vehicle)

    def add(x, s, k):
        return [x[i] + s * k[i] for i in range(NX)]

    def step(carry, stage):
        xa = carry  # (A, 5, B)
        xb, ub, kr, dv = stage
        x = [xa[:, i] for i in range(NX)]           # (A, B) rows
        Km = _mat(kr, NU, NX)                        # rows (B,)
        dxb = [x[i] - xb[i][None] for i in range(NX)]  # (A, B)
        u = []
        for i in range(NU):
            fb = sum(Km[i][j][None] * dxb[j] for j in range(NX))
            ui = ub[i][None] + al * dv[i][None] + fb
            u.append(jnp.clip(ui, u_lo[i], u_hi[i]))
        if integrator == "rk4":
            k1 = ode(x, u)
            k2 = ode(add(x, dt / 2, k1), u)
            k3 = ode(add(x, dt / 2, k2), u)
            k4 = ode(add(x, dt, k3), u)
            x_next = [x[i] + dt / 6 * (k1[i] + 2 * k2[i] + 2 * k3[i]
                                       + k4[i]) for i in range(NX)]
        else:
            k1 = ode(x, u)
            x_next = add(x, dt, k1)
        return jnp.stack(x_next, axis=1), (jnp.stack(x, axis=1),
                                           jnp.stack(u, axis=1))

    x_H, (Xs, Us) = jax.lax.scan(step, x_init, (Xb, Ub, Kr, dr))
    # Xs: (H, A, 5, B) -> (A, B, H, 5)
    Xa = jnp.moveaxis(Xs, (0, 1, 2, 3), (2, 0, 3, 1))
    Xa = jnp.concatenate(
        [Xa, jnp.moveaxis(x_H, (0, 1, 2), (0, 2, 1))[:, :, None]], axis=2)
    Ua = jnp.moveaxis(Us, (0, 1, 2, 3), (2, 0, 3, 1))
    return Xa, Ua
