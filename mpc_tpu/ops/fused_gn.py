"""Fused Pallas TPU kernel: the ENTIRE batched AL-SQP solve in one launch.

Round-1 fused only the Riccati backward sweep (now retired to
``tools/ablation/pallas_riccati.py``) and
lost to XLA because the win was never the sweep: the GN-phase breakdown at
B=2048/H=30 (``tools/gn_breakdown.py``, PARITY.md) shows the jacfwd-built
(B, H+1, 14, 7) row Jacobian + einsum Gauss-Newton assembly and the HBM
round-trips BETWEEN phases dominate.  This kernel runs the full solve —

    for al_iters:                      # outer multiplier updates
        for sqp_iters:                 # Gauss-Newton iterations
            analytic stage quadratics  (closed-form row gradients; no
                                        jacfwd, no (B,H,14,7) Jacobian)
            Riccati backward sweep     (closed-form 2x2 Quu inverse)
            merit ladder               (per-alpha rollouts, merit only)
            apply rollout              (per-lane best alpha)
        multiplier / penalty update
    diagnostics pass                   (viol, cost, merit, KKT stationarity
                                        via the analytic adjoint recursion)

— per 1024-lane tile with EVERYTHING resident in VMEM: states, inputs,
multipliers, gains.  No (B, H, ...) intermediate ever round-trips HBM.

Layout (the tiny-matrix trick, SURVEY.md §7 "hard parts"): every per-lane
scalar is an (8, 128) vector register over the 1024-lane tile; 5x5 algebra
unrolls into VPU FMAs on those registers (same convention as
``ops.riccati_vec``).

Key trick for the line search: the iLQR iterate is always dynamics-
consistent, so a feedback rollout at alpha=0 reproduces (X, U) exactly.
"No improvement" is therefore just alpha_eff = 0, and the per-lane best
alpha is applied in ONE extra rollout — no candidate trajectories are ever
stored or where-selected.

Eligibility: KS or ST model (ST Jacobians via the in-kernel dual-number
forward mode), method='al', NU=2; static ((B, 3, 2)) or moving
((B, H+1, 3, 2) per-stage) obstacle centers; optional road-boundary rows
via per-stage linearization at the warm-start trajectory
(``linearize_boundaries`` — exact for straight boundary segments,
refreshed every solve in closed loop).  ``solve_batch_fused`` falls back
to ``sqp_vec.solve_batch_vec`` otherwise.  Equivalence with the vmapped
reference solver is tested in ``tests/test_fused_gn.py`` (interpret mode
on CPU, compiled on TPU).

Reference analog: the whole generated FORCESPRO C solver
(``test/FORCESNLPsolver/lib/``) — one self-contained native solve per call.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_tpu.models import constraints as C
from mpc_tpu.ops import sqp as S

NX = 5
NU = 2
NR = 14            # 1 friction + 9 circles + 4 box rows
LANE_TILE = 1024
_SUB = 8
_LANES = 128


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# packing: (B, ...) -> (tiles, ..., 8, 128)
# ---------------------------------------------------------------------------


def _pack(x: jax.Array, padB: int) -> jax.Array:
    """(B, *mid) -> (tiles, *mid_flat..., 8, 128) keeping mid axes intact.

    Works for (B,), (B, F), (B, H, F): the lane axis moves to the trailing
    (8, 128) register shape; other axes keep their order.
    """
    B = x.shape[0]
    mid = x.shape[1:]
    if padB != B:
        pad = jnp.zeros((padB - B,) + mid, x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    tiles = padB // LANE_TILE
    x = x.reshape((tiles, LANE_TILE) + mid)
    x = jnp.moveaxis(x, 1, -1)  # (tiles, *mid, LANE_TILE)
    return x.reshape((tiles,) + mid + (_SUB, _LANES))


def _unpack(x: jax.Array, B: int) -> jax.Array:
    """(tiles, *mid, 8, 128) -> (B, *mid)."""
    tiles = x.shape[0]
    mid = x.shape[1:-2]
    x = x.reshape((tiles,) + mid + (LANE_TILE,))
    x = jnp.moveaxis(x, -1, 1).reshape((tiles * LANE_TILE,) + mid)
    return x[:B]


def linearize_boundaries(cfg: "S.SolverConfig", X0: jax.Array,
                         boundaries: jax.Array,
                         boundary_signs: jax.Array) -> jax.Array:
    """Per-(lane, stage) linear models of the 6 boundary rows, (B, H+1, 18).

    RTI-style constraint linearization at the warm-start trajectory: each
    signed-distance row h_ij = sign_j * d(circle_i(x), poly_j) (the exact
    rows of ``constraints.boundary_rows``) is replaced by its first-order
    model n . c + c0 at the nearest segment, where c is the ego circle
    center — EXACT when the active boundary segment is a straight line,
    and refreshed every solve in closed loop.  Output layout per stage:
    [nx, ny, c0] x 6 rows, circle-major (row idx = 2*i + j).

    X0: (B, H+1, NX) warm trajectory; boundaries: (B, 2, NB, 2);
    boundary_signs: (B, 2).
    """
    d_ego = C.approx_circle_radius(cfg.ego_length, cfg.ego_width)[1] / 4.0
    ks = jnp.asarray([0.0, d_ego, -d_ego], X0.dtype)
    cxy = jnp.stack(
        [X0[..., 0:1] + ks * jnp.cos(X0[..., 4:5]),
         X0[..., 1:2] + ks * jnp.sin(X0[..., 4:5])], axis=-1)  # (B,H+1,3,2)

    def one_boundary(p, poly, sgn):
        # p: (H+1, 3, 2); poly: (NB, 2); sgn: ()
        a, b = poly[:-1], poly[1:]
        ab = b - a                                        # (NS, 2)
        ab2 = jnp.maximum(jnp.sum(ab * ab, -1), 1e-12)
        pa = p[:, :, None, :] - a                          # (H+1, 3, NS, 2)
        t = jnp.clip(jnp.sum(pa * ab, -1) / ab2, 0.0, 1.0)
        proj = a + t[..., None] * ab
        diff = p[:, :, None, :] - proj
        d2 = jnp.sum(diff * diff, -1)                      # (H+1, 3, NS)
        i = jnp.argmin(d2, -1)
        proj_i = jnp.take_along_axis(
            proj, i[..., None, None], axis=2)[:, :, 0]     # (H+1, 3, 2)
        ab_i = ab[i]
        d_i = jnp.sqrt(
            jnp.take_along_axis(d2, i[..., None], 2)[..., 0] + 1e-12)
        off = p - proj_i
        cross = ab_i[..., 0] * off[..., 1] - ab_i[..., 1] * off[..., 0]
        sg = jnp.sign(cross)
        n = (sgn * sg)[..., None] * off / d_i[..., None]
        c0 = sgn * sg * d_i - jnp.sum(n * p, -1)
        return n[..., 0], n[..., 1], c0                    # each (H+1, 3)

    def one_lane(p, polys, signs):
        nx0, ny0, c00 = one_boundary(p, polys[0], signs[0])
        nx1, ny1, c01 = one_boundary(p, polys[1], signs[1])
        nx = jnp.stack([nx0, nx1], -1)                     # (H+1, 3, 2)
        ny = jnp.stack([ny0, ny1], -1)
        c0 = jnp.stack([c00, c01], -1)
        # (H+1, 3, 2, 3) -> (H+1, 18): circle-major, then boundary, then
        # [nx, ny, c0] — the kernel reads bnd[3*idx + {0,1,2}], idx = 2i+j
        return jnp.stack([nx, ny, c0], -1).reshape(p.shape[0], 18)

    return jax.vmap(one_lane)(cxy, boundaries, boundary_signs)


# ---------------------------------------------------------------------------
# in-kernel math on (8, 128) lane registers (row-list style)
# ---------------------------------------------------------------------------


def _ks_ode(x, u, inv_l):
    px, py, delta, v, psi = x
    return [v * jnp.cos(psi), v * jnp.sin(psi), u[0], u[1],
            v * jnp.tan(delta) * inv_l]


def _step_rows(x, u, dt, inv_l, integrator):
    """Discrete KS step on row-lists (RK4 / Euler, dynamics.py parity)."""
    def add(a, s, k):
        return [a[i] + s * k[i] for i in range(NX)]

    if integrator == "euler":
        return add(x, dt, _ks_ode(x, u, inv_l))
    k1 = _ks_ode(x, u, inv_l)
    k2 = _ks_ode(add(x, 0.5 * dt, k1), u, inv_l)
    k3 = _ks_ode(add(x, 0.5 * dt, k2), u, inv_l)
    k4 = _ks_ode(add(x, dt, k3), u, inv_l)
    return [x[i] + (dt / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
            for i in range(NX)]


def _jmul(x, M, inv_l, ncol):
    """J(x) @ M with the KS Jacobian's 6-nonzero sparsity.

    J rows: f0 <- (cos psi) d v - (v sin psi) d psi
            f1 <- (sin psi) d v + (v cos psi) d psi
            f4 <- (v (1+tan^2 delta)/l) d delta + (tan delta / l) d v
    M: row-list (NX x ncol); entries may be python floats (identity cols).
    """
    delta, v, psi = x[2], x[3], x[4]
    t = jnp.tan(delta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    dvd = v * (1.0 + t * t) * inv_l
    tl = t * inv_l
    row0 = [cp * M[3][j] - (v * sp) * M[4][j] for j in range(ncol)]
    row1 = [sp * M[3][j] + (v * cp) * M[4][j] for j in range(ncol)]
    zrow = [0.0 for _ in range(ncol)]
    row4 = [dvd * M[2][j] + tl * M[3][j] for j in range(ncol)]
    return [row0, row1, zrow, zrow, row4]


def _fu_rows(ncol_u=NU):
    """d f / d u: rows 2, 3 are the identity over u."""
    fu = [[0.0] * ncol_u for _ in range(NX)]
    fu[2][0] = 1.0
    fu[3][1] = 1.0
    return fu


def _lin_step(x, u, dt, inv_l, integrator):
    """Analytic (A, B) of the discrete step (chain rule through RK4/Euler).

    Matches ``jax.jacfwd`` of ``dynamics.rk4_step``/``euler_step`` to fp
    precision.  Returns row-lists A (5x5), Bm (5x2).
    """
    eye = [[1.0 if i == j else 0.0 for j in range(NX)] for i in range(NX)]
    fu = _fu_rows()

    def add(a, s, k):
        return [a[i] + s * k[i] for i in range(NX)]

    def macc(base, s, k, n, m):
        return [[base[i][j] + s * k[i][j] for j in range(m)]
                for i in range(n)]

    if integrator == "euler":
        J1x = _jmul(x, eye, inv_l, NX)
        A = macc(eye, dt, J1x, NX, NX)
        Bm = [[dt * fu[i][j] for j in range(NU)] for i in range(NX)]
        return A, Bm

    k1 = _ks_ode(x, u, inv_l)
    x2 = add(x, 0.5 * dt, k1)
    k2 = _ks_ode(x2, u, inv_l)
    x3 = add(x, 0.5 * dt, k2)
    k3 = _ks_ode(x3, u, inv_l)
    x4 = add(x, dt, k3)

    # d k_i / d x
    dk1x = _jmul(x, eye, inv_l, NX)
    m2 = macc(eye, 0.5 * dt, dk1x, NX, NX)
    dk2x = _jmul(x2, m2, inv_l, NX)
    m3 = macc(eye, 0.5 * dt, dk2x, NX, NX)
    dk3x = _jmul(x3, m3, inv_l, NX)
    m4 = macc(eye, dt, dk3x, NX, NX)
    dk4x = _jmul(x4, m4, inv_l, NX)
    A = [[eye[i][j] + (dt / 6.0) * (dk1x[i][j] + 2.0 * dk2x[i][j]
                                    + 2.0 * dk3x[i][j] + dk4x[i][j])
          for j in range(NX)] for i in range(NX)]

    # d k_i / d u   (dk1u = fu; dkiu = J_i (dt_i * dk_{i-1}u) + fu)
    zero_u = [[0.0] * NU for _ in range(NX)]
    dk1u = fu
    b2 = macc(zero_u, 0.5 * dt, dk1u, NX, NU)
    dk2u = macc(_jmul(x2, b2, inv_l, NU), 1.0, fu, NX, NU)
    b3 = macc(zero_u, 0.5 * dt, dk2u, NX, NU)
    dk3u = macc(_jmul(x3, b3, inv_l, NU), 1.0, fu, NX, NU)
    b4 = macc(zero_u, dt, dk3u, NX, NU)
    dk4u = macc(_jmul(x4, b4, inv_l, NU), 1.0, fu, NX, NU)
    Bm = [[(dt / 6.0) * (dk1u[i][j] + 2.0 * dk2u[i][j] + 2.0 * dk3u[i][j]
                         + dk4u[i][j]) for j in range(NU)]
          for i in range(NX)]
    return A, Bm


# ---------------------------------------------------------------------------
# in-kernel forward-mode dual numbers (generic analytic Jacobians)
# ---------------------------------------------------------------------------
#
# The KS fast path above hand-unrolls its 6-nonzero Jacobian.  For richer
# models (the 7-state ST single-track with tire dynamics) hand-deriving the
# chain rule is error-prone, so the kernel carries a tiny forward-mode AD:
# each scalar is (value, tangent-tuple) over the nx+nu seed directions, and
# the ODE is written ONCE — running it on plain registers gives values
# (rollouts), on duals gives the exact RK4 (A, B) like ``jax.jacfwd``.


class _Dual:
    __slots__ = ("v", "t")

    def __init__(self, v, t=()):
        self.v = v
        self.t = tuple(t)

    def _bin(self, o):
        return o if isinstance(o, _Dual) else _Dual(o, (0.0,) * len(self.t))

    def __add__(self, o):
        o = self._bin(o)
        return _Dual(self.v + o.v,
                     tuple(a + b for a, b in zip(self.t, o.t)))

    __radd__ = __add__

    def __sub__(self, o):
        o = self._bin(o)
        return _Dual(self.v - o.v,
                     tuple(a - b for a, b in zip(self.t, o.t)))

    def __rsub__(self, o):
        return self._bin(o).__sub__(self)

    def __mul__(self, o):
        o = self._bin(o)
        return _Dual(self.v * o.v,
                     tuple(a * o.v + self.v * b
                           for a, b in zip(self.t, o.t)))

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._bin(o)
        inv = 1.0 / o.v
        q = self.v * inv
        return _Dual(q, tuple((a - q * b) * inv
                              for a, b in zip(self.t, o.t)))

    def __rtruediv__(self, o):
        return self._bin(o).__truediv__(self)

    def __neg__(self):
        return _Dual(-self.v, tuple(-a for a in self.t))


def _dchain(val, dval, x: _Dual) -> _Dual:
    return _Dual(val, tuple(dval * a for a in x.t))


def _dcos(x):
    return _dchain(jnp.cos(x.v), -jnp.sin(x.v), x)


def _dsin(x):
    return _dchain(jnp.sin(x.v), jnp.cos(x.v), x)


def _dtan(x):
    t = jnp.tan(x.v)
    return _dchain(t, 1.0 + t * t, x)


def _dsqrt(x):
    r = jnp.sqrt(x.v)
    return _dchain(r, 0.5 / r, x)


def _dwhere(cond, a: _Dual, b: _Dual) -> _Dual:
    return _Dual(jnp.where(cond, a.v, b.v),
                 tuple(jnp.where(cond, ta, tb)
                       for ta, tb in zip(a.t, b.t)))


def _dguard(x: _Dual, lo: float) -> _Dual:
    """|v| floor like dynamics.st_ode's v_safe (value-only clamp)."""
    return _Dual(jnp.where(jnp.abs(x.v) < lo, lo, x.v), x.t)


def _st_ode_d(x, u, veh):
    """7-state ST ODE on duals (or plain registers with empty tangents).

    Single-source parity with ``dynamics.st_ode`` (reference
    ``configuration.py:370-398``) including the low-speed kinematic blend.
    x: 7 _Duals [px, py, delta, v, psi, psiDot, beta]; u: 2 _Duals.
    """
    g = 9.81
    mu = veh.tire.p_dy1
    C_Sf = -veh.tire.p_ky1 / veh.tire.p_dy1
    C_Sr = C_Sf
    lf, lr = veh.a, veh.b
    l = lf + lr
    h, m, I = veh.h_s, veh.m, veh.I_z

    delta, v, psi, psi_dot, beta = x[2], x[3], x[4], x[5], x[6]
    u0, u1 = u[0], u[1]

    td = _dtan(delta)
    # low-speed kinematic branch.  beta_kin = arctan(tan(delta) lr/l), but
    # Mosaic has no atan lowering — only cos/sin of it are needed:
    # cos(arctan(t)) = 1/sqrt(1+t^2), sin(arctan(t)) = t/sqrt(1+t^2).
    tb0 = td * (lr / l)
    inv_hyp = 1.0 / _dsqrt(tb0 * tb0 + 1.0)
    cbk = inv_hyp
    sbk = tb0 * inv_hyp
    cpsi = _dcos(psi)
    spsi = _dsin(psi)
    f0_lo = v * (cbk * cpsi - sbk * spsi)
    f1_lo = v * (sbk * cpsi + cbk * spsi)
    f4_lo = v * cbk * td * (1.0 / l)
    cd = _dcos(delta)
    cd2 = cd * cd
    tb = td * (lr / l)
    d_beta = (u0 * lr) / ((cd2 * (1.0 + tb * tb)) * l)
    cb = _dcos(beta)
    sb = _dsin(beta)
    dd_psi = (u1 * cb * td - v * sb * d_beta * td
              + v * cb * u0 / cd2) * (1.0 / l)

    # high-speed tire branch
    v_safe = _dguard(v, 1e-3)
    f0_hi = v * _dcos(beta + psi)
    f1_hi = v * _dsin(beta + psi)
    glr_uh = _Dual(g * lr, (0.0,) * len(v.t)) - u1 * h
    glf_uh = _Dual(g * lf, (0.0,) * len(v.t)) + u1 * h
    f5_hi = ((-(mu * m) / (I * l)) * (lf * lf * C_Sf) * glr_uh / v_safe
             * psi_dot
             + ((-(mu * m) / (I * l)) * (lr * lr * C_Sr)) * glf_uh / v_safe
             * psi_dot
             + ((mu * m) / (I * l)) * (lr * C_Sr) * glf_uh * beta
             - ((mu * m) / (I * l)) * (lf * C_Sf) * glr_uh * beta
             + ((mu * m) / (I * l)) * (lf * C_Sf) * glr_uh * delta)
    f6_hi = ((mu / l) * ((C_Sr * lr) * glf_uh - (C_Sf * lf) * glr_uh)
             / (v_safe * v_safe) - 1.0) * psi_dot \
        - (mu / l) * (C_Sr * glf_uh + C_Sf * glr_uh) / v_safe * beta \
        + (mu / l) * (C_Sf * glr_uh) / v_safe * delta

    low = jnp.abs(v.v) < 0.1
    return [
        _dwhere(low, f0_lo, f0_hi),
        _dwhere(low, f1_lo, f1_hi),
        u0,
        u1,
        _dwhere(low, f4_lo, psi_dot),
        _dwhere(low, dd_psi, f5_hi),
        _dwhere(low, d_beta, f6_hi),
    ]


def _st_step_rows(x, u, dt, veh, integrator):
    """Discrete ST step on plain row-lists (values only, via empty duals)."""
    nx = len(x)
    xd = [_Dual(xi, ()) for xi in x]
    ud = [_Dual(ui, ()) for ui in u]

    def ode(xs):
        return _st_ode_d(xs, ud, veh)

    def addd(a, s, k):
        return [a[i] + _Dual(s, ()) * k[i] for i in range(nx)]

    if integrator == "euler":
        out = addd(xd, dt, ode(xd))
        return [o.v for o in out]
    k1 = ode(xd)
    k2 = ode(addd(xd, 0.5 * dt, k1))
    k3 = ode(addd(xd, 0.5 * dt, k2))
    k4 = ode(addd(xd, dt, k3))
    out = [xd[i] + _Dual(dt / 6.0, ()) * (k1[i] + _Dual(2.0, ()) * k2[i]
                                          + _Dual(2.0, ()) * k3[i] + k4[i])
           for i in range(nx)]
    return [o.v for o in out]


def _st_lin_step(x, u, dt, veh, integrator):
    """Exact (A, B) of the discrete ST step via dual-number RK4/Euler.

    Matches ``jax.jacfwd`` of ``dynamics.make_step_fn('rk4'|'euler', ...,
    'st')`` to fp precision.  Returns row-lists A (7x7), Bm (7x2).
    """
    nx = len(x)
    ns = nx + NU
    zero = jnp.zeros_like(x[0])

    def seed(i):
        return tuple(1.0 if j == i else 0.0 for j in range(ns))

    xd = [_Dual(x[i], tuple(jnp.full_like(zero, v) for v in seed(i)))
          for i in range(nx)]
    ud = [_Dual(u[i], tuple(jnp.full_like(zero, v) for v in seed(nx + i)))
          for i in range(NU)]

    def ode(xs):
        return _st_ode_d(xs, ud, veh)

    def addd(a, s, k):
        return [a[i] + _Dual(s, (0.0,) * ns) * k[i] for i in range(nx)]

    if integrator == "euler":
        out = addd(xd, dt, ode(xd))
    else:
        k1 = ode(xd)
        k2 = ode(addd(xd, 0.5 * dt, k1))
        k3 = ode(addd(xd, 0.5 * dt, k2))
        k4 = ode(addd(xd, dt, k3))
        two = _Dual(2.0, (0.0,) * ns)
        out = [xd[i] + _Dual(dt / 6.0, (0.0,) * ns)
               * (k1[i] + two * k2[i] + two * k3[i] + k4[i])
               for i in range(nx)]
    A = [[out[i].t[j] for j in range(nx)] for i in range(nx)]
    Bm = [[out[i].t[nx + j] for j in range(NU)] for i in range(nx)]
    return A, Bm


# ---------------------------------------------------------------------------
# constraint rows: values + closed-form gradients (constraints.py parity)
# ---------------------------------------------------------------------------


class _Rows:
    """Per-stage rows with their sparse gradients (all (8,128) registers).

    friction: h, (g_delta, g_v, g_a)
    circles:  9 x (d, ux, uy, g_psi)   [grad wrt px, py, psi]
    boxes:    [u0, u1, delta, v] identity rows
    """

    __slots__ = ("h_f", "gf", "circ", "box", "bnd")


def _compute_rows(x, u_eff, obs, consts, is_term: bool, k_is0, bnd=None):
    """consts: dict of static floats; obs: list of 6 (8,128) [o_xy x 3].

    k_is0: traced scalar bool (casadi friction mask) or None (forcespro).
    bnd: 18 registers [nx, ny, c0] x 6 — per-stage road-boundary rows,
    linearized at the warm-start trajectory on the host side
    (``linearize_boundaries``): row value nx*cx + ny*cy + c0 on the ego
    circle center (cx, cy), the same (px, py, psi) gradient structure as
    the obstacle circle rows.  Empty when boundary rows are disabled.
    """
    px, py, delta, v, psi = x[:5]  # ST states append (psiDot, beta)
    a = u_eff[1]
    inv_l = consts["inv_l"]
    r = _Rows()

    t = jnp.tan(delta)
    if consts["formulation"] == "forcespro":
        w = v * v * t * inv_l            # v * psidot
        r.h_f = a * a + w * w
        g_delta = 2.0 * w * v * v * (1.0 + t * t) * inv_l
        g_v = 4.0 * w * v * t * inv_l
        g_a = 2.0 * a
    else:  # casadi: |a^2 + v^2 tan(delta)/l|, stage 0 only
        s_val = a * a + v * v * t * inv_l
        sgn = jnp.sign(s_val)
        h = jnp.abs(s_val)
        g_delta = sgn * v * v * (1.0 + t * t) * inv_l
        g_v = sgn * 2.0 * v * t * inv_l
        g_a = sgn * 2.0 * a
        mask = k_is0
        r.h_f = jnp.where(mask, h, 0.0)
        g_delta = jnp.where(mask, g_delta, 0.0)
        g_v = jnp.where(mask, g_v, 0.0)
        g_a = jnp.where(mask, g_a, 0.0)
    if is_term:
        g_a = jnp.zeros_like(g_a)  # terminal u columns are dropped
    r.gf = (g_delta, g_v, g_a)

    # ego circle centers: k_i in (0, +d, -d) along heading
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    d_ego = consts["d_ego"]
    ks = (0.0, d_ego, -d_ego)
    eps = 1e-9
    circ = []
    if consts["formulation"] == "forcespro":
        pairs = [(i, j) for i in range(3) for j in range(3)]  # all 9
    else:
        pairs = [(i, i) for i in range(3) for _ in range(3)]  # matched x3
    for (i, j) in pairs:
        ex = px + ks[i] * cp
        ey = py + ks[i] * sp
        dx = ex - obs[2 * j]
        dy = ey - obs[2 * j + 1]
        dist = jnp.sqrt(dx * dx + dy * dy + eps)
        inv_d = 1.0 / dist
        ux = dx * inv_d
        uy = dy * inv_d
        g_psi = ks[i] * (-ux * sp + uy * cp) if ks[i] != 0.0 \
            else jnp.zeros_like(ux)
        circ.append((dist, ux, uy, g_psi))
    r.circ = circ
    r.box = (u_eff[0], u_eff[1], delta, v)
    r.bnd = []
    if consts["boundary"]:
        for idx, ki in enumerate(k for k in ks for _ in range(2)):
            nx_, ny_, c0 = bnd[3 * idx], bnd[3 * idx + 1], bnd[3 * idx + 2]
            cx = px + ki * cp
            cy = py + ki * sp
            hb = nx_ * cx + ny_ * cy + c0
            gpsi = (ki * (-nx_ * sp + ny_ * cp) if ki != 0.0
                    else jnp.zeros_like(hb))
            r.bnd.append((hb, nx_, ny_, gpsi))
    return r


def _al_one_sided(h, bound, lam, mu, is_hi: bool):
    """AL terms for one side: (psi_part, grad_part, gn_part).

    psi_part = (m^2 - lam^2) / (2 mu); grad = +-m; gn = mu * active.
    """
    c = (h - bound) if is_hi else (bound - h)
    t = lam + mu * c
    act = t > 0
    m = jnp.where(act, t, 0.0)
    psi = (m * m - lam * lam) / (2.0 * mu)
    grad = m if is_hi else -m
    gn = jnp.where(act, mu, 0.0)
    return psi, grad, gn


def _row_bounds(consts, mind, is_term: bool):
    """Static (lo, hi) per row index; None = unbounded. mind is per-lane."""
    a_cap = (consts["a_max"] ** 2 if consts["formulation"] == "forcespro"
             else consts["a_max"])
    bounds = [(0.0, a_cap)]
    for _ in range(9):
        bounds.append((mind, None))
    if is_term:
        bounds += [(None, None), (None, None)]
    else:
        bounds += [(consts["u_lo0"], consts["u_hi0"]),
                   (consts["u_lo1"], consts["u_hi1"])]
    bounds += [(consts["d_lo"], consts["d_hi"]),
               (consts["v_lo"], consts["v_hi"])]
    if consts["boundary"]:
        bounds += [(consts["r_ego"], None)] * 6
    return bounds


def _row_values(r: _Rows):
    return ([r.h_f] + [c[0] for c in r.circ] + list(r.box)
            + [b[0] for b in r.bnd])


def _stage_psi(r: _Rows, bounds, lam_lo, lam_hi, mu):
    """Sum of AL penalty terms over the 14 rows (merit evaluation)."""
    hs = _row_values(r)
    psi = None
    for i, (lo, hi) in enumerate(bounds):
        contrib = 0.0
        if hi is not None:
            p, _, _ = _al_one_sided(hs[i], hi, lam_hi[i], mu[i], True)
            contrib = contrib + p
        if lo is not None:
            p, _, _ = _al_one_sided(hs[i], lo, lam_lo[i], mu[i], False)
            contrib = contrib + p
        psi = contrib if psi is None else psi + contrib
    return psi


def _stage_cost_rows(x, u, xref, wq, wr):
    c = None
    for i in range(len(x)):
        dxi = x[i] - xref[i]
        term = wq[i] * dxi * dxi
        c = term if c is None else c + term
    for i in range(NU):
        c = c + wr[i] * u[i] * u[i]
    return c


def _term_cost_rows(x, xref, wqN):
    c = None
    for i in range(len(x)):
        dxi = x[i] - xref[i]
        term = wqN[i] * dxi * dxi
        c = term if c is None else c + term
    return c


def _row_al_grads(r: _Rows, bounds, lam_lo, lam_hi, mu):
    """(gh, gn) per row: d psi/d h and the GN diagonal."""
    hs = _row_values(r)
    out = []
    for i, (lo, hi) in enumerate(bounds):
        gh = 0.0
        gn = 0.0
        if hi is not None:
            _, g, n = _al_one_sided(hs[i], hi, lam_hi[i], mu[i], True)
            gh = gh + g
            gn = gn + n
        if lo is not None:
            _, g, n = _al_one_sided(hs[i], lo, lam_lo[i], mu[i], False)
            gh = gh + g
            gn = gn + n
        out.append((gh, gn))
    return out


def _assemble_quad(r: _Rows, algr, x, u_eff, xref, wq, wr,
                   is_term: bool, wqN=None, use_terminal=True):
    """GN quadratic of cost + AL rows at one stage (sparse analytic form).

    Returns (Q 5x5 rows, R 2x2, M 5x2, qx 5, qu 2) for a non-terminal
    stage; (QH 5x5, qH 5) when is_term.
    """
    nxa = len(x)
    z = jnp.zeros_like(x[0])
    Q = [[z if i != j else jnp.zeros_like(z) for j in range(nxa)]
         for i in range(nxa)]
    qx = [jnp.zeros_like(z) for _ in range(nxa)]
    if not is_term:
        R = [[jnp.zeros_like(z) for _ in range(NU)] for _ in range(NU)]
        M = [[jnp.zeros_like(z) for _ in range(NU)] for _ in range(nxa)]
        qu = [jnp.zeros_like(z) for _ in range(NU)]

    # friction row -> (delta, v, a) block
    gh, gn = algr[0]
    gd, gv, ga = r.gf
    Q[2][2] = Q[2][2] + gn * gd * gd
    Q[2][3] = Q[2][3] + gn * gd * gv
    Q[3][3] = Q[3][3] + gn * gv * gv
    qx[2] = qx[2] + gh * gd
    qx[3] = qx[3] + gh * gv
    if not is_term:
        R[1][1] = R[1][1] + gn * ga * ga
        M[2][1] = M[2][1] + gn * gd * ga
        M[3][1] = M[3][1] + gn * gv * ga
        qu[1] = qu[1] + gh * ga

    # circle rows -> (px, py, psi) block
    for idx, (_, ux, uy, gp) in enumerate(r.circ):
        gh, gn = algr[1 + idx]
        Q[0][0] = Q[0][0] + gn * ux * ux
        Q[0][1] = Q[0][1] + gn * ux * uy
        Q[1][1] = Q[1][1] + gn * uy * uy
        Q[0][4] = Q[0][4] + gn * ux * gp
        Q[1][4] = Q[1][4] + gn * uy * gp
        Q[4][4] = Q[4][4] + gn * gp * gp
        qx[0] = qx[0] + gh * ux
        qx[1] = qx[1] + gh * uy
        qx[4] = qx[4] + gh * gp

    # box rows: u0, u1, delta, v (identity gradients)
    if not is_term:
        gh, gn = algr[10]
        R[0][0] = R[0][0] + gn
        qu[0] = qu[0] + gh
        gh, gn = algr[11]
        R[1][1] = R[1][1] + gn
        qu[1] = qu[1] + gh
    gh, gn = algr[12]
    Q[2][2] = Q[2][2] + gn
    qx[2] = qx[2] + gh
    gh, gn = algr[13]
    Q[3][3] = Q[3][3] + gn
    qx[3] = qx[3] + gh

    # boundary rows -> (px, py, psi) block (same structure as circles)
    for idx, (_, nx_, ny_, gp) in enumerate(r.bnd):
        gh, gn = algr[14 + idx]
        Q[0][0] = Q[0][0] + gn * nx_ * nx_
        Q[0][1] = Q[0][1] + gn * nx_ * ny_
        Q[1][1] = Q[1][1] + gn * ny_ * ny_
        Q[0][4] = Q[0][4] + gn * nx_ * gp
        Q[1][4] = Q[1][4] + gn * ny_ * gp
        Q[4][4] = Q[4][4] + gn * gp * gp
        qx[0] = qx[0] + gh * nx_
        qx[1] = qx[1] + gh * ny_
        qx[4] = qx[4] + gh * gp

    # quadratic cost (exact): Q += 2 diag(w), q += 2 w dx
    if is_term:
        if use_terminal:
            for i in range(nxa):
                Q[i][i] = Q[i][i] + 2.0 * wqN[i]
                qx[i] = qx[i] + 2.0 * wqN[i] * (x[i] - xref[i])
    else:
        for i in range(nxa):
            Q[i][i] = Q[i][i] + 2.0 * wq[i]
            qx[i] = qx[i] + 2.0 * wq[i] * (x[i] - xref[i])
        for i in range(NU):
            R[i][i] = R[i][i] + 2.0 * wr[i]
            qu[i] = qu[i] + 2.0 * wr[i] * u_eff[i]

    # symmetrize the off-diagonal accumulations
    Q[1][0] = Q[0][1]
    Q[3][2] = Q[2][3]
    Q[4][0] = Q[0][4]
    Q[4][1] = Q[1][4]
    if is_term:
        return Q, qx
    return Q, R, M, qx, qu


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _read_vec(ref, k, n):
    v = ref[k]
    return [v[i] for i in range(n)]


def make_consts(cfg: S.SolverConfig) -> dict:
    """Static per-config scalars shared by the fused kernels (AL + IP)."""
    return {
        "boundary": bool(cfg.boundary_rows),
        "r_ego": C.approx_circle_radius(cfg.ego_length, cfg.ego_width)[0],
        "formulation": cfg.formulation,
        "inv_l": 1.0 / cfg.wheelbase,
        "a_max": float(cfg.a_max),
        "d_ego": C.approx_circle_radius(cfg.ego_length, cfg.ego_width)[1]
        / 4.0,
        "u_lo0": float(cfg.bounds.u_lo[0]), "u_hi0": float(cfg.bounds.u_hi[0]),
        "u_lo1": float(cfg.bounds.u_lo[1]), "u_hi1": float(cfg.bounds.u_hi[1]),
        "d_lo": float(cfg.bounds.x_lo[2]), "d_hi": float(cfg.bounds.x_hi[2]),
        "v_lo": float(cfg.bounds.x_lo[3]), "v_hi": float(cfg.bounds.x_hi[3]),
    }


def _make_kernel(cfg: S.SolverConfig, H: int, moving: bool = False):
    consts = make_consts(cfg)
    nxk = S.solver_nx(cfg)  # 5 (KS) or 7 (ST)
    dt = float(cfg.dt)
    inv_l = consts["inv_l"]
    integ = cfg.integrator
    if cfg.model == "st":
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
    # bound-relative friction violation (sqp.row_scales): row 0 is in
    # (m/s^2)^2 (forcespro) / m/s^2 (casadi) units, other rows in meters
    _fr_scale = (consts["a_max"] ** 2 if consts["formulation"] == "forcespro"
                 else consts["a_max"])
    nr = S.nrows(cfg)
    inv_scale = [1.0 / _fr_scale] + [1.0] * (nr - 1)
    u_clip = ((consts["u_lo0"], consts["u_lo1"]),
              (consts["u_hi0"], consts["u_hi1"]))

    def kernel(x0_ref, xref_ref, obs_ref, mind_ref, w_ref, bnd_ref,
               u_ref, lamlo_ref, lamhi_ref, mu_ref, pviol_ref,
               X_ref, u_out, lamlo_out, lamhi_out, mu_out, pviol_out,
               diag_ref, K_scr, d_scr, Xb_scr, Ub_scr, Xt_scr, Ut_scr,
               rows_scr):
        # The warm-start state is carried in the OUTPUT refs (HBM-aliased to
        # the inputs).  In the compiled pipeline output VMEM windows are NOT
        # pre-loaded with the aliased buffer's contents (only the interpreter
        # does that), so initialize them from the input windows explicitly.
        u_out[...] = u_ref[...]
        lamlo_out[...] = lamlo_ref[...]
        lamhi_out[...] = lamhi_ref[...]
        mu_out[...] = mu_ref[...]
        pviol_out[...] = pviol_ref[...]
        if moving:
            # per-stage predicted obstacle centers (moving obstacle):
            # obs_ref is (H+1, 6); re-read at every stage evaluation
            def obs_at(k):
                return [obs_ref[k, i] for i in range(6)]
        else:
            _obs0 = [obs_ref[i] for i in range(6)]

            def obs_at(k):
                return _obs0
        mind = mind_ref[0]
        wq = [w_ref[i] for i in range(nxk)]
        wr = [w_ref[nxk + i] for i in range(NU)]
        wqN = [w_ref[nxk + NU + i] for i in range(nxk)]
        x0 = [x0_ref[i] for i in range(nxk)]
        if consts["boundary"]:
            def bnd_at(k):
                return [bnd_ref[k, i] for i in range(18)]
        else:
            def bnd_at(k):
                return None

        bounds_k = _row_bounds(consts, mind, is_term=False)
        bounds_T = _row_bounds(consts, mind, is_term=True)

        def clip_u(u):
            return [jnp.clip(u[i], u_clip[0][i], u_clip[1][i])
                    for i in range(NU)]

        def stage_refs(k):
            return (_read_vec(xref_ref, k, nxk),
                    _read_vec(lamlo_out, k, nr),
                    _read_vec(lamhi_out, k, nr),
                    _read_vec(mu_out, k, nr))

        def stage_merit(x, u_eff, k, is_term):
            """cost + AL psi of one stage (x list, u_eff list)."""
            xref_k, lam_lo, lam_hi, mu = stage_refs(k)
            r = _compute_rows(x, u_eff, obs_at(H if is_term else k),
                              consts, is_term, k_is0=(k == 0),
                              bnd=bnd_at(H if is_term else k))
            psi = _stage_psi(r, bounds_T if is_term else bounds_k,
                             lam_lo, lam_hi, mu)
            if is_term:
                c = (_term_cost_rows(x, xref_k, wqN)
                     if cfg.use_terminal_cost else jnp.zeros_like(psi))
            else:
                c = _stage_cost_rows(x, u_eff, xref_k, wq, wr)
            return c + psi

        # packed per-stage rows cache (multiplier update -> diagnostics
        # handoff; same layout as the fused IP kernel's cache)
        def pack_rows(r):
            zero = jnp.zeros_like(x0[0])
            vals = [zero + r.h_f, zero + r.gf[0], zero + r.gf[1],
                    zero + r.gf[2]]
            for c in r.circ:
                vals.extend(zero + ci for ci in c)
            vals.extend(zero + bi for bi in r.box)
            for b in r.bnd:
                vals.extend(zero + bi for bi in b)
            return jnp.stack(vals)

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

        # --- initial rollout: X <- rollout(x0, U); rows cached en route
        # (the first GN iteration of each AL iteration reads them — at
        # _ai = 0 from here, at _ai >= 1 from the multiplier update's
        # store, since the iterate does not move between the two) --------
        def roll_body(k, x):
            X_ref[k] = jnp.stack(x)
            u = _read_vec(u_out, k, NU)
            rows_scr[k] = pack_rows(
                _compute_rows(x, u, obs_at(k), consts, False,
                              k_is0=(k == 0), bnd=bnd_at(k)))
            return jnp.stack(step_f(x, u))

        xH = jax.lax.fori_loop(0, H, lambda k, xs: roll_body(
            k, [xs[i] for i in range(nxk)]), jnp.stack(x0))
        X_ref[H] = xH
        rows_scr[H] = pack_rows(
            _compute_rows([xH[i] for i in range(nxk)],
                          [jnp.zeros_like(x0[0])] * NU, obs_at(H), consts,
                          True, k_is0=False, bnd=bnd_at(H)))

        zero_alpha = jnp.zeros_like(x0[0])

        def feedback_rollout(alpha, store):
            """Rollout u = clip(ub + alpha d + K (x - xb)); returns merit.

            alpha: (8,128) per-lane step size.  store=(X_scr, U_scr)
            records the trial chain into scratch while the merit
            accumulates, so the ladder winner is COMMITTED by a masked
            copy instead of a third full rollout (reads of X_ref/u_out
            inside this function see the OLD trajectory either way).
            """
            Xs, Us = store

            def body(k, carry):
                x, acc = carry
                xl = [x[i] for i in range(nxk)]
                xb = _read_vec(X_ref, k, nxk)
                ub = _read_vec(u_out, k, NU)
                Kk = _read_vec(K_scr, k, NU * nxk)
                dk = _read_vec(d_scr, k, NU)
                dxb = [xl[i] - xb[i] for i in range(nxk)]
                u = []
                for i in range(NU):
                    fb = sum(Kk[i * nxk + j] * dxb[j] for j in range(nxk))
                    u.append(ub[i] + alpha * dk[i] + fb)
                u = clip_u(u)
                acc = acc + stage_merit(xl, u, k, is_term=False)
                x_next = step_f(xl, u)
                Xs[k] = jnp.stack(xl)
                Us[k] = jnp.stack(u)
                return (jnp.stack(x_next), acc)

            xH2, acc = jax.lax.fori_loop(
                0, H, body, (jnp.stack(x0), jnp.zeros_like(x0[0])))
            xHl = [xH2[i] for i in range(nxk)]
            acc = acc + stage_merit(xHl, [zero_alpha, zero_alpha], H,
                                    is_term=True)
            Xs[H] = xH2
            return acc

        # --- AL-SQP iterations ----------------------------------------------
        for _ai in range(cfg.al_iters):
            for _si in range(cfg.sqp_iters):
                # the first GN iteration of each AL iteration runs at an
                # iterate whose rows are already cached (initial rollout
                # at _ai=0, the multiplier update's store at _ai>=1 — the
                # line-search commit is what moves the iterate, so later
                # _si recompute)
                rows_cached = _si == 0
                # backward sweep (terminal quad + reverse stage recursion)
                xT = _read_vec(X_ref, H, nxk)
                xrefT, lam_loT, lam_hiT, muT = stage_refs(H)
                rT = (cached_rows(H) if rows_cached else
                      _compute_rows(xT, [zero_alpha, zero_alpha],
                                    obs_at(H), consts, True, k_is0=False,
                                    bnd=bnd_at(H)))
                algrT = _row_al_grads(rT, bounds_T, lam_loT, lam_hiT, muT)
                QH, qH = _assemble_quad(rT, algrT, xT,
                                        [zero_alpha, zero_alpha], xrefT,
                                        wq, wr, True, wqN,
                                        cfg.use_terminal_cost)

                def bwd_body(j, carry):
                    P, p = carry  # (5,5,8,128) stacked, (5,8,128)
                    k = H - 1 - j
                    Pl = [[P[i, j2] for j2 in range(nxk)] for i in range(nxk)]
                    pl_ = [p[i] for i in range(nxk)]
                    x = _read_vec(X_ref, k, nxk)
                    u = _read_vec(u_out, k, NU)
                    xref_k, lam_lo, lam_hi, mu = stage_refs(k)
                    r = (cached_rows(k) if rows_cached else
                         _compute_rows(x, u, obs_at(k), consts, False,
                                       k_is0=(k == 0), bnd=bnd_at(k)))
                    algr = _row_al_grads(r, bounds_k, lam_lo, lam_hi, mu)
                    Q, R, M, qx, qu = _assemble_quad(
                        r, algr, x, u, xref_k, wq, wr, False)
                    A, Bm = lin_f(x, u)

                    At = [[A[i][j2] for i in range(nxk)] for j2 in range(nxk)]
                    Bt = [[Bm[i][j2] for i in range(nxk)]
                          for j2 in range(NU)]
                    PA = [[sum(Pl[i][t2] * A[t2][j2] for t2 in range(nxk))
                           for j2 in range(nxk)] for i in range(nxk)]
                    PB = [[sum(Pl[i][t2] * Bm[t2][j2] for t2 in range(nxk))
                           for j2 in range(NU)] for i in range(nxk)]
                    Qxx = [[Q[i][j2] + sum(At[i][t2] * PA[t2][j2]
                                           for t2 in range(nxk))
                            for j2 in range(nxk)] for i in range(nxk)]
                    Quu = [[R[i][j2] + sum(Bt[i][t2] * PB[t2][j2]
                                           for t2 in range(nxk))
                            for j2 in range(NU)] for i in range(NU)]
                    Mt = [[M[i][j2] for i in range(nxk)] for j2 in range(NU)]
                    Qux = [[Mt[i][j2] + sum(Bt[i][t2] * PA[t2][j2]
                                            for t2 in range(nxk))
                            for j2 in range(nxk)] for i in range(NU)]
                    gx = [qx[i] + sum(At[i][t2] * pl_[t2]
                                      for t2 in range(nxk))
                          for i in range(nxk)]
                    gu = [qu[i] + sum(Bt[i][t2] * pl_[t2]
                                      for t2 in range(nxk))
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
                    d_scr[k] = jnp.stack(dk)

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

                if len(cfg.alphas) == 0:
                    # unguarded full RTI step (reference maxqps=1
                    # semantics; mirrors ip_alphas=() and the vmapped
                    # paths' alphas=() branches): scrub NaN/inf gains to
                    # 0, roll the alpha=1 feedback chain straight into
                    # the refs — no merit accumulation at all.
                    def scrub_body(k, _):
                        d = d_scr[k]
                        d_scr[k] = jnp.where(jnp.isfinite(d), d, 0.0)
                        Kk = K_scr[k]
                        K_scr[k] = jnp.where(jnp.isfinite(Kk), Kk, 0.0)
                        return 0

                    jax.lax.fori_loop(0, H, scrub_body, 0)

                    def ug_body(k, x):
                        xl = [x[i] for i in range(nxk)]
                        xb = _read_vec(X_ref, k, nxk)
                        ub = _read_vec(u_out, k, NU)
                        Kk = _read_vec(K_scr, k, NU * nxk)
                        dk = _read_vec(d_scr, k, NU)
                        dxb = [xl[i] - xb[i] for i in range(nxk)]
                        u = []
                        for i in range(NU):
                            fb = sum(Kk[i * nxk + j] * dxb[j]
                                     for j in range(nxk))
                            u.append(ub[i] + dk[i] + fb)
                        u = clip_u(u)
                        X_ref[k] = jnp.stack(xl)
                        u_out[k] = jnp.stack(u)
                        return jnp.stack(step_f(xl, u))

                    xU = jax.lax.fori_loop(0, H, lambda k, xs: ug_body(
                        k, [xs[i] for i in range(nxk)]), jnp.stack(x0))
                    X_ref[H] = xU
                    continue

                # line-search ladder: each trial records its chain into
                # scratch; per-lane winner selection is a masked VMEM copy
                # (the per-lane mixed-alpha chain of the old write rollout
                # is lanewise identical to the uniform-alpha trial chain,
                # so this is bit-exact and one full rollout cheaper).
                # alpha=0 reproduces the current iterate exactly.
                ones = jnp.ones_like(zero_alpha)
                best_m = feedback_rollout(zero_alpha, (Xb_scr, Ub_scr))
                for a_val in cfg.alphas:
                    m_a = feedback_rollout(a_val * ones, (Xt_scr, Ut_scr))
                    take = m_a < best_m
                    best_m = jnp.where(take, m_a, best_m)

                    def selx_body(k, _):
                        Xb_scr[k] = jnp.where(take, Xt_scr[k], Xb_scr[k])
                        return 0

                    def selu_body(k, _):
                        Ub_scr[k] = jnp.where(take, Ut_scr[k], Ub_scr[k])
                        return 0

                    jax.lax.fori_loop(0, H + 1, selx_body, 0)
                    jax.lax.fori_loop(0, H, selu_body, 0)

                def commit_body(k, _):
                    X_ref[k] = Xb_scr[k]
                    return 0

                def commitu_body(k, _):
                    u_out[k] = Ub_scr[k]
                    return 0

                jax.lax.fori_loop(0, H + 1, commit_body, 0)
                jax.lax.fori_loop(0, H, commitu_body, 0)

            # --- multiplier / penalty update (all stages) -------------------
            def upd_body(k, _):
                is_last = k == H  # traced; handled via where on u mask
                x = _read_vec(X_ref, k, nxk)
                u = _read_vec(u_out, jnp.minimum(k, H - 1), NU)
                u_eff = [jnp.where(is_last, 0.0, u[i]) for i in range(NU)]
                xref_k, lam_lo, lam_hi, mu = stage_refs(k)
                pv = _read_vec(pviol_out, k, nr)
                r = _compute_rows(x, u_eff, obs_at(k), consts, False,
                                  k_is0=(k == 0), bnd=bnd_at(k))
                # hand the rows at the (final) iterate to the diagnostics
                # pass (identical values/gradients: u_eff masks the
                # terminal inputs to 0, so g_a = 2a = 0 matches the
                # is_term zeroing bit-for-bit)
                rows_scr[k] = pack_rows(r)
                # terminal: friction uses a=0 (u_eff), box u rows unbounded
                hs = _row_values(r)
                new_lo, new_hi, new_mu, new_viol = [], [], [], []
                for i, (lo, hi) in enumerate(bounds_k):
                    # terminal mask for the two u box rows
                    masked = is_last if i in (10, 11) else False
                    t_hi = (lam_hi[i] + mu[i] * (hs[i] - hi)
                            if hi is not None else None)
                    t_lo = (lam_lo[i] + mu[i] * (lo - hs[i])
                            if lo is not None else None)
                    lh = (jnp.clip(jnp.where(t_hi > 0, t_hi, 0.0), 0.0,
                                   cfg.lam_max)
                          if hi is not None else lam_hi[i])
                    ll = (jnp.clip(jnp.where(t_lo > 0, t_lo, 0.0), 0.0,
                                   cfg.lam_max)
                          if lo is not None else lam_lo[i])
                    v_hi = (jnp.maximum(hs[i] - hi, 0.0)
                            if hi is not None else 0.0)
                    v_lo = (jnp.maximum(lo - hs[i], 0.0)
                            if lo is not None else 0.0)
                    viol = jnp.maximum(v_hi, v_lo)
                    if isinstance(masked, bool) and not masked:
                        pass
                    else:
                        lh = jnp.where(masked, lam_hi[i], lh)
                        ll = jnp.where(masked, lam_lo[i], ll)
                        viol = jnp.where(masked, 0.0, viol)
                    stalled = viol > cfg.viol_improve * pv[i]
                    active = viol > cfg.tol_feas
                    m_new = jnp.where(stalled & active,
                                      mu[i] * cfg.mu_factor, mu[i])
                    m_new = jnp.clip(m_new, cfg.mu0, cfg.mu_max)
                    new_lo.append(ll)
                    new_hi.append(lh)
                    new_mu.append(m_new)
                    new_viol.append(viol)
                lamlo_out[k] = jnp.stack(new_lo)
                lamhi_out[k] = jnp.stack(new_hi)
                mu_out[k] = jnp.stack(new_mu)
                pviol_out[k] = jnp.stack(new_viol)
                return 0

            jax.lax.fori_loop(0, H + 1, upd_body, 0)

        # --- diagnostics: viol, cost, merit, KKT stationarity ---------------
        # adjoint recursion: lam_H = qH; g_u[k] = qu + B' lam_{k+1};
        # lam_k = qx + A' lam_{k+1}
        xT = _read_vec(X_ref, H, nxk)
        xrefT, lam_loT, lam_hiT, muT = stage_refs(H)
        # the multiplier update just cached the rows at this same iterate
        # (al_iters >= 1 always; compute fresh otherwise for safety)
        if cfg.al_iters >= 1:
            rT = cached_rows(H)
        else:
            rT = _compute_rows(xT, [zero_alpha, zero_alpha], obs_at(H),
                               consts, True, k_is0=False, bnd=bnd_at(H))
        algrT = _row_al_grads(rT, bounds_T, lam_loT, lam_hiT, muT)
        QHd, qHd = _assemble_quad(rT, algrT, xT, [zero_alpha, zero_alpha],
                                  xrefT, wq, wr, True, wqN,
                                  cfg.use_terminal_cost)
        psi_T = _stage_psi(rT, bounds_T, lam_loT, lam_hiT, muT)
        cost_T = (_term_cost_rows(xT, xrefT, wqN)
                  if cfg.use_terminal_cost else jnp.zeros_like(psi_T))
        hs_T = _row_values(rT)
        violT = jnp.zeros_like(psi_T)
        for i, (lo, hi) in enumerate(bounds_T):
            if hi is not None:
                violT = jnp.maximum(violT, (hs_T[i] - hi) * inv_scale[i])
            if lo is not None:
                violT = jnp.maximum(violT, (lo - hs_T[i]) * inv_scale[i])

        def diag_body(j, carry):
            lam, stat, viol, cost, merit = carry
            k = H - 1 - j
            laml = [lam[i] for i in range(nxk)]
            x = _read_vec(X_ref, k, nxk)
            u = _read_vec(u_out, k, NU)
            xref_k, lam_lo, lam_hi, mu = stage_refs(k)
            r = (cached_rows(k) if cfg.al_iters >= 1 else
                 _compute_rows(x, u, obs_at(k), consts, False,
                               k_is0=(k == 0), bnd=bnd_at(k)))
            algr = _row_al_grads(r, bounds_k, lam_lo, lam_hi, mu)
            _, _, _, qx, qu = _assemble_quad(r, algr, x, u, xref_k, wq, wr,
                                             False)
            A, Bm = lin_f(x, u)
            g_u = [qu[i] + sum(Bm[t2][i] * laml[t2] for t2 in range(nxk))
                   for i in range(NU)]
            lam_new = jnp.stack(
                [qx[i] + sum(A[t2][i] * laml[t2] for t2 in range(nxk))
                 for i in range(nxk)])
            stat = jnp.maximum(stat,
                               jnp.maximum(jnp.abs(g_u[0]),
                                           jnp.abs(g_u[1])))
            hs = _row_values(r)
            for i, (lo, hi) in enumerate(bounds_k):
                if hi is not None:
                    viol = jnp.maximum(viol, (hs[i] - hi) * inv_scale[i])
                if lo is not None:
                    viol = jnp.maximum(viol, (lo - hs[i]) * inv_scale[i])
            cost = cost + _stage_cost_rows(x, u, xref_k, wq, wr)
            merit = merit + _stage_cost_rows(x, u, xref_k, wq, wr) \
                + _stage_psi(r, bounds_k, lam_lo, lam_hi, mu)
            return (lam_new, stat, viol, cost, merit)

        lam0 = jnp.stack(qHd)
        z = jnp.zeros_like(zero_alpha)
        _, stat, viol, cost, merit = jax.lax.fori_loop(
            0, H, diag_body,
            (lam0, z, jnp.maximum(violT, 0.0), cost_T,
             cost_T + psi_T))
        diag_ref[0] = stat
        diag_ref[1] = viol
        diag_ref[2] = cost
        diag_ref[3] = merit

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def eligible(cfg: S.SolverConfig, params: S.OcpParams) -> bool:
    return (cfg.method == "al" and cfg.model in ("ks", "st")
            and (not cfg.boundary_rows or params.boundaries is not None)
            and params.obs_centers.ndim in (3, 4)      # static (B, 3, 2)
            # or moving (B, H+1, 3, 2) per-stage predicted centers
            and params.x_ref.shape[-1] in (NX, S.solver_nx(cfg)))


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("interpret",))
def _solve_packed(cfg, x0p, xrefp, obsp, mindp, wp, bndp, Up, llp, lhp,
                  mup, pvp, interpret=False):
    tiles = x0p.shape[0]
    H = cfg.horizon
    moving = obsp.ndim == 5  # (tiles, H+1, 6, 8, 128) vs (tiles, 6, 8, 128)
    nr = llp.shape[2]        # NROWS (+6 with boundary rows)
    nx = x0p.shape[1]        # 5 (KS) or 7 (ST)
    kernel = _make_kernel(cfg, H, moving)

    def tile_spec(*mid):
        nd = len(mid)
        return pl.BlockSpec((1,) + mid + (_SUB, _LANES),
                            lambda t: (t,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    def squeezed(*refs):
        ins = refs[:11]
        outs = refs[11:18]
        scr = refs[18:]
        kernel(*[r.at[0] for r in ins], *[r.at[0] for r in outs], *scr)

    dtype = x0p.dtype
    out_shape = (
        jax.ShapeDtypeStruct((tiles, H + 1, nx, _SUB, _LANES), dtype),  # X
        jax.ShapeDtypeStruct(Up.shape, dtype),
        jax.ShapeDtypeStruct(llp.shape, dtype),
        jax.ShapeDtypeStruct(lhp.shape, dtype),
        jax.ShapeDtypeStruct(mup.shape, dtype),
        jax.ShapeDtypeStruct(pvp.shape, dtype),
        jax.ShapeDtypeStruct((tiles, 4, _SUB, _LANES), dtype),  # diag
    )
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
            tile_spec(H + 1, nr), tile_spec(H + 1, nr),
        ],
        out_specs=(
            tile_spec(H + 1, nx), tile_spec(H, NU), tile_spec(H + 1, nr),
            tile_spec(H + 1, nr), tile_spec(H + 1, nr),
            tile_spec(H + 1, nr), tile_spec(4),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((H, NU * nx, _SUB, _LANES), dtype),   # K
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # d
            # line-search trial chains (best + current trial)
            pltpu.VMEM((H + 1, nx, _SUB, _LANES), dtype),    # X best
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # U best
            pltpu.VMEM((H + 1, nx, _SUB, _LANES), dtype),    # X trial
            pltpu.VMEM((H, NU, _SUB, _LANES), dtype),        # U trial
            # rows cache: multiplier update -> diagnostics handoff
            pltpu.VMEM((H + 1, 44 + (24 if cfg.boundary_rows else 0),
                        _SUB, _LANES), dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4, 10: 5},
        # whole-solve state is VMEM-resident: ~10 MB of blocks per tile plus
        # Mosaic's loop temporaries exceed the 16 MB default scoped limit;
        # v5e has 128 MiB physical VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0p, xrefp, obsp, mindp, wp, bndp, Up, llp, lhp, mup, pvp)


def solve_batch_fused(cfg: S.SolverConfig, params: S.OcpParams,
                      state: S.SqpState,
                      interpret: bool = False) -> S.Solution:
    """Fused-kernel batched solve; same contract as ``sqp.solve_batch``.

    Falls back to ``sqp_vec.solve_batch_vec`` when the problem shape is
    outside the kernel's v1 envelope (see :func:`eligible`).
    """
    if not eligible(cfg, params):
        from mpc_tpu.ops import sqp_vec
        return sqp_vec.solve_batch_vec(cfg, params, state)
    # no TPU attached (CPU tests): run the kernel through the interpreter
    interpret = interpret or jax.default_backend() != "tpu"

    # widen KS-schema params to the configured model's nx (ST): batch-safe
    # (normalize_params only touches trailing axes)
    params = S.normalize_params(cfg, params)
    nx = S.solver_nx(cfg)
    B = params.x0.shape[0]
    H = cfg.horizon
    padB = _cdiv(B, LANE_TILE) * LANE_TILE
    dtype = params.x0.dtype

    # Padded lanes (B -> padB) get a benign synthetic problem — v=1 state,
    # unit weights, far-away obstacle — so their algebra stays well away from
    # singular Quu / divide-by-zero instead of leaning on `reg` alone.  Their
    # results are sliced off by _unpack.
    def pad_rows(x, row):
        if padB == B:
            return x
        fill = jnp.broadcast_to(jnp.asarray(row, x.dtype),
                                (padB - B,) + x.shape[1:])
        return jnp.concatenate([x, fill], axis=0)

    benign_x = np.zeros((nx,), np.float32)
    benign_x[3] = 1.0  # v = 1
    x0p = _pack(pad_rows(params.x0, benign_x), padB)
    xrefp = _pack(pad_rows(params.x_ref, benign_x), padB)
    obs_flat = params.obs_centers.reshape(
        (B, 6) if params.obs_centers.ndim == 3 else (B, H + 1, 6))
    obsp = _pack(pad_rows(obs_flat, -1e4), padB)
    mindp = _pack(pad_rows(
        jnp.broadcast_to(params.min_dist.reshape(-1, 1), (B, 1)), 0.0), padB)
    wp = _pack(pad_rows(jnp.concatenate(
        [params.weights.q, params.weights.r, params.weights.qN], axis=-1),
        1.0), padB)
    Up = _pack(state.U, padB)
    llp = _pack(state.lam_lo, padB)
    lhp = _pack(state.lam_hi, padB)
    mup = _pack(jnp.maximum(state.mu, cfg.mu0), padB)
    mup = jnp.where(mup <= 0.0, cfg.mu0, mup)
    pvp = _pack(state.prev_viol, padB)
    if cfg.boundary_rows:
        X0 = jax.vmap(lambda p, U1: S._rollout(cfg, p, U1))(params.x0,
                                                            state.U)
        bnd = linearize_boundaries(cfg, X0, params.boundaries,
                                   params.boundary_signs)
        # padded lanes: zero normal + positive offset => trivially feasible
        r_ego = C.approx_circle_radius(cfg.ego_length, cfg.ego_width)[0]
        pad_bnd = np.zeros((18,), np.float32)
        pad_bnd[2::3] = r_ego + 1.0
        bndp = _pack(pad_rows(bnd, pad_bnd), padB)
    else:
        bndp = _pack(jnp.zeros((B, 1), dtype), padB)

    Xp, Unew, llo, lhi, mun, pvn, diag = _solve_packed(
        cfg, x0p, xrefp, obsp, mindp, wp, bndp, Up, llp, lhp, mup, pvp,
        interpret=interpret)

    X = _unpack(Xp, B)
    U = _unpack(Unew, B)
    lam_lo = _unpack(llo, B)
    lam_hi = _unpack(lhi, B)
    mu = _unpack(mun, B)
    prev_viol = _unpack(pvn, B)
    diag = _unpack(diag, B)
    stat, viol, cost, merit = diag[:, 0], diag[:, 1], diag[:, 2], diag[:, 3]
    viol = jnp.maximum(viol, 0.0)

    converged = (stat < cfg.tol_stat) & (viol < cfg.tol_feas)
    feasible = viol < jnp.asarray(cfg.tol_infeas, dtype)
    status = jnp.where(converged, 1,
                       jnp.where(feasible, 0, -7)).astype(jnp.int32)
    new_state = S.SqpState(U=U, lam_lo=lam_lo, lam_hi=lam_hi, mu=mu,
                           prev_viol=prev_viol)
    return S.Solution(X=X, U=U, state=new_state, status=status,
                      kkt_stat=stat, viol=viol, cost=cost, merit=merit)
