"""Pallas TPU kernel: batched Riccati backward sweep.

The north-star hot path (BASELINE.json): the LQR backward recursion for
thousands of independent (lane, stage) problems.  The XLA `lax.scan` version
(``ops.riccati``) pays per-stage dispatch overhead x H x GN-iterations; this
kernel runs the whole sweep in one launch per lane-tile with the value
function resident in VMEM.

Layout (the tiny-matrix trick, SURVEY.md §7 "hard parts"): matrices are far
smaller than the 128x128 MXU, so lanes — not matrix rows — ride the vector
lanes.  Every (5x5) matrix entry becomes an (8, 128)-shaped vector register
over a 1024-lane tile, and the 5x5x5 products unroll into ~125 VPU FMAs per
matrix product.  Grid = (lane_tiles, H) with the stage axis sequential
("arbitrary") and reversed via the index map; stage operands stream
HBM -> VMEM through the automatic pipeline while P/p persist in scratch.

Inputs are pre-packed as (tiles, H, n*m, 8, 128) by ``pack_lanes``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_tpu.ops.riccati import LinDyn, RiccatiGains, StageQuad

NX = 5
NU = 2
LANE_TILE = 1024  # (8, 128) vector registers per matrix entry
_SUB = 8
_LANES = 128


def _ceil_div(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# packing helpers: (B, H, n, m) <-> (tiles, H, n*m, 8, 128)
# ---------------------------------------------------------------------------


def pack_lanes(x: jax.Array, pad_lanes: int) -> jax.Array:
    """(B, H, ...) -> (tiles, H, prod(...), 8, 128), lane-padded."""
    B, H = x.shape[0], x.shape[1]
    feat = 1
    for s in x.shape[2:]:
        feat *= s
    x = x.reshape(B, H, feat)
    if pad_lanes != B:
        pad = jnp.zeros((pad_lanes - B, H, feat), x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    tiles = pad_lanes // LANE_TILE
    x = x.reshape(tiles, LANE_TILE, H, feat)
    x = jnp.moveaxis(x, 1, -1)  # (tiles, H, feat, LANE_TILE)
    return x.reshape(tiles, H, feat, _SUB, _LANES)


def unpack_lanes(x: jax.Array, B: int, shape) -> jax.Array:
    """(tiles, H, feat, 8, 128) -> (B, H, *shape)."""
    tiles, H, feat = x.shape[0], x.shape[1], x.shape[2]
    x = x.reshape(tiles, H, feat, LANE_TILE)
    x = jnp.moveaxis(x, -1, 1).reshape(tiles * LANE_TILE, H, feat)
    return x[:B].reshape(B, H, *shape)


# ---------------------------------------------------------------------------
# in-kernel tiny-matrix algebra on (feat, 8, 128) refs
# ---------------------------------------------------------------------------


def _mat(ref, n, m):
    """Read ref -> list-of-rows representation [[entry_ij (8,128)]]."""
    v = ref[...]
    return [[v[i * m + j] for j in range(m)] for i in range(n)]


def _matmul(a, b, n, k, m):
    return [[sum(a[i][t] * b[t][j] for t in range(k)) for j in range(m)]
            for i in range(n)]


def _mat_t(a, n, m):
    """Transpose an (n x m) row-list into (m x n)."""
    return [[a[i][j] for i in range(n)] for j in range(m)]


def _mat_add(a, b, n, m):
    return [[a[i][j] + b[i][j] for j in range(m)] for i in range(n)]


def _matvec(a, x, n, m):
    return [sum(a[i][j] * x[j] for j in range(m)) for i in range(n)]


def _store(ref, rows, n, m):
    out = jnp.stack([rows[i][j] for i in range(n) for j in range(m)], axis=0)
    ref[...] = out


def _riccati_kernel(Q_ref, R_ref, M_ref, qx_ref, qu_ref, A_ref, B_ref, r_ref,
                    QH_ref, qH_ref, K_ref, d_ref, dv_ref, P_scr, p_scr, *,
                    horizon: int, reg: float):
    j = pl.program_id(1)  # sequential stage counter: j=0 -> stage H-1

    # initialize the value function from the terminal cost on the first step
    @pl.when(j == 0)
    def _():
        P_scr[...] = QH_ref[...]
        p_scr[...] = qH_ref[...]

    P = _mat(P_scr, NX, NX)
    p = [p_scr[i] for i in range(NX)]

    Q = _mat(Q_ref, NX, NX)
    Rm = _mat(R_ref, NU, NU)
    M = _mat(M_ref, NX, NU)
    A = _mat(A_ref, NX, NX)
    Bm = _mat(B_ref, NX, NU)
    qx = [qx_ref[i] for i in range(NX)]
    qu = [qu_ref[i] for i in range(NU)]
    r = [r_ref[i] for i in range(NX)]

    At = _mat_t(A, NX, NX)
    Bt = _mat_t(Bm, NX, NU)

    PA = _matmul(P, A, NX, NX, NX)
    PB = _matmul(P, Bm, NX, NX, NU)
    Pr_p = [p[i] + sum(P[i][k] * r[k] for k in range(NX)) for i in range(NX)]

    Qxx = _mat_add(Q, _matmul(At, PA, NX, NX, NX), NX, NX)
    Quu = _mat_add(Rm, _matmul(Bt, PB, NU, NX, NU), NU, NU)
    Qux = _mat_add(_mat_t(M, NX, NU), _matmul(Bt, PA, NU, NX, NX), NU, NX)
    gx = [qx[i] + sum(At[i][k] * Pr_p[k] for k in range(NX))
          for i in range(NX)]
    gu = [qu[i] + sum(Bt[i][k] * Pr_p[k] for k in range(NX))
          for i in range(NU)]

    # closed-form 2x2 inverse of Quu + reg*I
    a = Quu[0][0] + reg
    b = Quu[0][1]
    c = Quu[1][0]
    dd = Quu[1][1] + reg
    inv_det = 1.0 / (a * dd - b * c)
    Qi = [[dd * inv_det, -b * inv_det], [-c * inv_det, a * inv_det]]

    K = [[-(Qi[i][0] * Qux[0][j2] + Qi[i][1] * Qux[1][j2])
          for j2 in range(NX)] for i in range(NU)]
    d = [-(Qi[i][0] * gu[0] + Qi[i][1] * gu[1]) for i in range(NU)]

    # P' = Qxx + Qux' K (symmetrized), p' = gx + Qux' d
    QuxT = _mat_t(Qux, NU, NX)
    P_new = _mat_add(Qxx, _matmul(QuxT, K, NX, NU, NX), NX, NX)
    P_sym = [[0.5 * (P_new[i][j2] + P_new[j2][i]) for j2 in range(NX)]
             for i in range(NX)]
    p_new = [gx[i] + QuxT[i][0] * d[0] + QuxT[i][1] * d[1]
             for i in range(NX)]

    _store(P_scr, P_sym, NX, NX)
    p_stack = jnp.stack(p_new, axis=0)
    p_scr[...] = p_stack

    _store(K_ref, K, NU, NX)
    d_ref[...] = jnp.stack(d, axis=0)
    # predicted-decrease terms for the line search
    dv1 = d[0] * gu[0] + d[1] * gu[1]
    quu_d0 = (Quu[0][0] + reg) * d[0] + Quu[0][1] * d[1]
    quu_d1 = Quu[1][0] * d[0] + (Quu[1][1] + reg) * d[1]
    dv2 = d[0] * quu_d0 + d[1] * quu_d1
    dv_ref[...] = jnp.stack([dv1, dv2], axis=0)


@functools.partial(jax.jit, static_argnames=("horizon", "reg", "interpret"))
def _riccati_pallas_packed(Qp, Rp, Mp, qxp, qup, Ap, Bp, rp, QHp, qHp,
                           horizon: int, reg: float, interpret: bool):
    tiles = Qp.shape[0]
    H = horizon

    def stage_spec(feat):
        # grid j runs 0..H-1 -> stage H-1-j
        return pl.BlockSpec((1, 1, feat, _SUB, _LANES),
                            lambda t, j: (t, H - 1 - j, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def term_spec(feat):
        return pl.BlockSpec((1, feat, _SUB, _LANES),
                            lambda t, j: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_kernel, horizon=H, reg=reg)

    def squeeze_kernel(Q, R, M, qx, qu, A, B, r, QH, qH, K, d, dv, Ps, ps):
        _riccati_kernel(
            Q.at[0, 0], R.at[0, 0], M.at[0, 0], qx.at[0, 0], qu.at[0, 0],
            A.at[0, 0], B.at[0, 0], r.at[0, 0], QH.at[0], qH.at[0],
            K.at[0, 0], d.at[0, 0], dv.at[0, 0], Ps, ps,
            horizon=H, reg=reg)

    out_shapes = (
        jax.ShapeDtypeStruct((tiles, H, NU * NX, _SUB, _LANES), Qp.dtype),
        jax.ShapeDtypeStruct((tiles, H, NU, _SUB, _LANES), Qp.dtype),
        jax.ShapeDtypeStruct((tiles, H, 2, _SUB, _LANES), Qp.dtype),
    )
    grid = (tiles, H)
    K, d, dv = pl.pallas_call(
        squeeze_kernel,
        grid=grid,
        in_specs=[
            stage_spec(NX * NX), stage_spec(NU * NU), stage_spec(NX * NU),
            stage_spec(NX), stage_spec(NU),
            stage_spec(NX * NX), stage_spec(NX * NU), stage_spec(NX),
            term_spec(NX * NX), term_spec(NX),
        ],
        out_specs=(
            stage_spec(NU * NX), stage_spec(NU), stage_spec(2),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((NX * NX, _SUB, _LANES), Qp.dtype),
            pltpu.VMEM((NX, _SUB, _LANES), Qp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(Qp, Rp, Mp, qxp, qup, Ap, Bp, rp, QHp, qHp)
    return K, d, dv


def backward_pass_pallas(quad: StageQuad, QH: jax.Array, qH: jax.Array,
                         dyn: LinDyn, reg: float,
                         interpret: bool = False) -> RiccatiGains:
    """Batched backward sweep; leading axis of every input is the lane axis.

    quad.*: (B, H, ...), QH: (B, NX, NX), qH: (B, NX).
    Returns gains with leading lane axis: K (B, H, NU, NX), d (B, H, NU),
    dV1/dV2 (B,).
    """
    B, H = quad.Q.shape[0], quad.Q.shape[1]
    padB = _ceil_div(B, LANE_TILE) * LANE_TILE

    Qp = pack_lanes(quad.Q, padB)
    Rp = pack_lanes(quad.R, padB)
    Mp = pack_lanes(quad.M, padB)
    qxp = pack_lanes(quad.qx, padB)
    qup = pack_lanes(quad.qu, padB)
    Ap = pack_lanes(dyn.A, padB)
    Bp = pack_lanes(dyn.B, padB)
    rp = pack_lanes(dyn.r, padB)
    QHp = pack_lanes(QH[:, None], padB)[:, 0]
    qHp = pack_lanes(qH[:, None], padB)[:, 0]

    K, d, dv = _riccati_pallas_packed(Qp, Rp, Mp, qxp, qup, Ap, Bp, rp,
                                      QHp, qHp, horizon=H, reg=float(reg),
                                      interpret=interpret)
    Kb = unpack_lanes(K, B, (NU, NX))
    db = unpack_lanes(d, B, (NU,))
    dvb = unpack_lanes(dv, B, (2,))
    return RiccatiGains(K=Kb, d=db, dV1=jnp.sum(dvb[..., 0], axis=1),
                        dV2=jnp.sum(dvb[..., 1], axis=1))
