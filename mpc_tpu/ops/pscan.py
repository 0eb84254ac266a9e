"""Parallel-scan (associative) Riccati backend.

Log-depth alternative to the sequential backward/forward sweeps in
``mpc_tpu.ops.riccati``: the LQR value-function recursion is expressed as an
associative composition of conditional-value-function elements
(Sarkka & Garcia-Fernandez, "Temporal Parallelization of Dynamic Programming
and Linear Quadratic..."-style 5-tuples) and evaluated with
``jax.lax.associative_scan``.  This is the horizon/stage-parallel idiom this
framework uses where a transformer would use sequence parallelism
(SURVEY.md §5 "long-context" row): for long horizons the stage axis can be
sharded over the mesh's ``sp`` axis and XLA turns the scan's combine steps
into ICI collectives.

Cross terms M are eliminated by completing the square in the controls before
building elements; linear cost terms ride the eta channel; affine dynamics
terms ride the b channel.  Verified bit-tight against the sequential sweep in
``tests/test_pscan.py``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_tpu.ops.riccati import (LinDyn, RiccatiGains, StageQuad, _inv_nu)


class _Elem(NamedTuple):
    """Conditional value-function element (stacked over stages)."""

    A: jax.Array    # (n, nx, nx)
    b: jax.Array    # (n, nx)
    C: jax.Array    # (n, nx, nx)
    eta: jax.Array  # (n, nx)
    J: jax.Array    # (n, nx, nx)


def _combine(ei: _Elem, ej: _Elem) -> _Elem:
    """Compose element i (earlier) with element j (later).  Batched."""
    nx = ei.A.shape[-1]
    I = jnp.eye(nx, dtype=ei.A.dtype)
    # (I + C_i J_j)^{-1} applied from the left
    M1 = I + ei.C @ ej.J
    M2 = I + ej.J @ ei.C
    # solve instead of inverse for stability
    S1 = jnp.linalg.solve(M1, jnp.concatenate(
        [ei.A, (ei.b + (ei.C @ ej.eta[..., None]).squeeze(-1))[..., None],
         ei.C], axis=-1))
    A1 = S1[..., :nx]
    bc = S1[..., nx]
    C1 = S1[..., nx + 1:]
    A = ej.A @ A1
    b = (ej.A @ bc[..., None]).squeeze(-1) + ej.b
    C = ej.A @ C1 @ jnp.swapaxes(ej.A, -1, -2) + ej.C
    S2 = jnp.linalg.solve(M2, jnp.concatenate(
        [(ej.eta - (ej.J @ ei.b[..., None]).squeeze(-1))[..., None],
         ej.J @ ei.A], axis=-1))
    eta = (jnp.swapaxes(ei.A, -1, -2) @ S2[..., 0][..., None]
           ).squeeze(-1) + ei.eta
    J = jnp.swapaxes(ei.A, -1, -2) @ S2[..., 1:] + ei.J
    # numerical hygiene: J and C are symmetric by construction
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    return _Elem(A=A, b=b, C=C, eta=eta, J=J)


def _eliminate_cross_terms(quad: StageQuad, dyn: LinDyn, reg):
    """Complete the square in u: v = u + R^{-1} (M' dx + qu).

    Returns (Qt, qt, At, rt, R_reg, Rinv_Mt, Rinv_qu) where the transformed
    problem has no cross terms and v-controls.
    """
    R_reg = quad.R + reg * jnp.eye(quad.R.shape[-1], dtype=quad.R.dtype)
    Rinv = _inv_nu(R_reg)
    Mt = jnp.swapaxes(quad.M, -1, -2)          # (H, nu, nx)
    Rinv_Mt = Rinv @ Mt                        # (H, nu, nx)
    Rinv_qu = (Rinv @ quad.qu[..., None]).squeeze(-1)  # (H, nu)
    Qt = quad.Q - quad.M @ Rinv_Mt
    qt = quad.qx - (quad.M @ Rinv_qu[..., None]).squeeze(-1)
    At = dyn.A - dyn.B @ Rinv_Mt
    rt = dyn.r - (dyn.B @ Rinv_qu[..., None]).squeeze(-1)
    return Qt, qt, At, rt, R_reg, Rinv_Mt, Rinv_qu


def value_functions(quad: StageQuad, QH: jax.Array, qH: jax.Array,
                    dyn: LinDyn, reg: float | jax.Array):
    """All value functions (P_k, p_k), k = 0..H, via associative scan."""
    Qt, qt, At, rt, R_reg, _, _ = _eliminate_cross_terms(quad, dyn, reg)
    Rinv = _inv_nu(R_reg)
    C_k = dyn.B @ Rinv @ jnp.swapaxes(dyn.B, -1, -2)

    nx = At.shape[-1]
    dtype = At.dtype
    zeros_m = jnp.zeros((1, nx, nx), dtype)
    zeros_v = jnp.zeros((1, nx), dtype)
    elems = _Elem(
        A=jnp.concatenate([At, zeros_m], axis=0),
        b=jnp.concatenate([rt, zeros_v], axis=0),
        C=jnp.concatenate([C_k, zeros_m], axis=0),
        eta=jnp.concatenate([-qt, -qH[None]], axis=0),
        J=jnp.concatenate([Qt, QH[None]], axis=0),
    )
    # suffix compositions: element k composed with everything after it.
    # reverse=True flips the array before scanning, so the combine's first
    # argument covers LATER time indices — swap into _combine's
    # (earlier, later) convention.
    suffix = jax.lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                      reverse=True)
    P = suffix.J          # (H+1, nx, nx)
    p = -suffix.eta       # (H+1, nx)
    return P, p


def backward_pass_pscan(quad: StageQuad, QH: jax.Array, qH: jax.Array,
                        dyn: LinDyn, reg: float | jax.Array) -> RiccatiGains:
    """Drop-in replacement for ``riccati.backward_pass`` (log-depth)."""
    P, p = value_functions(quad, QH, qH, dyn, reg)
    P1, p1 = P[1:], p[1:]   # value at k+1 for each stage k

    Bt = jnp.swapaxes(dyn.B, -1, -2)
    Quu = quad.R + Bt @ P1 @ dyn.B
    Qux = jnp.swapaxes(quad.M, -1, -2) + Bt @ P1 @ dyn.A
    gu = quad.qu + (Bt @ (p1 + (P1 @ dyn.r[..., None]).squeeze(-1)
                          )[..., None]).squeeze(-1)
    Quu_reg = Quu + reg * jnp.eye(Quu.shape[-1], dtype=Quu.dtype)
    Quu_inv = _inv_nu(Quu_reg)
    K = -(Quu_inv @ Qux)
    d = -(Quu_inv @ gu[..., None]).squeeze(-1)
    dV1 = jnp.sum(jnp.einsum("ku,ku->k", d, gu))
    dV2 = jnp.sum(jnp.einsum("ku,kuv,kv->k", d, Quu_reg, d))
    return RiccatiGains(K=K, d=d, dV1=dV1, dV2=dV2)


def forward_rollout_pscan(gains: RiccatiGains, dyn: LinDyn,
                          dx0: jax.Array):
    """Linear forward rollout as an associative scan of affine maps."""
    M = dyn.A + dyn.B @ gains.K                       # (H, nx, nx)
    v = (dyn.B @ gains.d[..., None]).squeeze(-1) + dyn.r  # (H, nx)

    def comb(a, b):
        # a earlier, b later: x -> Mb (Ma x + va) + vb
        Ma, va = a
        Mb, vb = b
        return Mb @ Ma, (Mb @ va[..., None]).squeeze(-1) + vb

    Mc, vc = jax.lax.associative_scan(comb, (M, v))
    dX_tail = (Mc @ dx0[..., None]).squeeze(-1) + vc  # dx_1..dx_H
    dX = jnp.concatenate([dx0[None], dX_tail], axis=0)
    dU = (gains.K @ dX[:-1][..., None]).squeeze(-1) + gains.d
    return dX, dU


def solve_lqr_pscan(quad: StageQuad, QH: jax.Array, qH: jax.Array,
                    dyn: LinDyn, dx0: jax.Array, reg: float | jax.Array):
    """Full log-depth LQR solve (drop-in for ``riccati.solve_lqr``)."""
    gains = backward_pass_pscan(quad, QH, qH, dyn, reg)
    dX, dU = forward_rollout_pscan(gains, dyn, dx0)
    return dX, dU, gains
