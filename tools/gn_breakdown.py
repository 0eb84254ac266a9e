"""Per-phase device timing of the batched Gauss-Newton iteration.

Answers "where does the solve time actually go" at the bench operating
point (B lanes, H=30) so kernel work (Pallas fusion) targets the real
bottleneck instead of the backward sweep the round-1 kernel fused.

Phases timed independently (each jitted, scalar-reduced, steady-state):
  rows        — constraint rows + AL terms over all stages
  quad        — full AL-GN quadratic model assembly (_build_quadratic)
  lin         — dynamics Jacobians (jacfwd through the integrator)
  backward    — lanes-trailing Riccati sweep (riccati_vec)
  rollout     — box-clamped feedback rollouts for ALL 6 alphas
  merit       — 6 candidate merits + the incumbent
  gn          — one full GN iteration (everything above + select)
  solve       — full solve_batch_vec (al_iters x sqp_iters + KKT)
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from mpc_tpu.ops import riccati_vec, sqp as S, sqp_vec
from mpc_tpu.utils import profiling
from tools.pscan_ablation import make_batch


def main():
    B = int(os.environ.get("GN_B", 2048))
    H = int(os.environ.get("GN_H", 30))
    cfg = S.SolverConfig(horizon=H, sqp_iters=3, al_iters=2)
    params = make_batch(B, H)
    state = jax.vmap(lambda _: S.init_state(cfg))(jnp.arange(B))

    rollout = jax.vmap(lambda p, U1: S._rollout(cfg, p.x0, U1))
    X = rollout(params, state.U)
    U = state.U
    lam_lo, lam_hi, mu = state.lam_lo, state.lam_hi, state.mu

    quad_fn = jax.vmap(lambda X1, U1, p1, ll, lh, m1: S._build_quadratic(
        cfg, X1, U1, p1, ll, lh, m1))
    quad, QH, qH = quad_fn(X, U, params, lam_lo, lam_hi, mu)
    lin_fn = jax.vmap(lambda X1, U1: S._linearize_dynamics(cfg, X1, U1))
    dyn = lin_fn(X, U)
    gains = riccati_vec.backward_pass_vec(quad, QH, qH, dyn, cfg.reg)
    u_lo, u_hi, _, _ = cfg.bounds.as_arrays(X.dtype)

    def rollout_fn(x0, Xb, Ub, K, d):
        return riccati_vec.feedback_rollout_vec(
            None, cfg.dt, cfg.wheelbase, x0, Xb, Ub, K, d,
            cfg.alphas, u_lo, u_hi, cfg.integrator, cfg.model, cfg.vehicle)

    Xa, Ua = rollout_fn(params.x0, X, U, gains.K, gains.d)

    def merit_fn(Xa, Ua, params, lam_lo, lam_hi, mu):
        return jax.vmap(
            lambda Xl, Ul, p1, ll, lh, m1: jax.vmap(
                lambda X1, U1: S._merit(cfg, X1, U1, p1, ll, lh, m1))(Xl, Ul),
            in_axes=(1, 1, 0, 0, 0, 0))(Xa, Ua, params, lam_lo, lam_hi, mu)

    rows_fn = jax.vmap(lambda X1, U1, p1: S._all_rows(cfg, X1, U1, p1))

    phases = [
        ("rows", lambda: profiling.time_jitted(rows_fn, X, U, params)),
        ("quad", lambda: profiling.time_jitted(
            quad_fn, X, U, params, lam_lo, lam_hi, mu)),
        ("lin", lambda: profiling.time_jitted(lin_fn, X, U)),
        ("backward", lambda: profiling.time_jitted(
            lambda q, qh2, qh3, d: riccati_vec.backward_pass_vec(
                q, qh2, qh3, d, cfg.reg), quad, QH, qH, dyn)),
        ("rollout", lambda: profiling.time_jitted(
            rollout_fn, params.x0, X, U, gains.K, gains.d)),
        ("merit", lambda: profiling.time_jitted(
            merit_fn, Xa, Ua, params, lam_lo, lam_hi, mu)),
        ("gn", lambda: profiling.time_jitted(
            lambda X1, U1: sqp_vec._gn_iteration_vec(
                cfg, params, lam_lo, lam_hi, mu, X1, U1), X, U)),
        ("solve", lambda: profiling.time_jitted(
            lambda p, s: sqp_vec.solve_batch_vec(cfg, p, s),
            params, state)),
    ]
    out = {"B": B, "H": H, "platform": jax.default_backend()}
    for name, f in phases:
        out[f"{name}_ms"] = round(1e3 * f(), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
