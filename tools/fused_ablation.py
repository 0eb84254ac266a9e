"""Fused Pallas whole-solve kernels vs their XLA reference paths.

AL rows (round-1 bar): kernel >= 1.3x over ``sqp_vec`` at B=2048 / H=30.
IP rows (round-2 bar, VERDICT item 1): the fused hard-constrained RTI-SQP
kernel (``ops.fused_ip``) >= 5x over the vmapped ``sqp.solve_batch``
ip path at B=2048 / H=30.  Run on the real TPU:

    timeout 1800 python tools/fused_ablation.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops import fused_gn, fused_ip, sqp, sqp_vec
from mpc_tpu.utils import profiling
from tools.pscan_ablation import make_batch


def ip_rows(results):
    """Fused IP kernel vs the vmapped ip path (forcespro-parity mode).

    Rows with ``ip_alphas`` set are the round-5 warm-path budget sweep
    (VERDICT r4 item 2): at the warm steady state the 6-Newton-step /
    5-rung-ladder budget is overkill — these rows shrink both, timing the
    solve FROM a prewarmed state (one full-strength 5x10 solve first), the
    deployment condition the budget targets.
    """
    for B, H, sqp_i, ip_i, warm, ladder in [
            (2048, 30, 5, 10, False, None),
            (2048, 9, 5, 10, False, None),
            (2048, 9, 1, 10, True, None),
            # hard-constrained serving throughput at the bench's ceiling
            # batch
            (12288, 30, 1, 6, True, None),
            # warm-path sweep: fewer Newton steps, shrunk/unguarded ladder
            (12288, 30, 1, 4, True, (1.0,)),
            (12288, 30, 1, 4, True, ()),
            (12288, 30, 1, 3, True, ()),
            (12288, 30, 1, 2, True, ())]:
        kw = {} if ladder is None else {"ip_alphas": ladder}
        cfg = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=sqp_i,
                               ip_iters=ip_i, ip_warm_duals=warm, **kw)
        params = make_batch(B, H)
        state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
        prewarmed = ladder is not None
        if prewarmed:
            full = sqp.SolverConfig(horizon=H, method="ip", ip_sqp_iters=5,
                                    ip_iters=10, ip_warm_duals=True)
            state = fused_ip.solve_batch_fused_ip(full, params, state).state

        t_vmap = profiling.time_jitted(
            lambda p, s, c=cfg: sqp.solve_batch(c, p, s),
            params, state, reps=3, warmup=1)
        t_fused = profiling.time_jitted(
            lambda p, s, c=cfg: fused_ip.solve_batch_fused_ip(c, p, s),
            params, state, reps=3, warmup=1)

        ref = sqp.solve_batch(cfg, params, state)
        got = fused_ip.solve_batch_fused_ip(cfg, params, state)
        du = float(jnp.max(jnp.abs(got.U - ref.U)))
        ok = int(jnp.sum(got.status >= 0))
        row = {
            "B": B, "H": H, "mode": "ip",
            "sqp_x_ip": f"{sqp_i}x{ip_i}", "warm_duals": warm,
            "vmap_ms": round(1e3 * t_vmap, 3),
            "fused_ms": round(1e3 * t_fused, 3),
            "speedup": round(t_vmap / t_fused, 3),
            "fused_us_per_solve": round(1e6 * t_fused / B, 2),
            "max_dU_vs_vmap": round(du, 5),
            "feasible": ok,
            "platform": jax.default_backend(),
        }
        if ladder is not None:
            row["ip_alphas"] = ("unguarded" if len(ladder) == 0
                                else str(ladder))
            row["prewarmed"] = True
        print(json.dumps(row), flush=True)
        results.append(row)


def envelope_rows(results):
    """Widened-envelope rows: moving obstacle + boundary rows (r2 item 5)."""
    import numpy as np

    B, H = 2048, 30
    base = make_batch(B, H)
    state_of = lambda c: jax.vmap(lambda _: sqp.init_state(c))(jnp.arange(B))

    # moving obstacle: per-stage drifting centers
    ts = jnp.arange(H + 1, dtype=jnp.float32)[None, :, None, None]
    moving = base._replace(obs_centers=base.obs_centers[:, None]
                           + ts * jnp.asarray([0.5, 0.02]))
    # boundary corridor (straight lines; see tests/test_fused_gn.py)
    n = 64
    xs = np.linspace(1e3, -1e3, n)
    # corridor wide enough that the overtake line (y up to 3.6 + r_ego
    # 1.2 + obstacle clearance) stays strictly feasible
    bnds = jnp.asarray(np.stack([
        np.stack([xs, np.full(n, 6.5)], 1),
        np.stack([-xs, np.full(n, -6.5)], 1)]), jnp.float32)
    bounded = base._replace(
        boundaries=jnp.broadcast_to(bnds[None], (B,) + bnds.shape),
        boundary_signs=jnp.ones((B, 2), jnp.float32))

    for label, cfg, params in [
        ("al_moving", sqp.SolverConfig(horizon=H, al_iters=2, sqp_iters=3),
         moving),
        ("al_boundary", sqp.SolverConfig(horizon=H, al_iters=2, sqp_iters=3,
                                         boundary_rows=True), bounded),
        ("ip_moving", sqp.SolverConfig(horizon=H, method="ip",
                                       ip_sqp_iters=2, ip_iters=6), moving),
        ("ip_boundary", sqp.SolverConfig(horizon=H, method="ip",
                                         ip_sqp_iters=2, ip_iters=6,
                                         boundary_rows=True), bounded),
    ]:
        state = state_of(cfg)
        if cfg.method == "al":
            fused = lambda p, s, c=cfg: fused_gn.solve_batch_fused(c, p, s)
        else:
            fused = lambda p, s, c=cfg: fused_ip.solve_batch_fused_ip(
                c, p, s)
        t_fused = profiling.time_jitted(fused, params, state,
                                        reps=3, warmup=1)
        got = fused(params, state)
        ok = int(jnp.sum(got.status >= 0))
        row = {
            "B": B, "H": H, "variant": label,
            "fused_ms": round(1e3 * t_fused, 3),
            "fused_us_per_solve": round(1e6 * t_fused / B, 2),
            "feasible": ok,
            "platform": jax.default_backend(),
        }
        print(json.dumps(row), flush=True)
        results.append(row)


def main():
    results = []
    ip_rows(results)
    envelope_rows(results)
    for B, H, iters in [(2048, 30, (2, 3)), (2048, 30, (3, 4)),
                        (4096, 30, (2, 3)), (1024, 9, (2, 3))]:
        al, gn = iters
        cfg = sqp.SolverConfig(horizon=H, al_iters=al, sqp_iters=gn)
        params = make_batch(B, H)
        state = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))

        t_vec = profiling.time_jitted(
            lambda p, s, c=cfg: sqp_vec.solve_batch_vec(c, p, s),
            params, state, reps=5, warmup=1)
        t_fused = profiling.time_jitted(
            lambda p, s, c=cfg: fused_gn.solve_batch_fused(c, p, s),
            params, state, reps=5, warmup=1)

        # correctness spot check on the compiled path
        ref = sqp_vec.solve_batch_vec(cfg, params, state)
        got = fused_gn.solve_batch_fused(cfg, params, state)
        du = float(jnp.max(jnp.abs(got.U - ref.U)))
        ok = int(jnp.sum(got.status >= 0))

        row = {
            "B": B, "H": H, "al_x_gn": f"{al}x{gn}",
            "vec_ms": round(1e3 * t_vec, 3),
            "fused_ms": round(1e3 * t_fused, 3),
            "speedup": round(t_vec / t_fused, 3),
            "vec_us_per_solve": round(1e6 * t_vec / B, 2),
            "fused_us_per_solve": round(1e6 * t_fused / B, 2),
            "max_dU_vs_vec": round(du, 5),
            "feasible": ok,
            "platform": jax.default_backend(),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    with open(os.path.join(REPO, "FUSED_ABLATION.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
