"""Benchmark: warm-started receding-horizon NMPC solves/s per chip at H=30.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the production closed-loop step — exactly what both reference
solvers time in their ``solve time.txt`` series (warm-started per-step
solves): a batch of perturbed overtaking lanes runs ``n_steps`` receding-
horizon iterations on-device (reference windowing + full constraint stack +
plant propagation); solves/s = lanes * steps / wall.

Baseline context (BASELINE.json / SURVEY.md §6):
  * reference FORCESPRO p50 per-solve: 2.35 ms at H=10 => ~426 solves/s
  * reference CasADi/IPOPT p50: ~35-39 ms/solve
  * north star: >= 5000 solves/s on a v5e-8 at H=30 => 625 per chip
    ``vs_baseline`` = value / 625.
"""
from __future__ import annotations

import json
import time

import jax


PER_CHIP_TARGET = 5000.0 / 8.0  # north-star per-chip share on a v5e-8


def run_bench(batch: int = 1024, horizon: int = 30, n_steps: int = 20,
              repeats: int = 6):
    from mpc_tpu.planner import closed_loop as cl
    from mpc_tpu.utils import synthetic

    # RTI operating point (al_iters=2, sqp_iters=3 = 6 Gauss-Newton steps
    # per warm-started solve) with full-strength cold-start warmup: on this
    # workload it is 100% feasible with tracking identical to the
    # (3, 4) production default, at ~2x the throughput (PARITY.md
    # ablations).  Still conservative next to the reference FORCESPRO
    # deployment's 1 QP per step (``maxqps=1``, optimizer.py:237).
    lcfg, params = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=horizon, n_lanes=batch, method="al",
        al_iters=2, sqp_iters=3)

    import numpy as np

    res = cl.closed_loop_batch_vec(lcfg, params)  # compile
    np.asarray(res.X)  # force full materialization (block_until_ready does
    # not reliably block on the axon relay platform)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = cl.closed_loop_batch_vec(lcfg, params)
        np.asarray(res.X)
        best = min(best, time.perf_counter() - t0)

    solves = batch * n_steps
    ok = int(np.sum(np.asarray(res.status) >= 0))
    return solves / best, best / n_steps, ok, solves


def main():
    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    # round-3 fused-engine batch sweep on v5e (closed-loop solves/s/chip):
    # 2048 -> 428k, 4096 -> 301-364k, 8192 -> 538-569k, 16384 -> 530k;
    # 8192 (8 lane tiles) is the ceiling
    batch = 8192 if platform != "cpu" else 128
    solves_per_s, step_latency, ok, total = run_bench(batch=batch)
    per_chip = solves_per_s / n_dev
    result = {
        "metric": "nmpc_solves_per_s_per_chip_h30",
        "value": round(per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / PER_CHIP_TARGET, 3),
        "batch": batch,
        "step_latency_ms": round(step_latency * 1e3, 3),
        "feasible_steps": ok,
        "total_solves": total,
        "devices": n_dev,
        "platform": platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
