"""Riccati backend ablation: sequential scan vs associative-scan (pscan).

The pscan backend is the horizon/stage-parallel path (SURVEY.md §2.3): at
long horizons the sequential Riccati recursion's latency is depth-bound
(H dependent steps of tiny 5x5 algebra), while the associative scan is
log-depth and — stage-sharded over a mesh 'sp' axis — spreads over chips.

Measures per-solve device time of `solve_batch` at several (B, H) points
for both backends on the current platform.

Usage:  timeout 1200 python tools/pscan_ablation.py            # real TPU
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from mpc_tpu.ops import sqp
from mpc_tpu.parallel import batch as pb
from mpc_tpu.utils import profiling, synthetic
from mpc_tpu.models.costs import Weights
from mpc_tpu.models.constraints import circle_centers

import numpy as np


def make_batch(B, H, dtype=jnp.float32):
    v, dt = 15.0, 0.1
    path, psi, obstacle = synthetic.overtake_track(H + 2, v, dt)
    x_ref = jnp.asarray(np.stack(
        [path[:H + 1, 0], path[:H + 1, 1], np.zeros(H + 1),
         np.full(H + 1, v), psi[:H + 1]], axis=1), dtype)
    centers = circle_centers(jnp.asarray(obstacle[0], dtype),
                             jnp.asarray(obstacle[1], dtype),
                             6.0, 3.5, jnp.asarray(0.0, dtype))
    params = sqp.OcpParams(
        x0=jnp.asarray([path[0, 0], path[0, 1], 0.0, v, psi[0]], dtype),
        x_ref=x_ref,
        obs_centers=centers,
        min_dist=jnp.asarray(3.3, dtype),
        weights=Weights.from_dict(synthetic.ZAM_LIKE_WEIGHTS, dtype))
    batch = pb.replicate_ocp(params, B)
    batch = pb.perturb_x0(batch, jax.random.PRNGKey(0),
                          jnp.asarray([0.5, 0.2, 0.0, 0.5, 0.02], dtype))
    return batch


def main():
    results = []
    for B, H in [(256, 30), (256, 120), (32, 120), (32, 240)]:
        batch = make_batch(B, H)
        row = {"B": B, "H": H, "platform": jax.default_backend()}
        for backend in ("scan", "pscan"):
            cfg = sqp.SolverConfig(horizon=H, lqr_backend=backend,
                                   sqp_iters=2, al_iters=2)
            states = jax.vmap(lambda _: sqp.init_state(cfg))(jnp.arange(B))
            sec = profiling.time_jitted(
                lambda p, s, c=cfg: sqp.solve_batch(c, p, s),
                batch, states, reps=5, warmup=1)
            row[f"{backend}_ms"] = round(1e3 * sec, 3)
            row[f"{backend}_us_per_solve"] = round(1e6 * sec / B, 2)
        row["pscan_speedup"] = round(row["scan_ms"] / row["pscan_ms"], 3)
        print(json.dumps(row))
        results.append(row)
    with open(os.path.join(REPO, "PSCAN_ABLATION.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
