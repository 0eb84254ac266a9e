"""Quality evidence for the bench operating point (BENCH_QUALITY.json).

The headline benchmark runs the true-RTI (al 1x1) budget — ONE warm
Gauss-Newton iteration per closed-loop solve, the direct counterpart of the
reference FORCESPRO deployment's ``maxqps=1`` (optimizer.py:237).  This tool
documents that the cheap budget buys the SAME closed-loop quality as the
heavier ones on the bench workload: per-budget feasibility, realized
tracking-deviation statistics, and the max trajectory difference vs the
(3,4) production-default budget.

Run on the real TPU:  timeout 1800 python tools/bench_quality.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import synthetic


def measure(batch, al, gn, n_steps=100, horizon=30, alphas=None):
    kw = {} if alphas is None else {"alphas": alphas}
    lcfg, params = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=horizon, n_lanes=batch, method="al",
        al_iters=al, sqp_iters=gn, **kw)
    res = cl.closed_loop_batch_vec(lcfg, params)
    X = np.asarray(res.X)
    status = np.asarray(res.status)
    track = np.asarray(params.track.path[0, :n_steps])
    dev = np.linalg.norm(X[..., :2] - track[None], axis=-1)
    return X, {
        "al_x_gn": f"{al}x{gn}",
        "batch": batch,
        "n_steps": n_steps,
        "feasible": int(np.sum(status >= 0)),
        "total": int(status.size),
        "dev_mean_m": round(float(dev.mean()), 4),
        "dev_p99_m": round(float(np.percentile(dev, 99)), 4),
        "dev_max_m": round(float(dev.max()), 4),
    }


def main():
    B = 2048  # quality stats are budget-, not batch-, dependent
    rows = []
    X_ref, row_ref = measure(B, 3, 4)   # production-default budget
    rows.append(row_ref)
    for al, gn, alphas in [(2, 3, None), (1, 2, None), (1, 1, None),
                           # the bench operating point: single GN step,
                           # applied as the full RTI step when it improves
                           # the AL merit
                           (1, 1, (1.0,))]:
        X, row = measure(B, al, gn, alphas=alphas)
        if alphas is not None:
            row["alphas"] = list(alphas)
        # closed-loop trajectory difference vs the (3,4) oracle budget
        row["max_dxy_vs_3x4_m"] = round(
            float(np.abs(X[..., :2] - X_ref[..., :2]).max()), 4)
        rows.append(row)
    out = {"platform": jax.default_backend(), "rows": rows}
    with open(os.path.join(REPO, "BENCH_QUALITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
