"""Quality evidence for the bench operating points (BENCH_QUALITY.json).

Two workloads (``mpc_tpu.utils.synthetic``):

* ``overtake`` — the throughput workload (pre-avoiding reference line).
  The headline bench runs the true-RTI (al 1x1) budget here — ONE warm
  Gauss-Newton iteration per closed-loop solve, the direct counterpart of
  the reference FORCESPRO deployment's ``maxqps=1`` (optimizer.py:237).
  Rows document that the cheap budget buys the SAME closed-loop quality
  as the heavier ones on this workload (trajectories within <1 mm).
* ``ca_stress`` — the budget-BINDING workload (VERDICT r4 weak #1): the
  reference line under-avoids by ~1 m and the obstacle enters the horizon
  mid-loop, so the solver must build the swerve from the CA rows under
  warm-RTI lag.  Here the budgets genuinely disagree (ungated (1,1)
  leaves ~6% of steps infeasible vs ~1% at (3,4)), and the shipped
  deployment treatment (applied-prefix gating, ``gate_stages=1`` — the
  same lever RTI1_CA_SETTINGS ships) is 100% feasible at every budget
  with realized clearance AT the bound.  Rows report per-budget
  feasibility, realized min obstacle clearance, and trajectory deviation
  stats, for BOTH engines (soft-constrained AL and hard-constrained IP —
  the reference's flagship mode, VERDICT r4 item 1).

Run on the real TPU:  timeout 3600 python tools/bench_quality.py
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

from mpc_tpu.models import constraints as C
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import synthetic


def min_clearance(lcfg, params, X):
    """Realized min distance from ego circle centers to obstacle centers."""
    scfg = lcfg.solver
    obs = np.asarray(params.obs_centers[0])  # (3, 2) static workloads

    def ego_centers(x):
        return C.circle_centers(x[0], x[1], scfg.ego_length, scfg.ego_width,
                                x[4])

    ec = np.asarray(jax.vmap(jax.vmap(ego_centers))(jnp.asarray(X)))
    d = np.linalg.norm(ec[:, :, :, None, :] - obs[None, None, None], axis=-1)
    return float(d.min())


def measure(label, batch, workload="overtake", n_steps=100, horizon=30,
            **solver_kw):
    lcfg, params = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=horizon, n_lanes=batch,
        workload=workload, **solver_kw)
    res = cl.closed_loop_batch_vec(lcfg, params)
    X = np.asarray(res.X)
    status = np.asarray(res.status)
    track = np.asarray(params.track.path[0, :n_steps])
    dev = np.linalg.norm(X[..., :2] - track[None], axis=-1)
    row = {
        "point": label,
        "workload": workload,
        "batch": batch,
        "n_steps": n_steps,
        "feasible": int(np.sum(status >= 0)),
        "total": int(status.size),
        "dev_mean_m": round(float(dev.mean()), 4),
        "dev_p99_m": round(float(np.percentile(dev, 99)), 4),
        "dev_max_m": round(float(dev.max()), 4),
    }
    if workload == "ca_stress":
        row["min_clearance_m"] = round(min_clearance(lcfg, params, X), 4)
        row["clearance_bound_m"] = round(float(np.asarray(
            params.min_dist)[0]), 2)
    return X, row


def main():
    B = 2048  # quality stats are budget-, not batch-, dependent
    rows = []

    # ---- overtake workload: AL ladder vs the (3,4) oracle budget --------
    X_ref, row_ref = measure("al3x4", B, method="al", al_iters=3,
                             sqp_iters=4)
    rows.append(row_ref)
    for label, kw in [
            ("al2x3", dict(al_iters=2, sqp_iters=3)),
            ("al1x2", dict(al_iters=1, sqp_iters=2)),
            ("al1x1", dict(al_iters=1, sqp_iters=1)),
            # merit-guarded full RTI step
            ("al1x1_rti", dict(al_iters=1, sqp_iters=1, alphas=(1.0,))),
            # the bench operating point: single GN step applied as the
            # UNGUARDED full RTI step (reference maxqps=1 semantics)
            ("al1x1_rti_unguarded",
             dict(al_iters=1, sqp_iters=1, alphas=()))]:
        X, row = measure(label, B, method="al", **kw)
        row["max_dxy_vs_al3x4_m"] = round(
            float(np.abs(X[..., :2] - X_ref[..., :2]).max()), 4)
        rows.append(row)

    # hard-constrained (forcespro-parity) headline point vs its IP oracle
    X_ipref, row_ipref = measure("ip5x10", B, method="ip", ip_sqp_iters=5,
                                 ip_iters=10)
    rows.append(row_ipref)
    for label, kw in [
            ("ip1x6_warm", dict(ip_sqp_iters=1, ip_iters=6,
                                ip_warm_duals=True)),
            # the hard-constrained bench point: 1 warm QP, 4 Newton steps,
            # UNGUARDED full RTI step (reference maxqps=1 semantics)
            ("ip1x4_warm_unguarded", dict(ip_sqp_iters=1, ip_iters=4,
                                          ip_warm_duals=True,
                                          ip_alphas=()))]:
        X, row = measure(label, B, method="ip", **kw)
        row["max_dxy_vs_ip5x10_m"] = round(
            float(np.abs(X[..., :2] - X_ipref[..., :2]).max()), 4)
        rows.append(row)

    # ---- ca_stress workload: where budget binds -------------------------
    Bs = 256  # enough lanes for the feasibility statistics
    for label, kw in [
            ("al3x4", dict(method="al", al_iters=3, sqp_iters=4)),
            ("al1x1_rti", dict(method="al", al_iters=1, sqp_iters=1,
                               alphas=(1.0,))),
            ("al1x1_rti_gate1", dict(method="al", al_iters=1, sqp_iters=1,
                                     alphas=(1.0,), gate_stages=1)),
            ("al1x1_unguarded", dict(method="al", al_iters=1, sqp_iters=1,
                                     alphas=())),
            ("al1x1_unguarded_gate1",
             dict(method="al", al_iters=1, sqp_iters=1, alphas=(),
                  gate_stages=1)),
            ("ip1x6_warm", dict(method="ip", ip_sqp_iters=1, ip_iters=6,
                                ip_warm_duals=True)),
            ("ip1x6_warm_gate1", dict(method="ip", ip_sqp_iters=1,
                                      ip_iters=6, ip_warm_duals=True,
                                      gate_stages=1)),
            ("ip1x4_warm_unguarded_gate1",
             dict(method="ip", ip_sqp_iters=1, ip_iters=4,
                  ip_warm_duals=True, ip_alphas=(), gate_stages=1)),
            ("ip2x6_warm", dict(method="ip", ip_sqp_iters=2, ip_iters=6,
                                ip_warm_duals=True))]:
        _, row = measure(label, Bs, workload="ca_stress", **kw)
        rows.append(row)

    out = {"platform": jax.default_backend(), "rows": rows}
    with open(os.path.join(REPO, "BENCH_QUALITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
