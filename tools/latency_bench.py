"""Single-stream (B=1) warm-solve latency on the real TPU.

Measures the per-step latency of the production receding-horizon loop and
compares it against the reference's per-step solve-time budget
(FORCESPRO p50 2.35 ms at N=10 on its x86 host — reference artifact
``test/2D_plots_forcespro_ZAM_Over-1_1_lane_following/solve time.txt``;
CasADi p50 35-39 ms).

Two numbers per operating point:

  * ``device_ms``  — amortized per-step DEVICE time of a K-step
    ``closed_loop_chunk`` (one dispatch, K chained warm solves on device,
    one scalar fetched).  This is the honest deployment latency on locally
    attached hardware: each step is a full warm NMPC solve + reference
    windowing + plant-free carry update, with no host round-trip.
  * ``host_ms``    — wall time per single-step call through
    ``OnlinePlanner.step`` (includes one host->device dispatch + result
    fetch per step).  On THIS environment the TPU is tunnel-attached, so
    host_ms is dominated by ~30 ms relay RTT — reported for completeness,
    not comparable to the reference's locally-attached budget.

Operating points: the forcespro-parity defaults (5 SQP x 10 IP iterations)
and the true real-time-iteration budget (1 warm-started QP per step — the
reference FORCESPRO deployment's ``maxqps=1``, ``optimizer.py:237``), at
N=10 (H=9) and H=30.

Usage:  timeout 900 python tools/latency_bench.py          # real TPU
        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/latency_bench.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

from mpc_tpu.io.config import load_config
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import profiling

BUDGET_FP_MS = 2.35    # reference forcespro p50, USA LF (BASELINE.md)
BUDGET_CA_MS = 35.26   # reference casadi p50, USA LF


def measure_point(cfg, label, horizon, k_steps=30, reps=20,
                  **solver_overrides):
    lcfg = cl.make_loop_config(cfg, horizon=horizon, noised=False,
                               **solver_overrides)
    lcfg = dataclasses.replace(lcfg, n_steps=k_steps)
    params = cl.make_loop_params(cfg, lcfg)
    carry = cl.init_carry(lcfg, params)

    # amortized device time per chained warm solve
    sec = profiling.time_jitted(
        lambda c: cl.closed_loop_chunk(lcfg, params, c, k_steps)[1],
        carry, reps=reps, warmup=2)
    device_ms = 1e3 * sec / k_steps

    # host-observed per-call latency (includes dispatch round trips)
    from mpc_tpu.planner.online import OnlinePlanner
    op = OnlinePlanner(cfg, horizon=horizon, **solver_overrides)
    x = np.asarray(params.x_init)
    op.step(x)  # compile
    op.reset()
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        x_now = np.asarray(op._carry[1])
        op.step(x_now)
        times.append(time.perf_counter() - t0)
    host_ms = 1e3 * float(np.percentile(times, 50))

    # quality gate: the budgeted operating point must stay feasible over
    # the whole run (per-step status >= 0)
    res = cl.closed_loop_jit(lcfg, params)
    status_min = int(np.asarray(res.status).min())

    out = {
        "point": label,
        "horizon": int(lcfg.solver.horizon),
        "method": lcfg.solver.method,
        "sqp_iters": int(lcfg.solver.ip_sqp_iters
                         if lcfg.solver.method == "ip"
                         else lcfg.solver.sqp_iters * lcfg.solver.al_iters),
        "device_ms_per_step": round(device_ms, 4),
        "host_ms_per_call_p50": round(host_ms, 3),
        "status_min": status_min,
        "vs_forcespro_budget": round(BUDGET_FP_MS / device_ms, 2),
        "vs_casadi_budget": round(BUDGET_CA_MS / device_ms, 1),
        "platform": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


def _load(name):
    cfg = load_config(os.path.join(REPO, "configs", name),
                      os.path.join(REPO, "scenarios"))
    return type(cfg)(**{**cfg.__dict__, "framework": "forcespro"})


def main():
    cfg = _load("config_LF_ZAM_Over-1_1.yaml")

    results = [
        # reference-parity operating point: N=10 (H=9), default IP budget
        measure_point(cfg, "fp_default_h9", horizon=10),
        # budget-beating feasible points (round-2 sweep):
        measure_point(cfg, "al23_h9", horizon=10, method="al",
                      al_iters=2, sqp_iters=3),
        measure_point(cfg, "ip2x6_h9", horizon=10,
                      ip_sqp_iters=2, ip_iters=6),
        # 2-relinearization warm point (fastest fully-feasible CA budget)
        measure_point(cfg, "ip2x6w_h9", horizon=10,
                      ip_sqp_iters=2, ip_iters=6, ip_warm_duals=True),
        # deep horizon (the BASELINE.json H=30 target has no ref analog)
        measure_point(cfg, "ip2x8_h30", horizon=31,
                      ip_sqp_iters=2, ip_iters=8),
        # at H=30 the whole approach-and-stop maneuver sits inside one
        # horizon and AL(2x3) is genuinely multiplier-budget-bound
        # (status -7 at mid-run steps regardless of warmup — r5 sweep);
        # AL(3x4) is the cheapest fully-feasible AL point at this depth,
        # so THAT is the deployment row (VERDICT r4 weak #5)
        measure_point(cfg, "al34_h30", horizon=31, method="al",
                      al_iters=3, sqp_iters=4),
    ]
    # true RTI — 1 warm-started QP per step (reference maxqps=1 with
    # nlp.TolIneq = -1, optimizer.py:237-240) on all three reference
    # scenarios, at the deployment presets (closed_loop.RTI1_SETTINGS /
    # RTI1_CA_SETTINGS): LF runs the reference horizon N=10 and is fully
    # feasible under the honest full-plan gate; CA extends the horizon to
    # N=14 with applied-prefix gating (tests/test_closed_loop.py::
    # test_true_rti_one_qp_all_scenarios; the reference's own recorded CA
    # run exceeds its friction bound by 27% — PARITY.md "true-RTI parity").
    for name, label, horizon, settings in [
            ("config_LF_ZAM_Over-1_1.yaml", "rti1_zamlf_h9", 10,
             cl.RTI1_SETTINGS),
            ("config_CA_ZAM_Over-1_1.yaml", "rti1_zamca_h13", 14,
             {k: v for k, v in cl.RTI1_CA_SETTINGS.items()
              if k != "horizon"}),
            ("config_LF_USA_Lanker-2_18_T-1.yaml", "rti1_usalf_h9", 10,
             cl.RTI1_SETTINGS)]:
        r = measure_point(_load(name), label, horizon=horizon, **settings)
        r["qp_per_step"] = 1
        results.append(r)
    with open(os.path.join(REPO, "LATENCY.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
