"""Run every configured scenario x formulation and tabulate results.

Replaces the reference's workflow of editing ``config_name`` in the unittest
(``test/test_mpc_planner.py:16``) once per configuration: all six
(formulation x scenario x use-case) combinations run in one command, with
reference-format artifacts and a summary table.

    python tools/run_all.py --scenario-dir scenarios \
        --config-dir configs --out /tmp/all [--deterministic]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenarios"))
    ap.add_argument("--config-dir", default="configs")
    ap.add_argument("--out", default=None)
    ap.add_argument("--deterministic", action="store_true")
    ap.add_argument("--frameworks", default="casadi,forcespro")
    args = ap.parse_args()

    from mpc_tpu.io.config import load_config
    from mpc_tpu.planner.planner import MPCPlanner

    configs = sorted(f for f in os.listdir(args.config_dir)
                     if f.endswith(".yaml"))
    frameworks = args.frameworks.split(",")
    rows = []
    for cfg_file in configs:
        base = load_config(os.path.join(args.config_dir, cfg_file),
                           args.scenario_dir)
        for fw in frameworks:
            c = dataclasses.replace(base, framework=fw)
            planner = MPCPlanner(
                c, noised=False if args.deterministic else None)
            result = planner.plan()
            if args.out:
                planner.save_artifacts(result, args.out)
            rows.append({
                "config": cfg_file,
                "framework": fw,
                # cross-framework rows run a config under the OTHER
                # formulation for comparison; specialized configs
                # (boundary corridor, detour) are tuned for their own
                "native": fw == base.framework,
                "steps": int(result.states.shape[0]),
                "ms_per_step": round(1e3 * result.wall_time_s
                                     / result.states.shape[0], 3),
                "rmsd_x": (round(result.rmsd["x"], 4)
                           if result.rmsd else None),
                "rmsd_y": (round(result.rmsd["y"], 4)
                           if result.rmsd else None),
                "collision": bool(result.collided_obstacle
                                  or result.collided_boundary),
                "bad_status_steps": int((result.status < 0).sum()),
            })
            print(json.dumps(rows[-1]), flush=True)

    print("\n== summary ==")
    hdr = ["config", "framework", "native", "steps", "ms_per_step", "rmsd_x",
           "rmsd_y", "collision", "bad_status_steps"]
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[h]) for h in hdr))
    if args.out:
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
