"""High-level planner facade.

Replaces the reference's ``MPCPlanner`` driver (``MPC_Planner/mpc_planner.py:
21-314``): dispatches on the configured formulation, runs the on-device
closed loop, computes metrics, validates collisions, and writes artifacts in
the reference's text formats (``planned states.txt``, ``control inputs.txt``,
``solve time.txt``, ``deviation.txt``, ``RMSD.txt`` — ``mpc_planner.py:197,
211, 237, 253, 290``) so downstream comparison tooling carries over.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from mpc_tpu.io.config import PlanningConfig
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import metrics as met
from mpc_tpu.utils import native


@dataclasses.dataclass
class PlanResult:
    states: np.ndarray        # (T, 5)
    inputs: np.ndarray        # (T, 2)
    solve_time: np.ndarray    # (T,) seconds: measured per step (host-timed
                              # warm solve incl. dispatch, the reference's
                              # semantics at optimizer.py:603-608), or the
                              # amortized wall/T fill when plan() ran the
                              # single fused scan (per_step_timing=False)
    status: np.ndarray        # (T,)
    rmsd: Optional[Dict[str, float]]
    deviation: np.ndarray     # (T,)
    collided_obstacle: bool
    collided_boundary: bool
    wall_time_s: float


class MPCPlanner:
    """Scenario-level planner: config in, trajectory + artifacts out."""

    def __init__(self, config: PlanningConfig,
                 horizon: Optional[int] = None,
                 noised: Optional[bool] = None,
                 seed: int = 0,
                 **solver_overrides):
        self.config = config
        self.loop_config = cl.make_loop_config(
            config, horizon=horizon, noised=noised, **solver_overrides)
        self.loop_params = cl.make_loop_params(config, self.loop_config,
                                               seed=seed)

    def plan(self, per_step_timing: bool = True) -> PlanResult:
        """Run the closed loop once and assemble metrics.

        Mirrors ``MPCPlanner.plan`` (``mpc_planner.py:294-314``) minus the
        rendering side effects (see ``mpc_tpu.utils.viz``).

        With ``per_step_timing`` (default) the loop runs step-by-step through
        the compiled single-step program and each row of ``solve_time`` is
        that step's measured warm-solve wall time — the reference's
        measurement semantics (``optimizer.py:603-608``, ``mpc_planner.py:
        233-247``).  With ``per_step_timing=False`` the whole loop runs as
        one fused on-device scan (faster end-to-end; per-step rows are the
        amortized fill).
        """
        cfg = self.config
        if per_step_timing:
            lcfg, params = self.loop_config, self.loop_params
            T = lcfg.n_steps
            # compile both programs off the clock, mirroring how the
            # reference times only solver work (optimizer.py:603-608)
            carry = cl.init_carry(lcfg, params)
            jax.block_until_ready(
                cl.closed_loop_chunk(lcfg, params, carry, 1))
            carry = cl.init_carry(lcfg, params)
            step_times, outs = [], []
            t_all = time.perf_counter()
            for _ in range(T):
                t0 = time.perf_counter()
                carry, out = cl.closed_loop_chunk(lcfg, params, carry, 1)
                jax.block_until_ready(out)
                step_times.append(time.perf_counter() - t0)
                outs.append(out)
            wall = time.perf_counter() - t_all
            res = cl.LoopResult(*[
                np.concatenate([np.asarray(getattr(o, f)) for o in outs])
                for f in cl.LoopResult._fields])
            solve_time = np.asarray(step_times)
        else:
            res = cl.closed_loop_jit(self.loop_config, self.loop_params)
            jax.block_until_ready(res.X)
            t0 = time.perf_counter()
            res = cl.closed_loop_jit(self.loop_config, self.loop_params)
            jax.block_until_ready(res.X)
            wall = time.perf_counter() - t0
            solve_time = np.full(self.loop_config.n_steps,
                                 wall / self.loop_config.n_steps)

        X = np.asarray(res.X, dtype=float)
        U = np.asarray(res.U, dtype=float)

        rmsd = None
        if cfg.use_case == "lane_following":
            rx, ry = met.rmsd_xy(X, cfg.reference_path)
            rmsd = {"x": rx, "y": ry}
        # native C++ geometry runtime when built; Python fallback otherwise
        deviation = native.deviation_to_path(X, cfg.origin_reference_path)

        ob = cfg.static_obstacle
        if cfg.obstacle_trajectory is not None:
            # moving obstacle: validate each step against the obstacle's
            # pose AT that step (the reference's frozen-obstacle check,
            # test_mpc_planner.py:37-47 via pycrcc, would miss any
            # collision with where the obstacle actually is)
            traj = np.asarray(cfg.obstacle_trajectory, dtype=float)
            hit_obs = False
            for t in range(X.shape[0]):
                ot = traj[min(t, len(traj) - 1)]
                if native.traj_obstacle_collision(
                        X[t:t + 1], cfg.vehicle.l, cfg.vehicle.w,
                        (ot[0], ot[1]), ob["length"], ob["width"],
                        ot[2]) >= 0:
                    hit_obs = True
                    break
        else:
            hit_obs = native.traj_obstacle_collision(
                X, cfg.vehicle.l, cfg.vehicle.w,
                (ob["position_x"], ob["position_y"]),
                ob["length"], ob["width"], ob["orientation"]) >= 0
        hit_left = native.traj_boundary_collision(
            X, cfg.vehicle.l, cfg.vehicle.w, cfg.left_road_boundary) >= 0
        hit_right = native.traj_boundary_collision(
            X, cfg.vehicle.l, cfg.vehicle.w, cfg.right_road_boundary) >= 0

        return PlanResult(
            states=X, inputs=U, solve_time=solve_time,
            status=np.asarray(res.status),
            rmsd=rmsd, deviation=deviation,
            collided_obstacle=bool(hit_obs),
            collided_boundary=bool(hit_left or hit_right),
            wall_time_s=wall)

    def save_artifacts(self, result: PlanResult, out_dir: str) -> str:
        """Write reference-format text artifacts.

        Directory naming parity with ``mpc_planner.py:168``:
        ``2D_plots_{framework}_{scenario}_{use_case}/``.
        """
        cfg = self.config
        d = os.path.join(out_dir, "2D_plots_{}_{}_{}".format(
            cfg.framework, cfg.scenario_name, cfg.use_case))
        os.makedirs(d, exist_ok=True)
        np.savetxt(os.path.join(d, "planned states.txt"), result.states)
        np.savetxt(os.path.join(d, "control inputs.txt"), result.inputs)
        np.savetxt(os.path.join(d, "solve time.txt"), result.solve_time)
        np.savetxt(os.path.join(d, "deviation.txt"), result.deviation)
        if result.rmsd is not None:
            np.savetxt(os.path.join(d, "RMSD.txt"),
                       np.array([result.rmsd["x"], result.rmsd["y"]]))
        return d
