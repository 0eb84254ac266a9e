"""Visualization: 2D analysis plots + scenario GIF (host, matplotlib).

Replaces the reference's rendering pass (``MPC_Planner/mpc_planner.py:77-292``)
without the commonroad ``MPRenderer`` dependency: lanelets, obstacle, ego
rectangle, reference path, and planned trajectory are drawn directly.  Plot
limits derive from the scenario geometry instead of the reference's
hard-coded per-scenario allowlist (``mpc_planner.py:119-126``).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from mpc_tpu.io.config import PlanningConfig
from mpc_tpu.io.scenario import Scenario


def _rect_patch(center, length, width, orientation, **kw):
    from matplotlib.patches import Polygon
    c, s = np.cos(orientation), np.sin(orientation)
    R = np.array([[c, -s], [s, c]])
    half = np.array([[length / 2, width / 2], [length / 2, -width / 2],
                     [-length / 2, -width / 2], [-length / 2, width / 2]])
    return Polygon(np.asarray(center).reshape(1, 2) + half @ R.T, **kw)


def plot_analysis(config: PlanningConfig, states: np.ndarray,
                  inputs: np.ndarray, solve_time: np.ndarray,
                  deviation: np.ndarray, out_dir: str) -> None:
    """The four 2D analysis figures (``mpc_planner.py:184-277``)."""
    os.makedirs(out_dir, exist_ok=True)
    T = states.shape[0]
    t = np.arange(T) * config.delta_t
    tag = f"{config.framework}_{config.scenario_name}_{config.use_case}"

    fig = plt.figure()
    plt.plot(t, deviation)
    plt.title("deviation with reference path")
    plt.xlabel("time [s]")
    plt.ylabel("deviation in euclidean distance [m]")
    fig.savefig(os.path.join(out_dir, f"2D_plot_{tag}_deviation.png"))
    plt.close(fig)

    fig = plt.figure()
    plt.subplot(2, 1, 1)
    plt.plot(t, np.rad2deg(inputs[:, 0]), color="b")
    plt.title("steering velocity")
    plt.xlabel("time [s]")
    plt.ylabel("delta_v [deg/s]")
    plt.subplots_adjust(hspace=0.8)
    plt.subplot(2, 1, 2)
    plt.plot(t, inputs[:, 1], color="b")
    plt.title("longitudinal acceleration")
    plt.xlabel("time [s]")
    plt.ylabel("long. acc. [m/s2]")
    fig.savefig(os.path.join(out_dir, f"2D_plot_{tag}_control_inputs.png"))
    plt.close(fig)

    fig = plt.figure()
    plt.plot(np.arange(T), solve_time * 1e3, color="b")
    plt.title("Computation time over iteration")
    plt.xlabel("iteration")
    plt.ylabel("Computation time [ms]")
    fig.savefig(os.path.join(out_dir, f"2D_plot_{tag}_solve_time.png"))
    plt.close(fig)

    fig = plt.figure()
    plt.subplot(2, 1, 1)
    plt.title("Performance in x-direction")
    plt.plot(t, config.reference_path[:T, 0], "r--", label="reference path")
    plt.plot(t, states[:, 0], "g", label="MPC planned path")
    plt.legend()
    plt.xlabel("time [s]")
    plt.ylabel("x-position [m]")
    plt.subplots_adjust(hspace=0.8)
    plt.subplot(2, 1, 2)
    plt.title("Performance in y-direction")
    plt.plot(t, config.reference_path[:T, 1], "r--", label="reference path")
    plt.plot(t, states[:, 1], "g", label="MPC planned path")
    plt.legend()
    plt.xlabel("time [s]")
    plt.ylabel("y-position [m]")
    fig.savefig(os.path.join(out_dir, f"2D_plot_{tag}_performance.png"))
    plt.close(fig)


def draw_scenario_frame(ax, scenario: Scenario, config: PlanningConfig,
                        states: np.ndarray, step: int,
                        horizon_preview: Optional[np.ndarray] = None):
    """Draw one closed-loop frame: lanelets, obstacle, ego, reference."""
    for l in scenario.lanelets.values():
        ax.plot(l.left_vertices[:, 0], l.left_vertices[:, 1],
                color="0.6", lw=0.8)
        ax.plot(l.right_vertices[:, 0], l.right_vertices[:, 1],
                color="0.6", lw=0.8)
        ax.fill(np.concatenate([l.left_vertices[:, 0],
                                l.right_vertices[::-1, 0]]),
                np.concatenate([l.left_vertices[:, 1],
                                l.right_vertices[::-1, 1]]),
                color="0.92", zorder=0)
    ob = config.static_obstacle
    if ob["length"] > 0:
        ax.add_patch(_rect_patch(
            [ob["position_x"], ob["position_y"]], ob["length"], ob["width"],
            ob["orientation"], facecolor="#1d7eb4", edgecolor="k", zorder=20))
    ax.plot(config.reference_path[:, 0], config.reference_path[:, 1],
            color="r", marker=".", markersize=1, lw=1.0, zorder=19,
            label="reference path")
    ax.plot(states[:step + 1, 0], states[:step + 1, 1], color="g", lw=1.5,
            zorder=21, label="driven")
    ax.add_patch(_rect_patch(states[step, :2], 4.3, 1.8, states[step, 4],
                             facecolor="r", edgecolor="r", zorder=22))
    if horizon_preview is not None:
        ax.plot(horizon_preview[:, 0], horizon_preview[:, 1], "m.",
                markersize=2, zorder=23)
    ax.set_aspect("equal")


def render_gif(config: PlanningConfig, states: np.ndarray, out_dir: str,
               scenario: Scenario, fps: int = 10) -> str:
    """Render the closed-loop animation (``mpc_planner.py:119-165``)."""
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    pad = 10.0
    xs = np.concatenate([config.reference_path[:, 0], states[:, 0]])
    ys = np.concatenate([config.reference_path[:, 1], states[:, 1]])
    xlim = (xs.min() - pad, xs.max() + pad)
    ylim = (ys.min() - pad, ys.max() + pad)

    frames = []
    for i in range(states.shape[0]):
        fig, ax = plt.subplots(figsize=(10, 4))
        draw_scenario_frame(ax, scenario, config, states, i)
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.set_title(f"{config.scenario_name} step {i}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        frames.append(buf.copy())
        plt.close(fig)

    gif_path = os.path.join(out_dir, "gif_{}_{}_{}.gif".format(
        config.framework, config.scenario_name, config.use_case))
    imageio.mimsave(gif_path, frames, fps=fps)
    return gif_path
