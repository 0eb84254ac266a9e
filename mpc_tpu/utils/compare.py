"""Solve-time comparison tooling.

Replaces ``test/comparison_solve_time/plot_solve_time.py`` in the reference
(loads recorded ``solve time.txt`` series per scenario/solver and plots them
against each other) and generalizes it to arbitrary artifact directories
produced by ``MPCPlanner.save_artifacts`` — including the reference's own
committed artifacts, so cross-framework comparisons (reference CasADi /
reference FORCESPRO / mpc_tpu) come for free.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def load_solve_times(artifact_dir: str) -> np.ndarray:
    """Read a ``solve time.txt`` series (seconds) from an artifact dir."""
    return np.loadtxt(os.path.join(artifact_dir, "solve time.txt"))


def compare_solve_times(dirs: Dict[str, str]) -> Dict[str, Dict[str, float]]:
    """{label: artifact_dir} -> per-label stats (ms)."""
    out = {}
    for label, d in dirs.items():
        st = np.atleast_1d(load_solve_times(d)) * 1e3
        out[label] = {
            "mean_ms": float(st.mean()),
            "p50_ms": float(np.percentile(st, 50)),
            "max_ms": float(st.max()),
            "n": int(st.size),
        }
    return out


def plot_solve_time_comparison(dirs: Dict[str, str], out_png: str,
                               title: Optional[str] = None) -> str:
    """Overlay solve-time series (role of plot_solve_time.py:4-40)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    for label, d in dirs.items():
        st = np.atleast_1d(load_solve_times(d)) * 1e3
        plt.plot(np.arange(st.size), st, label=label)
    plt.xlabel("iteration")
    plt.ylabel("Computation time [ms]")
    plt.yscale("log")
    plt.title(title or "Solve-time comparison")
    plt.legend()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png
