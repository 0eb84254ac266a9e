"""ctypes bindings to the native C++ geometry runtime (``native/``).

Python fallbacks (``mpc_tpu.utils.collision`` / ``geometry``) are used when
the shared library has not been built; ``build()`` compiles it on demand.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpc_native.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library with make; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, text=True)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mpc_traj_obstacle_collision.restype = ctypes.c_int64
    lib.mpc_traj_obstacle_collision.argtypes = [
        dp, ctypes.c_int64] + [ctypes.c_double] * 7
    lib.mpc_traj_boundary_collision.restype = ctypes.c_int64
    lib.mpc_traj_boundary_collision.argtypes = [
        dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double, dp,
        ctypes.c_int64]
    lib.mpc_deviation_to_path.restype = None
    lib.mpc_deviation_to_path.argtypes = [dp, ctypes.c_int64, dp,
                                          ctypes.c_int64, dp]
    lib.mpc_curvilinear_project.restype = None
    lib.mpc_curvilinear_project.argtypes = [dp, ctypes.c_int64, dp,
                                            ctypes.c_int64, dp, dp]
    lib.mpc_native_abi_version.restype = ctypes.c_int64
    lib.mpc_native_abi_version.argtypes = []
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def traj_obstacle_collision(states: np.ndarray, ego_length: float,
                            ego_width: float, obs_center, obs_length: float,
                            obs_width: float, obs_theta: float) -> int:
    """First colliding step or -1 (native; falls back to Python)."""
    lib = _load()
    if lib is None:
        from mpc_tpu.utils.collision import trajectory_collides_obstacle
        hit, step = trajectory_collides_obstacle(
            states, ego_length, ego_width, np.asarray(obs_center),
            obs_length, obs_width, obs_theta)
        return step if hit else -1
    s, sp = _as_c(states)
    return int(lib.mpc_traj_obstacle_collision(
        sp, s.shape[0], ego_length, ego_width,
        float(obs_center[0]), float(obs_center[1]),
        obs_length, obs_width, obs_theta))


def traj_boundary_collision(states: np.ndarray, ego_length: float,
                            ego_width: float,
                            boundary: Optional[np.ndarray]) -> int:
    lib = _load()
    if boundary is None:
        return -1
    if lib is None:
        from mpc_tpu.utils.collision import trajectory_crosses_boundary
        hit, step = trajectory_crosses_boundary(states, ego_length,
                                                ego_width, boundary)
        return step if hit else -1
    s, sp = _as_c(states)
    b, bp = _as_c(boundary)
    return int(lib.mpc_traj_boundary_collision(
        sp, s.shape[0], ego_length, ego_width, bp, b.shape[0]))


def deviation_to_path(states: np.ndarray, path: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from mpc_tpu.utils.metrics import deviation_euclidean
        return deviation_euclidean(states, path)
    s, sp = _as_c(states)
    p, pp = _as_c(path)
    out = np.zeros(s.shape[0], dtype=np.float64)
    lib.mpc_deviation_to_path(sp, s.shape[0], pp, p.shape[0],
                              out.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_double)))
    return out


def curvilinear_project(path: np.ndarray, points: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """(s, signed d) of each point's projection onto the polyline.

    Native counterpart of ``geometry.arclength_projection_jnp`` — the role
    of pycrccosy (``configuration.py:264-277``).
    """
    lib = _load()
    p, ppath = _as_c(path)
    q, pq = _as_c(points)
    m = q.shape[0]
    out_s = np.zeros(m, dtype=np.float64)
    out_d = np.zeros(m, dtype=np.float64)
    if lib is None:
        from mpc_tpu.utils.geometry import arclength_projection_jnp
        import jax.numpy as jnp
        for i in range(m):
            out_s[i] = float(arclength_projection_jnp(
                jnp.asarray(p), jnp.asarray(q[i])))
        return out_s, out_d
    lib.mpc_curvilinear_project(
        ppath, p.shape[0], pq, m,
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out_s, out_d
