"""Regenerate the repo's deterministic regression goldens.

Run from the repo root:  python tools/make_goldens.py

Goldens are recorded in float64 (``jax.enable_x64``): the CA closed loop is
chaotic enough that float32 rounding differences across machines / XLA
versions amplify by ~1e6 over 30 steps, which would make float32 goldens
machine-specific.  In float64 the same amplification leaves cross-platform
error at ~1e-9, far below the 1e-4 tolerance in
``tests/test_closed_loop.py::test_deterministic_regression_goldens``.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_tpu.io.config import load_config
from mpc_tpu.planner import closed_loop as cl

REF = "/root/reference"
CASES = [
    ("config_LF_ZAM_Over-1_1.yaml", "zam_lf_casadi"),
    ("config_CA_ZAM_Over-1_1.yaml", "zam_ca_casadi"),
    ("config_LF_USA_Lanker-2_18_T-1.yaml", "usa_lf_casadi"),
]


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    with jax.enable_x64(True):
        for config_name, tag in CASES:
            c = load_config(os.path.join(REF, "test/config_files",
                                         config_name),
                            os.path.join(REF, "scenarios"))
            lcfg = cl.make_loop_config(c, noised=False)
            params = cl.make_loop_params(c, lcfg, dtype=jnp.float64)
            res = cl.closed_loop_jit(lcfg, params)
            X = np.asarray(res.X)
            U = np.asarray(res.U)
            np.savetxt(os.path.join(out_dir, f"{tag}_states.txt"), X)
            np.savetxt(os.path.join(out_dir, f"{tag}_inputs.txt"), U)
            print(f"{tag}: T={len(X)} final=({X[-1, 0]:.3f}, {X[-1, 1]:.3f})"
                  f" status_min={int(np.asarray(res.status).min())}")


if __name__ == "__main__":
    main()
