"""Quadratic tracking costs for the NMPC problem, pure jnp.

Replaces the reference's two cost implementations:
  * FORCESPRO stage/terminal costs (``MPC_Planner/optimizer.py:163-195``)
  * CasADi Q/R/P form              (``MPC_Planner/optimizer.py:493-511``)

Both are weighted least-squares on the same 12-weight YAML schema
(``test/config_files/*.yaml``, ``weights_setting``).  The weights live in a
small pytree so one compiled program serves any weight setting.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

WEIGHT_KEYS = (
    "weight_x",
    "weight_y",
    "weight_steering_angle",
    "weight_velocity",
    "weight_heading_angle",
    "weight_velocity_steering_angle",
    "weight_long_acceleration",
    "weight_x_terminate",
    "weight_y_terminate",
    "weight_steering_angle_terminate",
    "weight_velocity_terminate",
    "weight_heading_angle_terminate",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Weights:
    """12-weight cost schema (reference YAML ``weights_setting``).

    q  : (5,) stage state weights   [x, y, delta, v, psi]
    r  : (2,) stage input weights   [deltaDot, aLong]
    qN : (5,) terminal state weights (``*_terminate`` keys)
    """

    q: jax.Array
    r: jax.Array
    qN: jax.Array

    @staticmethod
    def from_dict(d: Dict[str, float], dtype=jnp.float32) -> "Weights":
        missing = [k for k in WEIGHT_KEYS if k not in d]
        if missing:
            raise KeyError(f"weights_setting missing keys: {missing}")
        q = jnp.array(
            [d["weight_x"], d["weight_y"], d["weight_steering_angle"],
             d["weight_velocity"], d["weight_heading_angle"]], dtype=dtype)
        r = jnp.array(
            [d["weight_velocity_steering_angle"],
             d["weight_long_acceleration"]], dtype=dtype)
        qN = jnp.array(
            [d["weight_x_terminate"], d["weight_y_terminate"],
             d["weight_steering_angle_terminate"],
             d["weight_velocity_terminate"],
             d["weight_heading_angle_terminate"]], dtype=dtype)
        return Weights(q=q, r=r, qN=qN)


def stage_cost(x: jax.Array, u: jax.Array, x_ref: jax.Array,
               w: Weights) -> jax.Array:
    """l(x, u) = (x - x_ref)' diag(q) (x - x_ref) + u' diag(r) u.

    Matches both reference forms: FORCESPRO ``cost_function``
    (``optimizer.py:173-179``; its params [path_x, path_y, v_des, psi_des] with
    zero targets for delta and inputs are exactly ``x_ref = [px, py, 0, vdes,
    psides]``) and the CasADi Q/R quadratic (``optimizer.py:500-509``).
    """
    dx = x - x_ref
    return jnp.sum(w.q * dx * dx, axis=-1) + jnp.sum(w.r * u * u, axis=-1)


def terminal_cost(x: jax.Array, x_ref: jax.Array, w: Weights) -> jax.Array:
    """lN(x) = (x - x_ref)' diag(qN) (x - x_ref).

    FORCESPRO ``cost_functionN`` parity (``optimizer.py:191-195``).  NOTE: the
    reference CasADi path *computes* a terminal P term but never adds it to the
    objective (dangling ``+`` expression, ``optimizer.py:510``); CasADi-parity
    mode therefore disables this term (see ``SolverConfig.use_terminal_cost``).
    """
    dx = x - x_ref
    return jnp.sum(w.qN * dx * dx, axis=-1)


def trajectory_cost(X: jax.Array, U: jax.Array, X_ref: jax.Array,
                    w: Weights, use_terminal: bool) -> jax.Array:
    """Total cost over a horizon.

    X: (N+1, 5) states, U: (N, 2) inputs, X_ref: (N+1, 5) references where
    row k is the target for state k (caller handles the reference's
    one-step-ahead indexing, ``optimizer.py:509``).
    """
    stage = jnp.sum(stage_cost(X[:-1], U, X_ref[:-1], w))
    term = jnp.where(use_terminal, terminal_cost(X[-1], X_ref[-1], w), 0.0)
    # CasADi parity: the reference's stage loop runs i=0..N-1 over states
    # X[:, i] vs ref[:, i+1] with *stage* weights and no terminal term; the
    # FORCESPRO form applies terminal weights at the last stage.  We emulate
    # the FORCESPRO structure here; CasADi mode passes use_terminal=False and
    # shifts X_ref by one (done by the caller).
    return stage + term
