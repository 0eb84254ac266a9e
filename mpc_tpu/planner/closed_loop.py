"""On-device receding-horizon closed loop (``lax.scan``).

Replaces the reference's host-side Python simulation loops
(``MPC_Planner/optimizer.py:285-357`` FORCESPRO, ``optimizer.py:596-631``
CasADi): the entire closed loop — reference windowing, warm-started NMPC
solve, actuation-noise injection, and plant propagation — is one traced scan
that XLA compiles once.  vmaps over a batch of lanes for chip saturation.

Formulation parity notes (SURVEY.md §7):
  * 'forcespro' mode: RK4 plant (``optimizer.py:356``), horizon = N-1
    transitions (the FORCESPRO model's N stages include the pinned initial
    stage, ``optimizer.py:204``), terminal cost active, v_des ramp.
  * 'casadi' mode: forward-Euler plant (``shift_movement``,
    ``optimizer.py:645-655``), horizon = N transitions, NO terminal cost
    (the dead ``+`` expression at ``optimizer.py:510``), constant v_des,
    frozen end-of-path reference window.
  * noise: zero-mean Gaussian on applied inputs, sigma 0.1 (lane following)
    / 0.05 (collision avoidance) (``optimizer.py:345-354, 611-615``), drawn
    from a deterministic PRNG key.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.io.config import PlanningConfig
from mpc_tpu.models import constraints as C
from mpc_tpu.models import costs as cost_mod
from mpc_tpu.models import dynamics as dyn_mod
from mpc_tpu.ops import sqp
from mpc_tpu.planner import reference as ref_mod


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Static closed-loop configuration."""

    solver: sqp.SolverConfig
    mode: str                 # 'forcespro' | 'casadi'
    n_steps: int              # iter_length T
    noise_std: float = 0.0    # 0 => deterministic
    plant_integrator: str = "rk4"
    cold_start_solves: int = 0  # extra warm-up solves of the step-0 problem
                                # before the loop (deep-horizon cold starts
                                # can otherwise land in poor local basins)


class LoopParams(NamedTuple):
    """Per-lane runtime data for a closed-loop run (pytree)."""

    x_init: jax.Array          # (5,) initial state
    track: ref_mod.ReferenceTrack
    obs_centers: jax.Array     # (3, 2)
    min_dist: jax.Array        # ()
    weights: cost_mod.Weights
    noise_key: jax.Array       # PRNG key


class LoopResult(NamedTuple):
    X: jax.Array        # (T, 5) closed-loop states (x_0 ... x_{T-1})
    U: jax.Array        # (T, 2) applied inputs
    status: jax.Array   # (T,) per-step solver status
    viol: jax.Array     # (T,) per-step max constraint violation
    cost: jax.Array     # (T,) per-step objective values


def make_loop_config(cfg: PlanningConfig,
                     horizon: int | None = None,
                     noised: bool | None = None,
                     **solver_overrides) -> LoopConfig:
    """Build a LoopConfig from a PlanningConfig (formulation dispatch).

    The reference dispatches on ``framework_name`` at
    ``mpc_planner.py:301-306``; here the same switch selects integrator,
    horizon convention, and constraint algebra.
    """
    mode = cfg.framework
    N = int(horizon if horizon is not None else cfg.predict_horizon)
    if mode == "forcespro":
        H = max(N - 1, 1)
        integ = "rk4"
        use_term = True
    else:
        H = N
        integ = "euler"
        use_term = False
    p = cfg.vehicle
    solver_cfg = sqp.SolverConfig(
        horizon=H,
        dt=cfg.delta_t,
        wheelbase=cfg.wheelbase,
        integrator=integ,
        formulation=mode,
        ego_length=p.l,
        ego_width=p.w,
        a_max=p.longitudinal.a_max,
        bounds=C.make_box_bounds(p, mode),
        use_terminal_cost=use_term,
        **solver_overrides)
    want_noise = cfg.noised if noised is None else noised
    if want_noise:
        std = 0.1 if cfg.use_case == "lane_following" else 0.05
    else:
        std = 0.0
    return LoopConfig(solver=solver_cfg, mode=mode, n_steps=cfg.iter_length,
                      noise_std=std, plant_integrator=integ)


def make_loop_params(cfg: PlanningConfig, lcfg: LoopConfig,
                     seed: int = 0, dtype=jnp.float32) -> LoopParams:
    """Host-side assembly of the per-lane runtime pytree."""
    r_obs, _ = C.approx_circle_radius(cfg.static_obstacle["length"],
                                      cfg.static_obstacle["width"])
    r_ego, _ = C.approx_circle_radius(cfg.vehicle.l, cfg.vehicle.w)
    centers = np.asarray(jax.device_get(C.circle_centers(
        jnp.asarray(cfg.static_obstacle["position_x"]),
        jnp.asarray(cfg.static_obstacle["position_y"]),
        cfg.static_obstacle["length"], cfg.static_obstacle["width"],
        jnp.asarray(cfg.static_obstacle["orientation"]))))
    track = ref_mod.build_track(cfg.reference_path, cfg.orientation,
                                cfg.desired_velocity, lcfg.solver.horizon,
                                lcfg.mode, dtype)
    x_init = jnp.asarray([cfg.init_position[0], cfg.init_position[1], 0.0,
                          cfg.init_velocity, cfg.init_orientation], dtype)
    return LoopParams(
        x_init=x_init,
        track=track,
        obs_centers=jnp.asarray(centers, dtype),
        min_dist=jnp.asarray(r_ego + r_obs, dtype),
        weights=cost_mod.Weights.from_dict(cfg.weights, dtype),
        noise_key=jax.random.PRNGKey(seed),
    )


def _plant_step(lcfg: LoopConfig, x, u):
    step = dyn_mod.make_step_fn(lcfg.plant_integrator, lcfg.solver.dt,
                                lcfg.solver.wheelbase)
    return step(x, u)


def run_closed_loop(lcfg: LoopConfig, params: LoopParams) -> LoopResult:
    """Full closed-loop rollout for one lane (traced; jit via closed_loop_jit).

    Warm-start policy parity: the input trajectory is shifted one stage with
    the last input held (``optimizer.py:652-653``); AL multipliers carry over
    shifted the same way.
    """
    scfg = lcfg.solver

    def body(carry, step_idx):
        x, sqp_state, key = carry
        x_ref = ref_mod.window(params.track, step_idx, scfg.horizon,
                               lcfg.mode, x0=x)
        ocp = sqp.OcpParams(x0=x, x_ref=x_ref,
                            obs_centers=params.obs_centers,
                            min_dist=params.min_dist,
                            weights=params.weights)
        sol = sqp.solve(scfg, ocp, sqp_state)

        key, sub = jax.random.split(key)
        noise = lcfg.noise_std * jax.random.normal(sub, (2,),
                                                   dtype=sol.U.dtype)
        u_apply = sol.U[0] + noise
        x_next = _plant_step(lcfg, x, u_apply)

        # shift-and-hold warm start (optimizer.py:652-653)
        new_state = sol.state
        U_shift = jnp.concatenate([new_state.U[1:], new_state.U[-1:]], axis=0)
        lam_lo = jnp.concatenate([new_state.lam_lo[1:],
                                  new_state.lam_lo[-1:]], axis=0)
        lam_hi = jnp.concatenate([new_state.lam_hi[1:],
                                  new_state.lam_hi[-1:]], axis=0)
        warm = sqp.SqpState(U=U_shift, lam_lo=lam_lo, lam_hi=lam_hi,
                            mu=new_state.mu)
        out = (x, u_apply, sol.status, sol.viol, sol.cost)
        return (x_next, warm, key), out

    dtype = params.x_init.dtype
    init_u = jnp.zeros((scfg.horizon, 2), dtype)
    init_state = sqp.init_state(scfg, init_u, dtype)
    for _ in range(lcfg.cold_start_solves):
        x_ref0 = ref_mod.window(params.track, jnp.asarray(0), scfg.horizon,
                                lcfg.mode, x0=params.x_init)
        ocp0 = sqp.OcpParams(x0=params.x_init, x_ref=x_ref0,
                             obs_centers=params.obs_centers,
                             min_dist=params.min_dist,
                             weights=params.weights)
        init_state = sqp.solve(scfg, ocp0, init_state).state
    carry0 = (params.x_init, init_state, params.noise_key)
    _, (X, U, status, viol, cost) = jax.lax.scan(
        body, carry0, jnp.arange(lcfg.n_steps))
    return LoopResult(X=X, U=U, status=status, viol=viol, cost=cost)


@partial(jax.jit, static_argnums=0)
def closed_loop_jit(lcfg: LoopConfig, params: LoopParams) -> LoopResult:
    return run_closed_loop(lcfg, params)


@partial(jax.jit, static_argnums=(0, 3))
def closed_loop_chunk(lcfg: LoopConfig, params: LoopParams, carry,
                      n_steps: int):
    """Run ``n_steps`` closed-loop steps from an explicit carry.

    Building block for checkpoint/resume (``mpc_tpu.utils.checkpoint``): the
    carry is (step_idx, x, SqpState, key) and can be snapshotted between
    chunks.  The reference has no analog (SURVEY.md §5 checkpoint row).
    """
    scfg = lcfg.solver

    def body(c, _):
        step_idx, x, sqp_state, key = c
        x_ref = ref_mod.window(params.track, step_idx, scfg.horizon,
                               lcfg.mode, x0=x)
        ocp = sqp.OcpParams(x0=x, x_ref=x_ref,
                            obs_centers=params.obs_centers,
                            min_dist=params.min_dist,
                            weights=params.weights)
        sol = sqp.solve(scfg, ocp, sqp_state)
        key, sub = jax.random.split(key)
        noise = lcfg.noise_std * jax.random.normal(sub, (2,),
                                                   dtype=sol.U.dtype)
        u_apply = sol.U[0] + noise
        x_next = _plant_step(lcfg, x, u_apply)
        st = sol.state
        warm = sqp.SqpState(
            U=jnp.concatenate([st.U[1:], st.U[-1:]], axis=0),
            lam_lo=jnp.concatenate([st.lam_lo[1:], st.lam_lo[-1:]], axis=0),
            lam_hi=jnp.concatenate([st.lam_hi[1:], st.lam_hi[-1:]], axis=0),
            mu=st.mu)
        out = (x, u_apply, sol.status, sol.viol, sol.cost)
        return (step_idx + 1, x_next, warm, key), out

    carry, (X, U, status, viol, cost) = jax.lax.scan(
        body, carry, None, length=n_steps)
    return carry, LoopResult(X=X, U=U, status=status, viol=viol, cost=cost)


def init_carry(lcfg: LoopConfig, params: LoopParams):
    """Initial chunk carry (step 0, cold-started warm state)."""
    dtype = params.x_init.dtype
    state = sqp.init_state(lcfg.solver, jnp.zeros((lcfg.solver.horizon, 2),
                                                  dtype), dtype)
    return (jnp.asarray(0, jnp.int32), params.x_init, state,
            params.noise_key)


@partial(jax.jit, static_argnums=0)
def closed_loop_batch(lcfg: LoopConfig, params: LoopParams) -> LoopResult:
    """vmap over a leading lane axis in every LoopParams leaf."""
    return jax.vmap(lambda p: run_closed_loop(lcfg, p))(params)
