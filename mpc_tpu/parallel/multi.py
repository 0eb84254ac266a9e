"""Multi-scenario batched planning.

The reference plans one scenario per process (``test_mpc_planner.py:16`` —
the user edits a string constant and re-runs).  Here heterogeneous scenarios
run in ONE lockstep device batch: per-lane reference tracks (padded to a
common length), obstacles, weights, and initial states, solved by the same
compiled closed-loop program.  Combined with ``perturb_x0`` this is the
"thousands of scenarios x perturbations" axis of the north star.

Lanes whose scenario ends earlier (smaller ``iter_length``) keep their true
``T`` inside their :class:`ReferenceTrack`: the per-lane reference window
freezes at the path end exactly like a single-scenario run, and the tail
steps simply hold near the goal — slice each lane's result at its own
length (returned as ``lane_lengths``).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpc_tpu.io.config import PlanningConfig
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.planner import reference as ref_mod


def _pad_track(track: ref_mod.ReferenceTrack, n: int) -> ref_mod.ReferenceTrack:
    """Extend padded track arrays to length ``n`` by repeating the last row
    (the same replenishment semantics as ``build_track``'s own padding)."""
    def pad(a):
        need = n - a.shape[0]
        if need <= 0:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], need, axis=0)], axis=0)
    return ref_mod.ReferenceTrack(path=pad(track.path), psi=pad(track.psi),
                                  vdes=pad(track.vdes), T=track.T)


def make_multi_scenario_batch(
        cfgs: Sequence[PlanningConfig],
        horizon: int | None = None,
        noised: bool | None = None,
        seeds: Sequence[int] | None = None,
        dtype=jnp.float32,
        **solver_overrides) -> Tuple[cl.LoopConfig, cl.LoopParams, List[int]]:
    """Stack N planning configs into one batched closed-loop problem.

    All configs must share the formulation mode (framework), time step, and
    vehicle — the solver program is compiled once for the batch.  Returns
    ``(lcfg, batched_params, lane_lengths)`` where ``lcfg.n_steps`` is the
    longest scenario's ``iter_length`` and ``lane_lengths[i]`` is lane i's
    true closed-loop length.
    """
    if not cfgs:
        raise ValueError("need at least one PlanningConfig")
    fw = cfgs[0].framework
    dt = cfgs[0].delta_t
    wb = cfgs[0].wheelbase
    model = getattr(cfgs[0], "dynamics_model", "ks")
    for c in cfgs[1:]:
        if c.framework != fw:
            raise ValueError(
                f"mixed frameworks in batch: {fw!r} vs {c.framework!r}")
        if c.delta_t != dt or c.wheelbase != wb:
            raise ValueError("mixed delta_t/wheelbase in batch")
        if getattr(c, "dynamics_model", "ks") != model:
            raise ValueError("mixed dynamics_model in batch")
    # heterogeneous boundary constraints: if ANY lane is boundary-
    # constrained the whole batch compiles with boundary rows (fixed
    # (2, NB, 2) polylines per lane); unconstrained lanes get far-away dummy
    # polylines whose rows are trivially satisfied
    any_boundary = any(c.boundary_constraints for c in cfgs)
    if any_boundary:
        solver_overrides.setdefault("boundary_rows", True)

    longest = max(cfgs, key=lambda c: c.iter_length)
    lcfg = cl.make_loop_config(longest, horizon=horizon, noised=noised,
                               **solver_overrides)
    if seeds is None:
        seeds = range(len(cfgs))

    per_lane = []
    for c, seed in zip(cfgs, seeds):
        # per-scenario params under the SHARED loop config; noise sigma may
        # differ per use case, so noised batches must share the use case
        p = cl.make_loop_params(c, lcfg, seed=int(seed), dtype=dtype)
        per_lane.append(p)
    if lcfg.noise_std > 0.0:
        stds = {("lane_following" if c.use_case == "lane_following"
                 else "collision_avoidance") for c in cfgs}
        if len(stds) > 1:
            raise ValueError(
                "noised multi-scenario batch mixes use cases with different "
                "noise sigmas; run them deterministically or split batches")

    n_track = max(p.track.path.shape[0] for p in per_lane)
    per_lane = [p._replace(track=_pad_track(p.track, n_track))
                for p in per_lane]
    if any_boundary:
        # dummy polylines for lanes whose config is NOT boundary-constrained
        # — their problem is unchanged, the rows sit inactive at 1e6 m
        dummy_b, dummy_s = cl.dummy_boundaries(dtype)
        per_lane = [
            p if c.boundary_constraints
            else p._replace(boundaries=dummy_b, boundary_signs=dummy_s)
            for c, p in zip(cfgs, per_lane)]
    if any(p.obs_track is not None for p in per_lane):
        # static lanes ride the moving-obstacle path with a constant track
        need = lcfg.n_steps + lcfg.solver.horizon + 2
        per_lane = [
            p if p.obs_track is not None
            else p._replace(obs_track=jnp.broadcast_to(
                p.obs_centers[None], (need,) + p.obs_centers.shape))
            for p in per_lane]

    def stack(*leaves):
        if leaves[0] is None:
            if any(l is not None for l in leaves):
                raise ValueError("inconsistent optional fields across lanes")
            return None
        return jnp.stack(leaves)

    batched = jax.tree.map(stack, *per_lane,
                           is_leaf=lambda x: x is None)
    lane_lengths = [int(c.iter_length) for c in cfgs]
    return lcfg, batched, lane_lengths


def plan_multi(cfgs: Sequence[PlanningConfig], **kw):
    """Convenience: build the batch and run it on the lanes-trailing path.

    Returns ``(result, lane_lengths)``; ``result`` leaves have a leading
    lane axis, lane i's valid prefix is ``[:lane_lengths[i]]``.
    """
    lcfg, params, lane_lengths = make_multi_scenario_batch(cfgs, **kw)
    res = cl.closed_loop_batch_vec(lcfg, params)
    return res, lane_lengths
