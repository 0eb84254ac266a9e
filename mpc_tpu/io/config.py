"""Configuration layer: YAML settings + scenario -> PlanningConfig.

Replaces the reference's ``Configuration`` /
``create_optimization_configuration_vehicle`` orchestration
(``MPC_Planner/configuration.py:401-623``) with a plain dataclass pipeline:
route planning, reference-path clipping/resampling, desired-velocity
derivation (including the reference's round-up quirk), orientation, vehicle
parameters (registry instead of ``eval``, ``configuration.py:458``), obstacle
dict, and the 12-weight schema.  The reference's YAML files load unchanged.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np
import yaml

from mpc_tpu.io.scenario import Scenario, load_scenario, PlanningProblem
from mpc_tpu.io.route import plan_route
from mpc_tpu.models.vehicle import VehicleParams, get_vehicle
from mpc_tpu.utils.geometry import (
    chaikins_corner_cutting, compute_orientation_from_polyline,
    compute_polyline_length, find_closest_point, resample_polyline)


@dataclasses.dataclass
class PlanningConfig:
    """Validated planning configuration (reference ``PlanningConfiguration``,
    ``configuration.py:106-336``, as an immutable dataclass)."""

    scenario_name: str
    use_case: str                  # 'lane_following' | 'collision_avoidance'
    framework: str                 # 'forcespro' | 'casadi' (formulation mode)
    noised: bool
    predict_horizon: int
    delta_t: float
    iter_length: int
    desired_velocity: float
    origin_reference_path: np.ndarray   # route-planner output (pre-clip)
    reference_path: np.ndarray          # clipped + resampled (T, 2)
    orientation: np.ndarray             # (T,) heading per path point
    vehicle: VehicleParams
    wheelbase: float
    reference_point: str
    static_obstacle: Dict[str, float]
    weights: Dict[str, float]
    # initial state of the planning problem
    init_position: np.ndarray
    init_velocity: float
    init_orientation: float
    init_acceleration: float
    # road boundary polylines for the host-side collision oracle
    left_road_boundary: Optional[np.ndarray] = None
    right_road_boundary: Optional[np.ndarray] = None
    # optional solver-side road-boundary constraints (the reference ships
    # this constraint set commented out, optimizer.py:113-161)
    boundary_constraints: bool = False
    # optional moving-obstacle tracking: (T_traj, 3) rows [x, y, psi] per
    # scenario time step.  The reference treats even dynamic obstacles as
    # frozen at their initial state (configuration.py:472-476); enabling
    # ``track_dynamic_obstacle: true`` in the YAML uses the recorded
    # trajectory instead (capability beyond the reference)
    obstacle_trajectory: Optional[np.ndarray] = None
    # dynamics family for the solver + plant: 'ks' (5-state kinematic
    # single-track — the only model the reference planner invokes,
    # optimizer.py:98, 536) or 'st' (7-state single-track with tire
    # dynamics — defined by the reference at configuration.py:370-398 but
    # never wired; first-class here via YAML ``dynamics_model: st``)
    dynamics_model: str = "ks"

    def __post_init__(self):
        if self.dynamics_model not in ("ks", "st"):
            raise ValueError(
                f"dynamics_model must be ks|st, got {self.dynamics_model!r}")
        if self.framework not in ("casadi", "forcespro"):
            raise ValueError(
                f"framework must be casadi|forcespro, got {self.framework!r}")
        if self.use_case not in ("lane_following", "collision_avoidance"):
            raise ValueError(
                "use_case must be lane_following|collision_avoidance, "
                f"got {self.use_case!r}")
        if self.reference_path.ndim != 2 or self.reference_path.shape[1] != 2:
            raise ValueError("reference_path must be (n, 2)")
        if self.predict_horizon < 1:
            raise ValueError("predict_horizon must be >= 1")


def load_settings(path: str) -> Dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def clip_reference_path(origin_path: np.ndarray, init_position: np.ndarray,
                        goal_position: np.ndarray) -> np.ndarray:
    """Clip the route path between initial and goal positions.

    Parity with ``configuration.py:584-623`` including the direction-aware
    index fixups: the path is prepended with the exact init position and
    appended with the exact goal position; interior indices are nudged so the
    kept vertices lie strictly between them.
    """
    start_index = find_closest_point(origin_path, init_position)
    end_index = find_closest_point(origin_path, goal_position)

    if goal_position[0] >= init_position[0]:  # left-to-right path
        if (origin_path[start_index] - init_position >= 0).sum() != 2:
            start_index += 1
        if (origin_path[end_index] - goal_position <= 0).sum() != 2:
            end_index -= 1
    else:  # right-to-left path
        if (origin_path[start_index] - init_position <= 0).sum() != 2:
            start_index += 1
        if (origin_path[end_index] - goal_position >= 0).sum() != 2:
            end_index -= 1
    return np.concatenate([
        init_position.reshape(1, 2),
        origin_path[start_index:end_index + 1],
        goal_position.reshape(1, 2)], axis=0)


def derive_desired_velocity(clipped_path: np.ndarray, time_step_limit: int,
                            delta_t: float) -> float:
    """v_des = len(path) / ((T_limit - 1) * dt), rounded UP at 4 decimals.

    Parity with ``configuration.py:524-544``.
    """
    length = compute_polyline_length(clipped_path)
    v = length / ((time_step_limit - 1) * delta_t)
    if v > round(v, 4):
        v = round(v, 4) + 0.0001
    else:
        v = round(v, 4)
    return v


def build_config(settings: Dict, scenario: Scenario,
                 planning_problem: Optional[PlanningProblem] = None
                 ) -> PlanningConfig:
    """Assemble a PlanningConfig from YAML settings + parsed scenario.

    Pipeline parity with ``create_optimization_configuration_vehicle``
    (``configuration.py:415-487``) and
    ``find_reference_path_and_desired_velocity``
    (``configuration.py:499-552``).
    """
    pp = planning_problem or scenario.planning_problems[0]
    if pp.id not in settings["vehicle_settings"]:
        raise KeyError(
            f"Cannot find settings for planning problem {pp.id}")
    vehicle_settings = settings["vehicle_settings"][pp.id]
    gps = settings["general_planning_settings"]
    use_case = settings["scenario_settings"]["use_case"]

    # --- route ---
    route = plan_route(scenario, pp.initial_position,
                       pp.goal.position_center, pp.goal.position_lanelets)
    origin_path = route.reference_path

    # goal position selection parity (configuration.py:590-600): rectangle
    # center when available, otherwise the route end (lanelet goals)
    if pp.goal.position_center is not None:
        goal_position = np.asarray(pp.goal.position_center, dtype=float)
    else:
        goal_position = origin_path[-1]

    clipped = clip_reference_path(origin_path, pp.initial_position.astype(
        float), goal_position)

    delta_t = scenario.dt if scenario.dt else 0.1
    time_step_limit = (pp.goal.time_end if pp.goal.time_end is not None
                       else pp.goal.time_start)
    desired_velocity = derive_desired_velocity(clipped, time_step_limit,
                                               delta_t)

    if vehicle_settings.get("resampling_reference_path", True):
        smoothed = chaikins_corner_cutting(clipped)
        reference_path = resample_polyline(
            smoothed, step=desired_velocity * delta_t)
    else:
        reference_path = clipped

    orientation = compute_orientation_from_polyline(reference_path)

    vehicle = get_vehicle(vehicle_settings["vehicle_model"])

    # --- obstacle dict (configuration.py:471-483) ---
    obstacle_trajectory = None
    if use_case == "collision_avoidance":
        obs = scenario.obstacles[0]
        static_obstacle = {
            "position_x": float(obs.initial_state.position[0]),
            "position_y": float(obs.initial_state.position[1]),
            "length": float(obs.shape.length),
            "width": float(obs.shape.width),
            "orientation": float(obs.initial_state.orientation),
        }
        if gps.get("track_dynamic_obstacle", False) and obs.trajectory:
            states = [obs.initial_state] + list(obs.trajectory)
            obstacle_trajectory = np.asarray(
                [[s.position[0], s.position[1], s.orientation]
                 for s in states], dtype=float)
    else:
        static_obstacle = {"position_x": -100.0, "position_y": 0.0,
                           "length": 0.0, "width": 0.0, "orientation": 0.0}

    # road boundaries (configuration.py:432-433: lanelets[1]/[0]
    # right_vertices); generalized to first/second lanelet when present
    lids = sorted(scenario.lanelets)
    left_b = (scenario.lanelets[lids[1]].right_vertices
              if len(lids) > 1 else None)
    right_b = scenario.lanelets[lids[0]].right_vertices if lids else None

    return PlanningConfig(
        scenario_name=settings["scenario_settings"]["scenario_name"],
        use_case=use_case,
        framework=gps["framework_name"],
        noised=bool(gps["noised"]),
        predict_horizon=int(gps["predict_horizon"]),
        delta_t=float(delta_t),
        iter_length=int(reference_path.shape[0]),
        desired_velocity=float(desired_velocity),
        origin_reference_path=origin_path,
        reference_path=np.asarray(reference_path, dtype=float),
        orientation=np.asarray(orientation, dtype=float),
        vehicle=vehicle,
        wheelbase=float(vehicle_settings["wheelbase"]),
        reference_point=vehicle_settings.get("reference_point", "rear"),
        static_obstacle=static_obstacle,
        weights=dict(settings["weights_setting"]),
        init_position=pp.initial_position.astype(float),
        init_velocity=float(pp.initial_velocity),
        init_orientation=float(pp.initial_orientation),
        init_acceleration=float(pp.initial_acceleration),
        left_road_boundary=left_b,
        right_road_boundary=right_b,
        boundary_constraints=bool(
            gps.get("boundary_constraints", False)),
        obstacle_trajectory=obstacle_trajectory,
        dynamics_model=str(gps.get("dynamics_model", "ks")),
    )


def load_config(config_path: str, scenario_dir: str) -> PlanningConfig:
    """One-call loader: YAML + scenario XML -> PlanningConfig."""
    settings = load_settings(config_path)
    name = settings["scenario_settings"]["scenario_name"]
    scenario = load_scenario(os.path.join(scenario_dir, name + ".xml"))
    return build_config(settings, scenario)
