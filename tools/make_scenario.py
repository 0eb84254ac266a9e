"""Synthetic CommonRoad scenario XML generator.

The reference ships six scenario XMLs as opaque assets; this tool generates
CommonRoad-format scenarios procedurally (straight or curving two-lane roads
with an optional in-lane static obstacle and a goal region), so the
framework has self-contained test data and users can fabricate stress
scenarios at will.

    python tools/make_scenario.py --out scenarios/SYN_Overtake-1.xml \
        --length 120 --curvature 0.002 --obstacle 0.45 --v0 18
"""
from __future__ import annotations

import argparse
import os
import sys
from xml.sax.saxutils import escape

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def _pts(poly):
    return "".join(
        f"      <point>\n        <x>{x:.6f}</x>\n        <y>{y:.6f}</y>\n"
        f"      </point>\n" for x, y in poly)


def make_scenario_xml(benchmark_id: str, length: float = 120.0,
                      lane_width: float = 3.5, curvature: float = 0.0,
                      obstacle_frac: float | None = 0.45,
                      v0: float = 18.0, t_end: int | None = None,
                      n_points: int = 60,
                      moving_frac: float | None = None,
                      moving_v: float = 6.0,
                      moving_offset: float = -1.1) -> str:
    """Build a two-lane road scenario as a CommonRoad 2018b XML string.

    The centerline is a clothoid-ish arc: heading theta(s) = curvature * s.
    The ego starts near the right-lane start; the goal sits near the end of
    the right lane; the optional obstacle blocks the right lane at
    ``obstacle_frac`` of the length.

    ``moving_frac`` adds a DYNAMIC obstacle with a real ``<trajectory>``
    (the reference's scenarios never ship one — its planner freezes dynamic
    obstacles at their initial state anyway, configuration.py:472-476): a
    slow lead vehicle starting at ``moving_frac`` of the length, driving
    along the lane at ``moving_v`` m/s, laterally offset ``moving_offset``
    meters from the lane center (riding near the curb, the classic
    overtake-a-slow-vehicle geometry).
    """
    s = np.linspace(0.0, length, n_points)
    # constant curvature arc: theta(s) = curvature * s
    theta = curvature * s if curvature else np.zeros_like(s)
    x = np.concatenate([[0.0], np.cumsum(np.diff(s) * np.cos(theta[:-1]))])
    y = np.concatenate([[0.0], np.cumsum(np.diff(s) * np.sin(theta[:-1]))])
    nx, ny = -np.sin(theta), np.cos(theta)  # left normal

    # right lane: from centerline-road (y=0 line) to -lane_width
    right_lane_left = np.stack([x, y], 1)
    right_lane_right = np.stack([x - lane_width * nx, y - lane_width * ny], 1)
    left_lane_left = np.stack([x + lane_width * nx, y + lane_width * ny], 1)
    left_lane_right = right_lane_left

    if t_end is None:
        # time limit sized so the desired velocity ~ v0
        t_end = max(int(round(length / v0 / 0.1)), 10)

    ego_center = 0.5 * (right_lane_left + right_lane_right)
    init_pos = ego_center[1]
    init_theta = float(theta[1])
    goal_pos = ego_center[-3]
    goal_theta = float(theta[-3])

    obstacle_xml = ""
    if obstacle_frac is not None:
        oi = int(obstacle_frac * n_points)
        ox, oy = ego_center[oi]
        obstacle_xml = f"""  <obstacle id="1402">
    <role>static</role>
    <type>parkedVehicle</type>
    <shape>
      <rectangle>
        <length>5.0</length>
        <width>2.2</width>
      </rectangle>
    </shape>
    <initialState>
      <position>
        <point>
          <x>{ox:.6f}</x>
          <y>{oy:.6f}</y>
        </point>
      </position>
      <orientation>
        <exact>{float(theta[oi]):.6f}</exact>
      </orientation>
      <time>
        <exact>0</exact>
      </time>
    </initialState>
  </obstacle>
"""

    if moving_frac is not None:
        # arc-length parameterization of the ego-lane center for the lead
        # vehicle's path (follows the lane at constant speed)
        seg = np.hypot(*np.diff(ego_center, axis=0).T)
        s_axis = np.concatenate([[0.0], np.cumsum(seg)])
        theta_of = lambda sv: float(np.interp(sv, s_axis, theta))

        def center_at(sv):
            cx = float(np.interp(sv, s_axis, ego_center[:, 0]))
            cy = float(np.interp(sv, s_axis, ego_center[:, 1]))
            th = theta_of(sv)
            # lateral offset along the left normal
            return (cx - moving_offset * np.sin(th),
                    cy + moving_offset * np.cos(th), th)

        s0 = moving_frac * s_axis[-1]
        ox0, oy0, th0 = center_at(s0)
        states = []
        for t in range(1, t_end + 1):
            sv = min(s0 + moving_v * 0.1 * t, s_axis[-1])
            ox, oy, th = center_at(sv)
            states.append(
                f"""      <state>
        <position>
          <point>
            <x>{ox:.6f}</x>
            <y>{oy:.6f}</y>
          </point>
        </position>
        <orientation>
          <exact>{th:.6f}</exact>
        </orientation>
        <velocity>
          <exact>{moving_v:.4f}</exact>
        </velocity>
        <time>
          <exact>{t}</exact>
        </time>
      </state>
""")
        obstacle_xml += f"""  <obstacle id="1403">
    <role>dynamic</role>
    <type>car</type>
    <shape>
      <rectangle>
        <length>4.5</length>
        <width>1.9</width>
      </rectangle>
    </shape>
    <initialState>
      <position>
        <point>
          <x>{ox0:.6f}</x>
          <y>{oy0:.6f}</y>
        </point>
      </position>
      <orientation>
        <exact>{th0:.6f}</exact>
      </orientation>
      <velocity>
        <exact>{moving_v:.4f}</exact>
      </velocity>
      <time>
        <exact>0</exact>
      </time>
    </initialState>
    <trajectory>
{''.join(states)}    </trajectory>
  </obstacle>
"""

    return f"""<?xml version="1.0" encoding="utf-8"?>
<commonRoad benchmarkID="{escape(benchmark_id)}" commonRoadVersion="2018b"
            timeStepSize="0.1" author="mpc_tpu synthetic generator"
            affiliation="" source="tools/make_scenario.py" date="2026-01-01">
  <lanelet id="1000">
    <leftBound>
{_pts(right_lane_left)}    </leftBound>
    <rightBound>
{_pts(right_lane_right)}    </rightBound>
    <adjacentLeft drivingDir="same" ref="1001"/>
  </lanelet>
  <lanelet id="1001">
    <leftBound>
{_pts(left_lane_left)}    </leftBound>
    <rightBound>
{_pts(left_lane_right)}    </rightBound>
    <adjacentRight drivingDir="same" ref="1000"/>
  </lanelet>
{obstacle_xml}  <planningProblem id="1">
    <initialState>
      <position>
        <point>
          <x>{init_pos[0]:.6f}</x>
          <y>{init_pos[1]:.6f}</y>
        </point>
      </position>
      <velocity>
        <exact>{v0:.4f}</exact>
      </velocity>
      <orientation>
        <exact>{init_theta:.6f}</exact>
      </orientation>
      <yawRate>
        <exact>0</exact>
      </yawRate>
      <slipAngle>
        <exact>0</exact>
      </slipAngle>
      <time>
        <exact>0</exact>
      </time>
    </initialState>
    <goalState>
      <position>
        <rectangle>
          <length>8.0</length>
          <width>3.0</width>
          <orientation>{goal_theta:.6f}</orientation>
          <center>
            <x>{goal_pos[0]:.6f}</x>
            <y>{goal_pos[1]:.6f}</y>
          </center>
        </rectangle>
      </position>
      <orientation>
        <intervalStart>-0.5</intervalStart>
        <intervalEnd>0.5</intervalEnd>
      </orientation>
      <time>
        <intervalStart>0</intervalStart>
        <intervalEnd>{t_end}</intervalEnd>
      </time>
    </goalState>
  </planningProblem>
</commonRoad>
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--id", default=None)
    ap.add_argument("--length", type=float, default=120.0)
    ap.add_argument("--curvature", type=float, default=0.0)
    ap.add_argument("--obstacle", type=float, default=0.45,
                    help="obstacle position as fraction of length; negative "
                         "disables")
    ap.add_argument("--v0", type=float, default=18.0)
    ap.add_argument("--t-end", type=int, default=None)
    ap.add_argument("--moving", type=float, default=None,
                    help="add a slow lead vehicle (dynamic obstacle with a "
                         "trajectory) at this fraction of the length")
    ap.add_argument("--moving-v", type=float, default=6.0,
                    help="lead vehicle speed [m/s]")
    ap.add_argument("--moving-offset", type=float, default=-1.1,
                    help="lead vehicle lateral offset from lane center [m] "
                         "(negative = toward the curb)")
    args = ap.parse_args()
    bid = args.id or os.path.splitext(os.path.basename(args.out))[0]
    xml = make_scenario_xml(
        bid, length=args.length, curvature=args.curvature,
        obstacle_frac=None if args.obstacle < 0 else args.obstacle,
        v0=args.v0, t_end=args.t_end, moving_frac=args.moving,
        moving_v=args.moving_v, moving_offset=args.moving_offset)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(xml)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
