"""Shortest-path expert for plane geometry (habitat's ShortestPathFollower
surface: get_next_action(goal) -> 0 STOP / 1 fwd / 2 left / 3 right).

Habitat's follower walks the geodesic; on the FakeNavEnv's obstacle-free
plane the geodesic is the straight line, so the expert turns to face the
goal within half a turn-step, else moves forward; STOP inside
goal_radius. A habitat-backed env supplies the real follower instead
(see eval/habitat_backend.py).
"""
from __future__ import annotations

import numpy as np

from streamvln_tpu.eval.fake_env import (
    FORWARD_STEP, TURN_ANGLE_DEG, FakeNavEnv)


def make_follower(env, goal_radius: float):
    """Expert follower for any backend: habitat envs provide their own
    geodesic follower (eval/habitat_backend.HabitatEnvAdapter
    .make_follower); the fake plane env gets the straight-line one."""
    if hasattr(env, "make_follower"):
        return env.make_follower(goal_radius)
    return PlaneShortestPathFollower(env, goal_radius)


class PlaneShortestPathFollower:
    def __init__(self, env: FakeNavEnv, goal_radius: float = 0.25):
        self.env = env
        self.goal_radius = goal_radius

    def get_next_action(self, goal_xy) -> int:
        x, y, th = self.env._pose
        goal = np.asarray(goal_xy, np.float64)[:2]
        delta = goal - np.array([x, y])
        dist = float(np.linalg.norm(delta))
        if dist < self.goal_radius:
            return 0
        target_heading = np.arctan2(delta[1], delta[0])
        err = (target_heading - th + np.pi) % (2 * np.pi) - np.pi
        half_turn = np.deg2rad(TURN_ANGLE_DEG) / 2
        if err > half_turn:
            return 2   # left (+heading)
        if err < -half_turn:
            return 3   # right
        return 1
