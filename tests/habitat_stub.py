"""Minimal in-memory `habitat` module stub so the habitat_extensions /
habitat_backend code paths are unit-testable on hosts without
habitat-sim. Mirrors only the API surface our adapters touch."""
from __future__ import annotations

import contextlib
import sys
import types

import numpy as np


class Measure:
    """habitat.core.embodied_task.Measure surface."""

    def __init__(self, *args, **kwargs):
        self.uuid = self._get_uuid(*args, **kwargs)
        self._metric = None

    def _get_uuid(self, *args, **kwargs):
        raise NotImplementedError

    def get_metric(self):
        return self._metric


class Registry:
    def __init__(self):
        self.measures = {}

    def register_measure(self, cls):
        self.measures[cls.__name__] = cls
        return cls


class AttrDict(dict):
    """omegaconf-ish: attribute + item access, recursive."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        return obj


class AgentState:
    def __init__(self, position):
        self.position = np.asarray(position, np.float64)


class StubPathfinder:
    """navmesh bounds for the top-down map adapter."""

    def __init__(self, lower=(-1.0, 0.0, -1.0), upper=(9.0, 3.0, 9.0)):
        self._lower = np.asarray(lower, np.float64)
        self._upper = np.asarray(upper, np.float64)

    def get_bounds(self):
        return self._lower, self._upper


class _StubAgent:
    def __init__(self, position):
        self.state = AgentState(position)


class StubSim:
    """Scripted agent positions + geodesic = euclidean distances."""

    def __init__(self, start=(0.0, 0.0, 0.0)):
        self.position = np.asarray(start, np.float64)
        self.pathfinder = StubPathfinder()

    def get_agent_state(self):
        return AgentState(self.position)

    def get_agent(self, idx):
        return _StubAgent(self.position)


class StubInstruction:
    def __init__(self, text):
        self.instruction_text = text


class StubGoal:
    def __init__(self, position):
        self.position = list(position)


class StubEpisode:
    def __init__(self, episode_id, scene_id, text, start, goal, ref):
        self.episode_id = episode_id
        self.scene_id = scene_id
        self.instruction = StubInstruction(text)
        self.start_position = list(start)
        self.goals = [StubGoal(goal)]
        self.reference_path = ref


class StubEnv:
    """habitat.Env surface used by HabitatEnvAdapter."""

    def __init__(self, config=None):
        self.config = config
        self.sim = StubSim()
        g = float(config.habitat.environment.max_episode_steps) \
            if config else 500
        self.max_steps = int(g)
        self.episodes = [
            StubEpisode(str(i), f"scenes/s{i % 2}/s{i % 2}.glb",
                        f"instruction {i}", (0, 0, 0),
                        (3.0 + i, 0, 0),
                        [[0, 0, 0], [3.0 + i, 0, 0]])
            for i in range(4)]
        self.current_episode = self.episodes[0]
        self._steps = 0
        self.episode_over = False

    def reset(self):
        self.sim.position = np.asarray(
            self.current_episode.start_position, np.float64)
        self._steps = 0
        self.episode_over = False
        return self._obs()

    def step(self, action):
        if action == 0:
            self.episode_over = True
        elif action == 1:
            self.sim.position = self.sim.position + [0.25, 0.0, 0.0]
        self._steps += 1
        if self._steps >= self.max_steps:
            self.episode_over = True
        return self._obs()

    def _obs(self):
        return {"rgb": np.zeros((480, 640, 3), np.uint8),
                "depth": np.zeros((480, 640, 1), np.float32)}

    def get_metrics(self):
        goal = np.asarray(self.current_episode.goals[0].position)
        d = float(np.linalg.norm(self.sim.position - goal))
        return {"distance_to_goal": d, "success": float(d < 3.0),
                "spl": float(d < 3.0) * 0.5, "oracle_success": 0.0}

    def close(self):
        pass


class StubShortestPathFollower:
    """habitat.tasks.nav.shortest_path_follower surface: walks +x."""

    def __init__(self, sim, goal_radius, return_one_hot=False):
        self.sim = sim
        self.goal_radius = goal_radius

    def get_next_action(self, goal):
        d = np.linalg.norm(np.asarray(goal, np.float64)
                           - self.sim.get_agent_state().position)
        if d < self.goal_radius:
            return None      # habitat returns None inside the radius
        return 1


def _get_config(path):
    import yaml
    with open(path) as f:
        raw = yaml.safe_load(f)
    raw.pop("defaults", None)
    return AttrDict.wrap(raw)


def install():
    """Install stub modules into sys.modules; returns (modules, registry).
    Call uninstall(modules) in teardown."""
    registry = Registry()

    habitat = types.ModuleType("habitat")
    core = types.ModuleType("habitat.core")
    embodied = types.ModuleType("habitat.core.embodied_task")
    embodied.Measure = Measure
    reg_mod = types.ModuleType("habitat.core.registry")
    reg_mod.registry = registry
    config_mod = types.ModuleType("habitat.config")
    config_mod.read_write = lambda cfg: contextlib.nullcontext(cfg)
    tasks = types.ModuleType("habitat.tasks")
    nav = types.ModuleType("habitat.tasks.nav")
    spf = types.ModuleType("habitat.tasks.nav.shortest_path_follower")
    spf.ShortestPathFollower = StubShortestPathFollower
    utils_mod = types.ModuleType("habitat.utils")
    vis_mod = types.ModuleType("habitat.utils.visualizations")
    maps_mod = types.ModuleType("habitat.utils.visualizations.maps")

    def _get_topdown_map(pathfinder, height, map_resolution,
                         draw_border, meters_per_pixel):
        # synthetic navmesh: valid interior, invalid 4-px frame
        grid = np.ones((map_resolution, map_resolution), np.uint8)
        grid[:4], grid[-4:] = 0, 0
        grid[:, :4], grid[:, -4:] = 0, 0
        return grid

    maps_mod.get_topdown_map = _get_topdown_map

    habitat.core = core
    habitat.config = config_mod
    habitat.tasks = tasks
    habitat.utils = utils_mod
    utils_mod.visualizations = vis_mod
    vis_mod.maps = maps_mod
    habitat.Env = StubEnv
    habitat.get_config = _get_config
    core.embodied_task = embodied
    core.registry = reg_mod
    tasks.nav = nav
    nav.shortest_path_follower = spf

    mods = {
        "habitat": habitat,
        "habitat.core": core,
        "habitat.core.embodied_task": embodied,
        "habitat.core.registry": reg_mod,
        "habitat.config": config_mod,
        "habitat.tasks": tasks,
        "habitat.tasks.nav": nav,
        "habitat.tasks.nav.shortest_path_follower": spf,
        "habitat.utils": utils_mod,
        "habitat.utils.visualizations": vis_mod,
        "habitat.utils.visualizations.maps": maps_mod,
    }
    sys.modules.update(mods)
    return mods, registry


def uninstall(mods):
    for name in mods:
        sys.modules.pop(name, None)
