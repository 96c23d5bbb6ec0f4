"""habitat-sim env adapter (host-side C++ simulator, unchanged role;
reference: streamvln_eval.py:24-35, 187-190).

habitat is not bundled with this framework; on hosts that have it this
module adapts habitat.Env to the evaluator's surface (episodes carry
instruction_text / goal / reference_path like FakeEpisode).
"""
from __future__ import annotations


def make_habitat_env(config_path: str, split: str):
    import habitat  # noqa: F401 — raises ImportError when absent
    from habitat_baselines.config.default import get_config

    config = get_config(config_path)
    with habitat.config.read_write(config):
        config.habitat.dataset.split = split
    env = habitat.Env(config=config)

    class _Adapter:
        """Wraps habitat.Env; exposes FakeEpisode-like episodes."""

        def __init__(self, env):
            self._env = env

        @property
        def episodes(self):
            return [_EpisodeView(ep) for ep in self._env.episodes]

        @property
        def current_episode(self):
            return _EpisodeView(self._env.current_episode)

        @current_episode.setter
        def current_episode(self, ep):
            self._env.current_episode = ep._ep

        def reset(self):
            return self._env.reset()

        def step(self, action):
            return self._env.step(action)

        @property
        def episode_over(self):
            return self._env.episode_over

        def get_metrics(self):
            return self._env.get_metrics()

        def close(self):
            self._env.close()

    class _EpisodeView:
        def __init__(self, ep):
            self._ep = ep

        @property
        def episode_id(self):
            return self._ep.episode_id

        @property
        def scene_id(self):
            return self._ep.scene_id

        @property
        def instruction_text(self):
            return self._ep.instruction.instruction_text

        @property
        def reference_path(self):
            return getattr(self._ep, "reference_path", None)

    return _Adapter(env)
