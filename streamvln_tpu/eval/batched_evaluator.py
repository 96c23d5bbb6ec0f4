"""Batched multi-env evaluation: N parallel episodes per chip.

The reference parallelizes eval as one env per GPU process
(reference: streamvln_eval.py:219 episodes[rank::world]). TPU-native
upgrade: one process drives N envs against ONE model via
StreamingEngine.generate_batch — decode batches across dialogues, so a
chip's weight-bandwidth cost is amortized over N envs (BASELINE.json
config "Batched multi-env eval").

Each env keeps its own VLNAgent-style dialogue state; envs that need a
model call this step are grouped into a single device dispatch. Episodes
are pulled from a shared queue so fast episodes don't idle a slot.
"""
from __future__ import annotations

import json
import os
from typing import Callable, List, Optional

import numpy as np

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.data import chatml
from streamvln_tpu.streaming.engine import StreamingEngine
from streamvln_tpu.utils.constants import MEMORY_PROMPT_EVAL


class BatchedVLNEvaluator:
    def __init__(self, env_factory: Callable[[], object],
                 agent: VLNAgent, output_path: str,
                 max_steps_per_episode: Optional[int] = None):
        """env_factory: builds one env instance per slot (each slot
        steps its own simulator). agent: a VLNAgent whose engine has
        n_envs slots."""
        self.engine: StreamingEngine = agent.engine
        self.agent = agent
        self.agent.memory_prompt = MEMORY_PROMPT_EVAL
        self.n = self.engine.n_envs
        self.envs = [env_factory() for _ in range(self.n)]
        self.output_path = output_path
        self.max_steps = max_steps_per_episode
        os.makedirs(output_path, exist_ok=True)

    def run(self, episodes: List) -> List[dict]:
        queue = list(episodes)
        results = []
        # slot state
        current = [None] * self.n        # episode per slot
        obs = [None] * self.n
        action_q: List[List[int]] = [[] for _ in range(self.n)]
        steps = [0] * self.n

        def start(slot):
            if not queue:
                current[slot] = None
                return
            ep = queue.pop(0)
            current[slot] = ep
            self.envs[slot].current_episode = ep
            obs[slot] = self.envs[slot].reset()
            self.agent.reset_memory(slot)
            action_q[slot] = []
            steps[slot] = 0

        for slot in range(self.n):
            start(slot)

        while any(ep is not None for ep in current):
            # 1. classify slots; build model requests (host-side prep)
            requests = []
            queued_slots = []
            for slot in range(self.n):
                if current[slot] is None:
                    continue
                if action_q[slot]:
                    queued_slots.append(slot)
                else:
                    requests.append(self.agent.prepare_model_step(
                        slot, obs[slot]["rgb"],
                        current[slot].instruction_text))

            # 2. dispatch the batched model call WITHOUT blocking
            handle = self.engine.generate_batch_async(
                [r["request"] for r in requests]) if requests else None

            # 3. while the device decodes, step the simulators of slots
            #    that already have queued actions (host/device overlap —
            #    SURVEY §7 hard part 5). With multi-process env workers
            #    (eval/env_workers.py RemoteEnv), the steps themselves
            #    also run concurrently across host cores: dispatch all,
            #    then collect.
            stepped = []
            async_slots = []
            for slot in queued_slots:
                self.agent.step(slot, obs[slot]["rgb"],
                                current[slot].instruction_text,
                                run_model=False)
                action = action_q[slot].pop(0)
                env = self.envs[slot]
                if hasattr(env, "step_async"):
                    env.step_async(action)
                    async_slots.append(slot)
                else:
                    obs[slot] = env.step(action)
                steps[slot] += 1
                stepped.append(slot)

            # 4. collect tokens; step the model slots' envs
            if handle is not None:
                outs = self.engine.collect(handle)
                for r in requests:
                    slot = r["slot"]
                    text = self.agent.tok.decode(outs[slot])
                    actions = chatml.parse_actions(text) or [0]
                    self.agent.finish_model_step(slot)
                    action_q[slot] = list(actions)
                    action = action_q[slot].pop(0)
                    env = self.envs[slot]
                    if hasattr(env, "step_async"):
                        env.step_async(action)
                        async_slots.append(slot)
                    else:
                        obs[slot] = env.step(action)
                    steps[slot] += 1
                    stepped.append(slot)

            for slot in async_slots:
                obs[slot] = self.envs[slot].step_wait()

            # 5. episode bookkeeping
            for slot in stepped:
                ep = current[slot]
                if steps[slot] % self.agent.cfg.num_frames == 0:
                    self.engine.reset_for_env(slot)
                    self.agent.in_dialogue[slot] = False
                    self.agent.time_ids[slot] = []
                done = self.envs[slot].episode_over or (
                    self.max_steps and steps[slot] >= self.max_steps)
                if done:
                    m = self.envs[slot].get_metrics()
                    scene_id = ep.scene_id.split("/")[-2] \
                        if "/" in ep.scene_id else ep.scene_id
                    res = {"scene_id": scene_id,
                           "episode_id": ep.episode_id,
                           "success": m["success"], "spl": m["spl"],
                           "os": m["oracle_success"],
                           "ne": m["distance_to_goal"],
                           "steps": steps[slot],
                           "episode_instruction": ep.instruction_text}
                    if "ndtw" in m:
                        res["ndtw"] = m["ndtw"]
                    results.append(res)
                    with open(os.path.join(self.output_path,
                                           "result.json"), "a") as f:
                        f.write(json.dumps(res) + "\n")
                    start(slot)
        return results

    def close(self):
        """Shut down env slots (joins RemoteEnv worker processes)."""
        for env in self.envs:
            if hasattr(env, "close"):
                env.close()
