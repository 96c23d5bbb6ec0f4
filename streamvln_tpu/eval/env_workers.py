"""Multi-process environment workers for batched evaluation.

The reference runs one habitat simulator per GPU *process*
(torchrun x8; streamvln_eval.py:219). The TPU topology inverts that:
ONE process owns the chip and drives N env slots
(eval/batched_evaluator.py), so the simulators must come to the model.
A habitat-sim step costs 10-30 ms of host C++ — stepping N sims
sequentially in the driver thread would serialize right back. This
pool hosts each env in its own OS process with a pipe command
protocol and exposes async step dispatch, so all N sims step
concurrently while the chip decodes (SURVEY §7 hard part 5).

Works with any picklable env_factory returning the FakeNavEnv/
HabitatBackend interface (reset/step/episode_over/get_metrics/
current_episode/close).
"""
from __future__ import annotations

import multiprocessing as mp
from typing import Callable, List


def _worker_loop(env_factory, conn):
    env = env_factory()
    try:
        while True:
            cmd, arg = conn.recv()
            if cmd == "reset":
                conn.send(env.reset())
            elif cmd == "step":
                conn.send(env.step(arg))
            elif cmd == "episode_over":
                conn.send(env.episode_over)
            elif cmd == "get_metrics":
                conn.send(env.get_metrics())
            elif cmd == "set_episode":
                env.current_episode = arg
                conn.send(True)
            elif cmd == "getattr":
                conn.send(getattr(env, arg))
            elif cmd == "close":
                if hasattr(env, "close"):
                    env.close()
                conn.send(True)
                break
    except (EOFError, KeyboardInterrupt):
        pass


class RemoteEnv:
    """Parent-side proxy for one env worker process.

    Mirrors the in-process env interface; additionally exposes
    step_async/step_wait so the evaluator can overlap N sim steps.
    """

    def __init__(self, env_factory: Callable[[], object],
                 ctx=None):
        # spawn, not fork: the evaluator process owns a live JAX/TPU
        # client (threads + locks that are not fork-safe); spawned
        # workers start clean. env_factory must be picklable.
        ctx = ctx or mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(target=_worker_loop,
                                 args=(env_factory, child),
                                 daemon=True)
        self._proc.start()
        child.close()
        self._pending = False

    def _call(self, cmd, arg=None):
        assert not self._pending, "collect step_wait() first"
        self._conn.send((cmd, arg))
        return self._conn.recv()

    def reset(self):
        return self._call("reset")

    def step(self, action):
        return self._call("step", action)

    def step_async(self, action):
        assert not self._pending
        self._conn.send(("step", action))
        self._pending = True

    def step_wait(self):
        assert self._pending
        self._pending = False
        return self._conn.recv()

    @property
    def episode_over(self):
        return self._call("episode_over")

    def get_metrics(self):
        return self._call("get_metrics")

    @property
    def current_episode(self):
        return self._call("getattr", "current_episode")

    @current_episode.setter
    def current_episode(self, ep):
        self._call("set_episode", ep)

    def close(self):
        # an evaluator error between step_async and step_wait leaves a
        # reply in flight; drain it so close() doesn't trip the
        # no-pending assert and mask the original exception
        if self._pending:
            try:
                self.step_wait()
            except (BrokenPipeError, EOFError):
                self._pending = False
        try:
            self._call("close")
        except (BrokenPipeError, EOFError):
            pass
        self._proc.join(timeout=5)
        if self._proc.is_alive():
            self._proc.terminate()


def remote_env_factory(
        env_factory: Callable[[], object]) -> Callable[[], RemoteEnv]:
    """Wrap a (picklable) env factory so each call spawns a worker
    process: `BatchedVLNEvaluator(remote_env_factory(make_env), ...)`
    hosts every slot's simulator out-of-process."""
    ctx = mp.get_context("spawn")
    return lambda: RemoteEnv(env_factory, ctx)
