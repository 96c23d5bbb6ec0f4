"""HTTP server + realworld client tests: live server round-trip,
PID/goal-integration math, client plan/control loop."""
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.realworld.goal_integrator import (
    incremental_change_goal)
from streamvln_tpu.realworld.pid_controller import PIDController
from streamvln_tpu.serve.http_server import AgentService, serve
from streamvln_tpu.streaming.engine import StreamingEngine


# -- pure math ----------------------------------------------------------

def test_goal_integration_forward_follows_heading():
    goal = np.eye(4)
    incremental_change_goal(goal, [1, 1])          # 0.5 m east
    np.testing.assert_allclose(goal[:2, 3], [0.5, 0.0], atol=1e-9)
    incremental_change_goal(goal, [2] * 6)         # +90 deg
    incremental_change_goal(goal, [1])             # 0.25 m north
    np.testing.assert_allclose(goal[:2, 3], [0.5, 0.25], atol=1e-9)


def test_goal_integration_turns_cancel():
    goal = np.eye(4)
    incremental_change_goal(goal, [2, 3, 2, 3])
    np.testing.assert_allclose(goal, np.eye(4), atol=1e-12)


def test_pid_drives_toward_goal():
    pid = PIDController()
    odom = np.eye(4)
    goal = np.eye(4)
    goal[0, 3] = 1.0                    # 1 m ahead
    v, w, te, ye = pid.solve(odom, goal)
    assert v > 0 and abs(w) < 1e-9 and te == pytest.approx(1.0)
    # goal behind -> reverse
    goal[0, 3] = -1.0
    v, w, _, _ = pid.solve(odom, goal)
    assert v < 0
    # pure rotation target
    goal = np.eye(4)
    goal[:2, :2] = [[0, -1], [1, 0]]    # +90 deg
    v, w, _, ye = pid.solve(odom, goal)
    assert w > 0 and ye == pytest.approx(np.pi / 2)


def test_pid_clamps():
    pid = PIDController(max_v=0.3, max_w=0.5)
    odom = np.eye(4)
    goal = np.eye(4)
    goal[0, 3] = 10.0
    v, w, _, _ = pid.solve(odom, goal)
    assert v == pytest.approx(0.3)


# -- live server round-trip --------------------------------------------

@pytest.fixture(scope="module")
def live_server():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(256, 512, 768, 1024))
    agent = VLNAgent(engine, tok)
    service = AgentService(agent, "walk ahead",
                           num_future_steps=cfg.num_future_steps,
                           run_root="/tmp/claude-0/serve_runs")
    server = serve(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/eval_vln", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def test_server_roundtrip(live_server):
    from streamvln_tpu.realworld.go2_vln_client import post_frame
    rgb = np.random.RandomState(0).randint(
        0, 255, (48, 64, 3), np.uint8)
    actions = post_frame(live_server, rgb, reset=True,
                         instruction="go to the door")
    assert isinstance(actions, list) and len(actions) >= 1
    assert all(a in (0, 1, 2, 3) for a in actions)
    # second request without reset continues the dialogue
    actions2 = post_frame(live_server, rgb, reset=False)
    assert isinstance(actions2, list)


def test_server_rejects_garbage(live_server):
    req = urllib.request.Request(
        live_server + "/eval_vln", data=b"not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_client_plan_and_control(live_server):
    from streamvln_tpu.realworld.go2_vln_client import Go2VlnManager
    mgr = Go2VlnManager(server_url=live_server,
                        instruction="move forward", use_ros=False)
    mgr.set_odom(0.0, 0.0, 0.0)
    mgr.set_image(np.zeros((48, 64, 3), np.uint8))
    actions = mgr.plan_once()
    assert actions is not None
    cmd = mgr.control_once()
    assert cmd is not None
    v, w = cmd
    assert np.isfinite([v, w]).all()
