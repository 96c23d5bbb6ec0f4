"""Orbax save/restore of sharded state + HF export round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import convert_hf, streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import train as train_lib
from streamvln_tpu.utils import checkpoint as ckpt


@pytest.mark.slow
def test_orbax_roundtrip_sharded(tmp_path):
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(total_steps=10)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=8, tp=1)
    params = mesh_lib.shard_params(
        streamvln.init(jax.random.PRNGKey(0), cfg), mesh)
    state = train_lib.create_train_state(params, tcfg)

    ckpt.save_checkpoint(str(tmp_path / "ck"), state, step=3, wait=True)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 3

    fresh = train_lib.create_train_state(
        mesh_lib.shard_params(
            streamvln.init(jax.random.PRNGKey(1), cfg), mesh), tcfg)
    restored, step = ckpt.resume_latest(str(tmp_path / "ck"), fresh)
    assert step == 3
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_latest_fresh_dir(tmp_path):
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(total_steps=10)
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    state = train_lib.create_train_state(params, tcfg)
    restored, step = ckpt.resume_latest(str(tmp_path / "none"), state)
    assert step == 0
    assert restored is state


def test_hf_export_roundtrip():
    """export_hf -> convert_streamvln reproduces the original params."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    state = ckpt.export_hf(params, cfg)
    back = convert_hf.convert_streamvln(state, cfg, dtype=jnp.float32)
    orig_flat = jax.tree_util.tree_flatten(params)[0]
    back_flat = jax.tree_util.tree_flatten(back)[0]
    assert len(orig_flat) == len(back_flat)
    for a, b in zip(orig_flat, back_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
