"""Reference-scale training context: one train step at
model_max_length 32768 (reference: scripts/streamvln_train_slurm.sh:68)
through the chunked-CE + remat + chunked-attention path on the tiny
config. The real-chip 7B measurement lives in PARITY.md; this keeps the
32k bucket compiling and numerically sane in CI.

Single device on purpose: the 8-virtual-CPU-device mesh aborts on XLA's
40 s collective-rendezvous timeout under 32k-sized per-device work
(threads share host cores); FSDP-mesh coverage of the same code path
runs at shorter seq in test_parallel."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu import configs
from streamvln_tpu.models import streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import train as train_lib
from streamvln_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


@pytest.mark.slow
def test_train_step_32k_context():
    cfg = configs.StreamVLNConfig(
        vision=configs.tiny_vision(),
        llm=configs.Qwen2Config(
            vocab_size=128, hidden_size=16, intermediate_size=32,
            num_layers=1, num_heads=1, num_kv_heads=1, head_dim=16,
            rope_theta=1e6, max_position_embeddings=65536),
        num_frames=8, num_future_steps=2, num_history=2)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1,
                              devices=jax.devices()[:1])
    tcfg = train_lib.TrainConfig(
        total_steps=2, remat=True, attn_impl="chunked",
        loss_chunk_size=2048, warmup_ratio=0.0, mlp_chunk=4096)
    params = mesh_lib.shard_params(
        streamvln.init(jax.random.PRNGKey(0), cfg), mesh)
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)

    S = 32768
    ids = np.full((400,), 5, np.int32)
    ids[1] = IMAGE_TOKEN_INDEX
    labels = np.where(np.arange(400) > 200, ids,
                      IGNORE_INDEX).astype(np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, labels=labels,
                                           pad_to=S)
    batch = {k: jnp.asarray(v)
             for k, v in streamvln.stack_layouts([layout]).items()
             if k != "lengths"}
    IS = cfg.vision.image_size
    batch["images"] = jnp.zeros((1, 1, IS, IS, 3), jnp.float32)

    state, m = step(state, batch)
    loss = float(m["loss"])
    assert np.isfinite(loss) and loss > 0
    assert np.isfinite(float(m["grad_norm"]))
