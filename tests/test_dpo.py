"""DPO training: loss math + end-to-end preference step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.parallel import dpo as dpo_lib
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import train as train_lib


def _sample(tok, images_shape, chosen="↑↑", rejected="←←"):
    rng = np.random.RandomState(0)
    images = rng.rand(*images_shape).astype(np.float32)
    out = {"images": images}
    for side, ans in (("chosen", chosen), ("rejected", rejected)):
        turns = [("user", "go forward you can see <image>."),
                 ("assistant", ans)]
        ids, labels = chatml.tokenize_dialogue(tok, turns,
                                               add_system=True)
        out[f"{side}_input_ids"] = ids
        out[f"{side}_labels"] = labels
    return out


@pytest.mark.slow
def test_dpo_step_prefers_chosen():
    cfg = tiny_streamvln()
    tok = ByteTokenizer()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    # distinct buffers: the policy state is donated into the step
    ref_params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tcfg = train_lib.TrainConfig(learning_rate=5e-3, total_steps=30,
                                 remat=False)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1,
                              devices=jax.devices()[:1])
    state = train_lib.create_train_state(params, tcfg)
    step = dpo_lib.make_dpo_step(cfg, tcfg, mesh, beta=0.5)

    S = cfg.vision.image_size
    batch = dpo_lib.make_dpo_batch(
        [_sample(tok, (1, S, S, 3))], cfg, length_buckets=(512,))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses, accs = [], []
    for _ in range(6):
        state, m = step(state, ref_params, batch)
        losses.append(float(m["loss"]))
        accs.append(float(m["dpo_accuracy"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # preference gap opens
    assert accs[-1] == 1.0                 # chosen preferred

    # policy now scores the chosen answer higher than reference does
    layout = {k: batch[f"chosen_{k}"] for k in
              ("token_ids", "is_vision", "vision_index", "labels",
               "valid")}
    pi = dpo_lib.sequence_logprob(state.params, cfg, batch["images"],
                                  layout)
    ref = dpo_lib.sequence_logprob(ref_params, cfg, batch["images"],
                                   layout)
    assert float(pi[0]) > float(ref[0])
