"""HF checkpoint conversion parity: our forward vs transformers' forward
on identical weights (tiny configs, CPU, fp32)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import Qwen2Config, SigLIPConfig
from streamvln_tpu.models import convert_hf, qwen2, siglip


@pytest.fixture(scope="module")
def torch():
    import torch
    torch.manual_seed(0)
    return torch


@pytest.mark.slow
def test_qwen2_logits_match_transformers(torch):
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    hf_cfg = HFQwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attn_implementation="eager")
    model = Qwen2ForCausalLM(hf_cfg).eval().float()

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, tie_word_embeddings=False)

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf.convert_qwen2(state, cfg, dtype=jnp.float32)

    ids = np.random.RandomState(0).randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    x = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    ours, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                               atol=2e-4)


def test_siglip_features_match_transformers(torch):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    # 3-layer checkpoint; the framework drops the last -> num_layers=2
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        attn_implementation="eager")
    model = SiglipVisionModel(hf_cfg).eval().float()

    cfg = SigLIPConfig(hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, image_size=28,
                       patch_size=14)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf.convert_siglip(state, cfg, dtype=jnp.float32)

    imgs = np.random.RandomState(1).randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(imgs).permute(0, 3, 1, 2),
                    output_hidden_states=True)
        # reference takes hidden_states[-1] of the truncated stack ==
        # hidden_states[-2] of the full stack (no post-layernorm)
        ref = out.hidden_states[-2].numpy()

    ours = siglip.forward(params, cfg, jnp.asarray(imgs),
                          attn_impl="dense")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                               atol=2e-4)


def test_projector_matches_torch_sequential(torch):
    lin1 = torch.nn.Linear(32, 64)
    lin2 = torch.nn.Linear(64, 64)
    seq = torch.nn.Sequential(lin1, torch.nn.GELU(), lin2).eval()
    state = {f"mm_projector.{k}": v.detach().numpy()
             for k, v in seq.state_dict().items()}
    params = convert_hf.convert_projector(state, "mlp2x_gelu",
                                          dtype=jnp.float32)
    from streamvln_tpu.models import projector as proj_lib
    x = np.random.RandomState(2).randn(5, 32).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.tensor(x)).numpy()
    ours = proj_lib.forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4,
                               atol=1e-5)
