"""Encoder zoo: CLIP tower parity vs transformers, MLCD 2D-RoPE,
S2 wrapper, builder dispatch (reference:
llava/model/multimodal_encoder/builder.py:13-42)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from streamvln_tpu.models.encoders import (
    ClipVisionConfig, build_vision_tower, convert_hf_clip_tower,
    forward, init, s2_forward)

TINY = dict(hidden_size=32, intermediate_size=64, num_layers=3,
            num_heads=4, image_size=32, patch_size=8)


def test_clip_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64,
                   num_hidden_layers=3, num_attention_heads=4,
                   image_size=32, patch_size=8,
                   hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = ClipVisionConfig(**TINY, select_layer=-2,
                           select_feature="cls_patch")
    params = convert_hf_clip_tower(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    pix = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(pix), output_hidden_states=True)
    want = out.hidden_states[-2].numpy()

    imgs = jnp.asarray(pix.transpose(0, 2, 3, 1))
    got = np.asarray(forward(params, cfg, imgs, attn_impl="dense"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    # "patch" select drops the class token
    cfg_p = ClipVisionConfig(**TINY, select_feature="patch")
    got_p = np.asarray(forward(params, cfg_p, imgs, attn_impl="dense"))
    np.testing.assert_allclose(got_p, want[:, 1:], atol=2e-4,
                               rtol=2e-3)


def test_mlcd_rope2d_tower():
    cfg = ClipVisionConfig(**TINY, hidden_act="gelu", rope2d=True)
    params = init(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" not in params and "class_pos_emb" in params
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = forward(params, cfg, imgs, attn_impl="dense")
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
    # rotary phases make the tower position-sensitive: permuting
    # patches changes outputs beyond a permutation
    imgs2 = imgs[:, ::-1]
    out2 = forward(params, cfg, imgs2, attn_impl="dense")
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_s2_wrapper():
    cfg = ClipVisionConfig(**TINY)
    params = init(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def fwd(im):
        return forward(params, cfg, im, attn_impl="dense")

    out = s2_forward(fwd, imgs, 32, (32, 64))
    assert out.shape == (2, 16, 64)    # 2 scales x hidden 32
    # scale-1 channels are exactly the plain forward
    np.testing.assert_allclose(np.asarray(out[..., :32]),
                               np.asarray(fwd(imgs)), rtol=1e-6,
                               atol=1e-6)


def test_builder_dispatch():
    cfg, init_fn, fwd = build_vision_tower(
        "openai/clip-vit-large-patch14-336", num_layers=2,
        hidden_size=32, intermediate_size=64, num_heads=4,
        image_size=32, patch_size=8)
    assert cfg.hidden_act == "quick_gelu"
    p = init_fn(jax.random.PRNGKey(0), cfg)
    out = fwd(p, jnp.zeros((1, 32, 32, 3)), attn_impl="dense")
    assert out.shape == (1, 16, 32)

    cfg2, _, _ = build_vision_tower("DeepGlint-AI/"
                                    "mlcd-vit-bigG-patch14-336")
    assert cfg2.rope2d and cfg2.hidden_size == 1664

    sig_cfg, sig_init, sig_fwd = build_vision_tower(
        "google/siglip-so400m-patch14-384")
    assert sig_cfg.hidden_size == 1152

    with pytest.raises(ValueError, match="imagebind"):
        build_vision_tower("imagebind_huge")
    with pytest.raises(ValueError, match="Unknown vision tower"):
        build_vision_tower("not-a-tower")


def test_builder_s2_dispatch():
    cfg, init_fn, fwd = build_vision_tower(
        "openai/clip-vit-large-patch14-336", s2=True,
        s2_scales=(32, 64), num_layers=2, hidden_size=32,
        intermediate_size=64, num_heads=4, image_size=32,
        patch_size=8)
    p = init_fn(jax.random.PRNGKey(0), cfg)
    out = fwd(p, jnp.zeros((1, 32, 32, 3)), attn_impl="dense")
    assert out.shape == (1, 16, 64)


def test_convert_rope2d_tower():
    # MLCD-style state: no position embeddings, has class_pos_emb
    cfg = ClipVisionConfig(**TINY, hidden_act="gelu", rope2d=True)
    rng = np.random.RandomState(3)
    D, F, P = 32, 64, 8
    state = {"vision_model.embeddings.patch_embedding.weight":
             rng.randn(D, 3, P, P).astype(np.float32),
             "vision_model.embeddings.class_embedding":
             rng.randn(D).astype(np.float32),
             "vision_model.pre_layrnorm.weight":
             np.ones(D, np.float32),
             "vision_model.pre_layrnorm.bias":
             np.zeros(D, np.float32),
             "vision_model.class_pos_emb":
             rng.randn(1, cfg.head_dim // 2).astype(np.float32)}
    for i in range(cfg.num_layers):
        lp = f"vision_model.encoder.layers.{i}."
        for nm, shape in [("layer_norm1.weight", (D,)),
                          ("layer_norm1.bias", (D,)),
                          ("layer_norm2.weight", (D,)),
                          ("layer_norm2.bias", (D,))]:
            state[lp + nm] = np.ones(shape, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[lp + f"self_attn.{nm}.weight"] = \
                rng.randn(D, D).astype(np.float32) * 0.05
            state[lp + f"self_attn.{nm}.bias"] = \
                np.zeros(D, np.float32)
        state[lp + "mlp.fc1.weight"] = \
            rng.randn(F, D).astype(np.float32) * 0.05
        state[lp + "mlp.fc1.bias"] = np.zeros(F, np.float32)
        state[lp + "mlp.fc2.weight"] = \
            rng.randn(D, F).astype(np.float32) * 0.05
        state[lp + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    params = convert_hf_clip_tower(state, cfg)
    assert "class_pos_emb" in params and "pos_embed" not in params
    out = forward(params, cfg, jnp.zeros((1, 32, 32, 3)),
                  attn_impl="dense")
    assert out.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
