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


# ---------------------------------------------------------------------------
# EVA-CLIP towers — torch oracle implemented from the reference
# semantics (eva_clip/eva_vit.py; studied from, not copied), lockstep
# vs our JAX tower through convert_eva_tower.
# ---------------------------------------------------------------------------

def _torch_eva(cfg, state, pix):
    """Reference-semantics EVA forward (eva_vit.py:665-706, 242-444):
    patch conv + cls + abs pos, blocks (LAST block skipped), rope on
    non-cls tokens, subln inner/ffn LNs, SwiGLU, no final norm, cls
    dropped (EVAEncoderWrapper :839-846)."""
    import torch
    import torch.nn.functional as TF

    def g(name):
        return torch.from_numpy(np.asarray(state[name], np.float32))

    x = TF.conv2d(pix, g("patch_embed.proj.weight"),
                  g("patch_embed.proj.bias"),
                  stride=cfg.patch_size)             # [B, D, g, g]
    B, D = x.shape[0], cfg.hidden_size
    x = x.flatten(2).transpose(1, 2)                 # [B, N, D]
    cls = g("cls_token").reshape(1, 1, D).expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + g("pos_embed")

    H, Dh = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    rope_cos = rope_sin = None
    if cfg.rope2d:
        dim = Dh // 2
        inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
        gr = cfg.grid
        if cfg.intp_freq:
            t = torch.arange(gr).float() / gr * cfg.pt_hw_seq_len
        else:
            t = torch.arange(gr).float()
        f = torch.einsum("i,j->ij", t, inv)
        f = f.repeat_interleave(2, dim=-1)           # (n r) r=2
        full = torch.cat([f[:, None, :].expand(gr, gr, -1),
                          f[None, :, :].expand(gr, gr, -1)], dim=-1)
        rope_cos = full.cos().view(-1, Dh)
        rope_sin = full.sin().view(-1, Dh)

    def rot_half(v):
        v = v.reshape(*v.shape[:-1], -1, 2)
        v1, v2 = v.unbind(dim=-1)
        return torch.stack((-v2, v1), dim=-1).reshape(
            *v1.shape[:-1], -1)

    def apply_rope(v):                               # [B, H, T, Dh]
        return v * rope_cos + rot_half(v) * rope_sin

    N1 = x.shape[1]
    for i in range(cfg.num_layers):
        if i == cfg.num_layers - 1:
            continue                                 # eva_vit.py:692
        b = f"blocks.{i}."
        h = TF.layer_norm(x, (D,), g(b + "norm1.weight"),
                          g(b + "norm1.bias"), eps)
        if cfg.subln:
            q = TF.linear(h, g(b + "attn.q_proj.weight"),
                          g(b + "attn.q_bias"))
            k = TF.linear(h, g(b + "attn.k_proj.weight"))
            v = TF.linear(h, g(b + "attn.v_proj.weight"),
                          g(b + "attn.v_bias"))
        else:
            qkv_b = torch.cat([g(b + "attn.q_bias"),
                               torch.zeros(D),
                               g(b + "attn.v_bias")])
            qkv = TF.linear(h, g(b + "attn.qkv.weight"), qkv_b)
            q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(B, N1, H, Dh).permute(0, 2, 1, 3)
        k = k.reshape(B, N1, H, Dh).permute(0, 2, 1, 3)
        v = v.reshape(B, N1, H, Dh).permute(0, 2, 1, 3)
        if rope_cos is not None:
            q = torch.cat([q[:, :, :1], apply_rope(q[:, :, 1:])], dim=2)
            k = torch.cat([k[:, :, :1], apply_rope(k[:, :, 1:])], dim=2)
        attn = (q * Dh ** -0.5) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        a = (attn @ v).transpose(1, 2).reshape(B, N1, -1)
        if cfg.subln:
            a = TF.layer_norm(a, (D,), g(b + "attn.inner_attn_ln.weight"),
                              g(b + "attn.inner_attn_ln.bias"), eps)
        a = TF.linear(a, g(b + "attn.proj.weight"),
                      g(b + "attn.proj.bias"))
        x = x + a
        h = TF.layer_norm(x, (D,), g(b + "norm2.weight"),
                          g(b + "norm2.bias"), eps)
        if cfg.swiglu:
            x1 = TF.linear(h, g(b + "mlp.w1.weight"), g(b + "mlp.w1.bias"))
            x2 = TF.linear(h, g(b + "mlp.w2.weight"), g(b + "mlp.w2.bias"))
            hid = TF.silu(x1) * x2
            if cfg.subln:
                hid = TF.layer_norm(hid, (hid.shape[-1],),
                                    g(b + "mlp.ffn_ln.weight"),
                                    g(b + "mlp.ffn_ln.bias"), eps)
            m = TF.linear(hid, g(b + "mlp.w3.weight"), g(b + "mlp.w3.bias"))
        else:
            hid = TF.gelu(TF.linear(h, g(b + "mlp.fc1.weight"),
                                    g(b + "mlp.fc1.bias")))
            m = TF.linear(hid, g(b + "mlp.fc2.weight"),
                          g(b + "mlp.fc2.bias"))
        x = x + m
    return x[:, 1:]                                  # drop cls, no norm


def _rand_eva_state(cfg, seed=0):
    rng = np.random.RandomState(seed)
    D, F, P = cfg.hidden_size, cfg.intermediate_size, cfg.patch_size

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    state = {
        "patch_embed.proj.weight": r(D, 3, P, P),
        "patch_embed.proj.bias": r(D),
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, cfg.num_patches + 1, D),
    }
    for i in range(cfg.num_layers - 1):
        b = f"blocks.{i}."
        state[b + "norm1.weight"] = 1 + r(D)
        state[b + "norm1.bias"] = r(D)
        if cfg.subln:
            state[b + "attn.q_proj.weight"] = r(D, D)
            state[b + "attn.k_proj.weight"] = r(D, D)
            state[b + "attn.v_proj.weight"] = r(D, D)
            state[b + "attn.inner_attn_ln.weight"] = 1 + r(D)
            state[b + "attn.inner_attn_ln.bias"] = r(D)
        else:
            state[b + "attn.qkv.weight"] = r(3 * D, D)
        state[b + "attn.q_bias"] = r(D)
        state[b + "attn.v_bias"] = r(D)
        state[b + "attn.proj.weight"] = r(D, D)
        state[b + "attn.proj.bias"] = r(D)
        state[b + "norm2.weight"] = 1 + r(D)
        state[b + "norm2.bias"] = r(D)
        if cfg.swiglu:
            for w in ("w1", "w2"):
                state[b + f"mlp.{w}.weight"] = r(F, D)
                state[b + f"mlp.{w}.bias"] = r(F)
            state[b + "mlp.w3.weight"] = r(D, F)
            state[b + "mlp.w3.bias"] = r(D)
            if cfg.subln:
                state[b + "mlp.ffn_ln.weight"] = 1 + r(F)
                state[b + "mlp.ffn_ln.bias"] = r(F)
        else:
            state[b + "mlp.fc1.weight"] = r(F, D)
            state[b + "mlp.fc1.bias"] = r(F)
            state[b + "mlp.fc2.weight"] = r(D, F)
            state[b + "mlp.fc2.bias"] = r(D)
    return state


@pytest.mark.parametrize("variant", ["eva01", "eva02"])
def test_eva_tower_parity(variant):
    torch = pytest.importorskip("torch")
    from streamvln_tpu.models.encoders import (
        EvaVisionConfig, convert_eva_tower, eva_forward)

    if variant == "eva01":
        cfg = EvaVisionConfig(hidden_size=32, intermediate_size=64,
                              num_layers=3, num_heads=2, image_size=32,
                              patch_size=8)
    else:
        cfg = EvaVisionConfig(hidden_size=32, intermediate_size=48,
                              num_layers=3, num_heads=2, image_size=32,
                              patch_size=8, subln=True, swiglu=True,
                              rope2d=True, intp_freq=True,
                              pt_hw_seq_len=8)
    state = _rand_eva_state(cfg)
    pix = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = _torch_eva(cfg, state, torch.from_numpy(pix)).numpy()

    params = convert_eva_tower(state, cfg)
    got = np.asarray(eva_forward(
        params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1)),
        attn_impl="dense"))
    assert got.shape == (2, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_eva_builder_dispatch():
    from streamvln_tpu.models.encoders import EvaVisionConfig

    cfg, init_fn, fwd = build_vision_tower(
        "EVA02-CLIP-L-14-336",
        hidden_size=32, intermediate_size=48, num_layers=3,
        num_heads=2, image_size=32, patch_size=8, pt_hw_seq_len=8)
    assert isinstance(cfg, EvaVisionConfig) and cfg.swiglu and cfg.subln
    params = init_fn(jax.random.PRNGKey(0), cfg)
    out = fwd(params, jnp.zeros((1, 32, 32, 3)), attn_impl="dense")
    assert out.shape == (1, cfg.num_patches, 32)

    with pytest.raises(ValueError, match="use_rms_norm"):
        build_vision_tower("EVA-CLIP-8B")
