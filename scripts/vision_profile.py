"""Vision-tower MFU decomposition on the real chip (VERDICT r4 #6).

Where do the non-MXU milliseconds of a SigLIP encode go? This script
measures, at the bench's exact shapes (so400m: S=729, D=1152, FF=4304,
H=16, Dh=72, 26 layers, batch 32 bf16):

  1. the full tower (attn auto = VMEM kernel, and dense) — the bench's
     vision_fps / vision_mfu_pct numbers;
  2. component ablations over a script-local mirror of
     siglip.forward_embeddings (attention / LN / GELU / MLP stubbed in
     turn) — each component's marginal cost inside the real layer scan;
  3. pure-matmul probes at the constituent shapes — the achievable
     MXU rate for each matmul class, i.e. the compute floor a perfect
     fusion could reach (the QK^T/PV probes include the Dh=72 -> 128
     pad tax, which is intrinsic to the checkpoint's head dim).

The mirror's drift vs the real forward is measured and reported; if it
exceeds 5% the ablations are flagged untrusted (loud stderr warning).
Output: one JSON line per measurement plus a summary table.

Usage (owns the TPU while it runs):
  python scripts/vision_profile.py [--batch 32] [--dense]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from streamvln_tpu import configs
from streamvln_tpu.models import siglip
from streamvln_tpu.ops.attention import mha_attention

PEAK_BF16_TFLOPS = 197.0  # v5e


def sync(x):
    # block_until_ready is unreliable through the axon tunnel; a tiny
    # host readback is a true sync (see bench.py).
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def mirror_forward(params, cfg, embeds, *, attn_impl="auto",
                   use_attn=True, use_ln=True, use_gelu=True,
                   use_mlp=True):
    """Script-local copy of siglip.forward_embeddings (siglip.py:117)
    with stubbable components. Ablations keep the dataflow (residual
    adds, dtype round-trips) so only the stubbed op's cost drops out."""
    B = embeds.shape[0]
    x = embeds + params["pos_embed"].astype(embeds.dtype)[None]
    H, Dh = cfg.num_heads, cfg.head_dim
    N = cfg.num_patches

    def ln(x, s, b):
        if not use_ln:
            return x
        return siglip.layer_norm(x, s, b, cfg.layer_norm_eps)

    def block(x, p):
        in_dtype = x.dtype
        h = ln(x, p["ln1_s"], p["ln1_b"])
        if "qkv_w" in p:
            # --fuse A/B arm: measured 14.6 ms SLOWER than three
            # separate dots at these shapes (negative result kept
            # reproducible; see models/fuse.py docstring)
            qkv = jnp.dot(h, p["qkv_w"]) + p["qkv_b"]
            q, k, v = (s.reshape(B, N, H, Dh)
                       for s in jnp.split(qkv, 3, axis=-1))
        else:
            q = (jnp.dot(h, p["q_w"]) + p["q_b"]).reshape(B, N, H, Dh)
            k = (jnp.dot(h, p["k_w"]) + p["k_b"]).reshape(B, N, H, Dh)
            v = (jnp.dot(h, p["v_w"]) + p["v_b"]).reshape(B, N, H, Dh)
        attn = mha_attention(q, k, v, impl=attn_impl) if use_attn else v
        attn = attn.reshape(B, N, H * Dh)
        x = x + jnp.dot(attn, p["o_w"]) + p["o_b"]
        h = ln(x, p["ln2_s"], p["ln2_b"])
        if use_mlp:
            h = jnp.dot(h, p["fc1_w"]) + p["fc1_b"]
            if use_gelu:
                h = jax.nn.gelu(h, approximate=True)
            h = jnp.dot(h, p["fc2_w"]) + p["fc2_b"]
        x = x + h.astype(x.dtype) if use_mlp else x
        return x.astype(in_dtype), None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x


def matmul_probe(m, k_, n, dtype, reps=16):
    """Achievable TF/s for an [m,k]x[k,n] chain (serial scan keeps the
    MXU busy on one dependent stream, amortizing tunnel dispatch).
    The down-projection w2 [n,k] feeds each product back to [m,k], so
    every output column is consumed (a pad+slice fold lets XLA narrow
    the dot and fake >peak rates). Reported rate counts BOTH dots."""
    a = jnp.zeros((m, k_), dtype)
    ws = jnp.zeros((reps, k_, n), dtype)
    w2 = jnp.zeros((n, k_), dtype)

    @jax.jit
    def chain(a, ws, w2):
        def body(c, w):
            return jnp.dot(jnp.dot(c, w), w2).astype(a.dtype), ()
        c, _ = jax.lax.scan(body, a, ws)
        return c

    t = timeit(chain, a, ws, w2, n=4)
    return 2 * 2 * m * k_ * n * reps / t / 1e12  # TF/s (up + down dot)


def attention_probe(B, S, H, Dh, dtype, impl):
    q = jnp.zeros((B, S, H, Dh), dtype)
    fn = jax.jit(functools.partial(mha_attention, impl=impl))
    t = timeit(fn, q, q, q)
    flops = 2 * 2 * B * H * S * S * Dh
    return t * 1e3, flops / t / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = config)")
    ap.add_argument("--fuse", action="store_true",
                    help="apply fuse_projections (the engine default)")
    ap.add_argument("--int8", action="store_true",
                    help="quantize the tower (quant.quantize_vision): "
                         "int8 x int8 MXU dots, 2x the bf16 peak")
    ap.add_argument("--grad", action="store_true",
                    help="also time tower fwd+bwd (training effect of "
                         "the vit kernel: auto vs dense dispatch; the "
                         "kernel's VJP recomputes through dense math, "
                         "so only the forward differs)")
    args = ap.parse_args()

    cfg = configs.siglip_so400m()
    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    dtype = jnp.bfloat16
    # bf16 params: the engine stores the vision tower in the compute
    # dtype (f32 params would PROMOTE every dot to f32 and poison the
    # whole decomposition)
    params = jax.tree.map(
        lambda x: x.astype(dtype),
        siglip.init(jax.random.PRNGKey(0), cfg))
    if args.int8:
        from streamvln_tpu.models.quant import quantize_vision
        params = quantize_vision(params)
    if args.fuse:
        # local concat (production fuse_projections deliberately does
        # NOT fuse the vision tower — this arm measures why)
        layers = dict(params["layers"])
        layers["qkv_w"] = jnp.concatenate(
            [layers.pop(n) for n in ("q_w", "k_w", "v_w")], axis=-1)
        layers["qkv_b"] = jnp.concatenate(
            [layers.pop(n) for n in ("q_b", "k_b", "v_b")], axis=-1)
        params = dict(params, layers=layers)
    B, N, D, FF = args.batch, cfg.num_patches, cfg.hidden_size, \
        cfg.intermediate_size
    H, Dh = cfg.num_heads, cfg.head_dim
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), dtype)

    per_tok_layer = 4 * 2 * D * D + 2 * 2 * D * FF + 2 * 2 * N * Dh * H
    tower_flops = B * N * cfg.num_layers * per_tok_layer

    results = {}

    def run(name, **kw):
        fn = jax.jit(functools.partial(mirror_forward, cfg=cfg, **kw))
        t = timeit(lambda p, e: fn(p, embeds=e), params, embeds)
        results[name] = round(t * 1e3, 2)
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 2),
                          "fps": round(B / t, 1)}), flush=True)
        return t

    # 1. real forward (the bench path) vs mirror sanity. The --fuse arm
    # rewrites the param tree into a qkv_w layout that only the mirror
    # understands (siglip.forward_embeddings would KeyError on q_w), so
    # the real-forward probe and the drift gate are mirror-only there.
    t_real = None
    if not args.fuse:
        real = jax.jit(functools.partial(
            siglip.forward_embeddings, cfg=cfg))
        t_real = timeit(lambda p, e: real(p, embeds=e), params, embeds)
        print(json.dumps({"probe": "real_forward_auto",
                          "ms": round(t_real * 1e3, 2),
                          "fps": round(B / t_real, 1),
                          "mfu_pct": round(100 * tower_flops / t_real
                                           / 1e12 / PEAK_BF16_TFLOPS,
                                           1)}),
              flush=True)

    if args.int8:
        # the mirror/ablation decomposition targets the float tower;
        # the int8 arm reports the real forward only
        return

    t_full = run("mirror_full_auto")
    if t_real is not None:
        drift = abs(t_full - t_real) / t_real
        trusted = drift < 0.05
        print(json.dumps({"probe": "mirror_drift_pct",
                          "value": round(100 * drift, 1),
                          "trusted": trusted}), flush=True)
        if not trusted:
            print("WARNING: mirror drifts >5% from the real forward — "
                  "the ablation numbers below do not decompose the "
                  "real tower; fix the mirror before quoting them",
                  file=sys.stderr)

    run("mirror_dense_attn", attn_impl="dense")
    t_noattn = run("mirror_no_attn", use_attn=False)
    t_noln = run("mirror_no_ln", use_ln=False)
    t_nogelu = run("mirror_no_gelu", use_gelu=False)
    t_nomlp = run("mirror_no_mlp", use_mlp=False)

    # 3. matmul floors at constituent shapes
    M = B * N
    for name, (m, k_, n) in {
        "probe_qkv_o_pair": (M, D, D),
        "probe_mlp_pair": (M, D, FF),
    }.items():
        tf = matmul_probe(m, k_, n, dtype)
        print(json.dumps({"probe": name, "shape": [m, k_, n],
                          "tf_s": round(tf, 1),
                          "mxu_pct": round(100 * tf / PEAK_BF16_TFLOPS,
                                           1)}), flush=True)

    for impl in ("vit", "dense"):
        ms, tf = attention_probe(B, N, H, Dh, dtype, impl)
        print(json.dumps({"probe": f"attn_{impl}", "ms": round(ms, 2),
                          "useful_tf_s": round(tf, 1)}), flush=True)

    if args.grad:
        for gb in (8, args.batch):
            ge = jax.random.normal(jax.random.PRNGKey(2), (gb, N, D),
                                   dtype)
            for impl in ("auto", "dense"):
                # remat=True is the training configuration (the full
                # tower's residuals OOM a 16 GB chip without it)
                fn = jax.jit(jax.grad(
                    lambda p, e, _i=impl: jnp.sum(
                        siglip.forward_embeddings(
                            p, cfg, e, attn_impl=_i,
                            remat=True).astype(jnp.float32) ** 2)))
                t = timeit(fn, params, ge, n=4)
                print(json.dumps({"probe": f"grad_{impl}_b{gb}",
                                  "ms": round(t * 1e3, 2)}), flush=True)

    # summary: marginal costs
    print(json.dumps({
        "summary_marginal_ms": {
            "attention": round((t_full - t_noattn) * 1e3, 2),
            "layernorms": round((t_full - t_noln) * 1e3, 2),
            "gelu": round((t_full - t_nogelu) * 1e3, 2),
            "mlp_matmuls": round((t_nogelu - t_nomlp) * 1e3, 2),
            "full": round(t_full * 1e3, 2),
        }}), flush=True)


if __name__ == "__main__":
    main()
