"""Evaluation entry point (streamvln_eval parity CLI).

Reference arg surface (reference: streamvln/streamvln_eval.py:489-534):
--model_path --habitat_config_path --eval_split --output_path
--num_future_steps --num_frames --num_history --model_max_length
--world_size/--rank plus distributed init. Env backend: habitat-sim when
importable (real benchmark), else the deterministic FakeNavEnv (CI /
smoke); metric aggregation is host-side.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np


def build_agent(model_path: Optional[str], model_size: str = "7b",
                num_frames: int = 32, num_future_steps: int = 4,
                num_history: int = 8, model_max_length: int = 4096,
                cache_capacity: int = 4096, max_new_tokens: int = 16,
                n_envs: int = 1, lora_adapters: Optional[str] = None,
                spec_lookup: int = 6, bits: int = 16,
                kv_int8: bool = False, vision_int8: bool = False):
    import jax
    import jax.numpy as jnp
    from streamvln_tpu import configs
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.data.tokenizer import load_tokenizer
    from streamvln_tpu.models import convert_hf, streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine
    from streamvln_tpu.train import build_config

    args = argparse.Namespace(
        model_size=model_size, spatial_pool_mode="bilinear",
        num_frames=num_frames, num_future_steps=num_future_steps,
        num_history=num_history)
    cfg = build_config(args)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
        else jnp.float32
    tok = load_tokenizer(model_path, model_max_length)
    has_ckpt = bool(model_path and os.path.isdir(model_path) and any(
        f.endswith((".safetensors", ".bin"))
        for f in os.listdir(model_path)))

    def build_params():
        if has_ckpt:
            params = convert_hf.load_streamvln_checkpoint(
                model_path, cfg, dtype)
        else:
            params = streamvln.init(jax.random.PRNGKey(0), cfg, dtype)
        if lora_adapters:
            # 'lora' model-builder dispatch: attach exported adapters
            # and fold them (reference: llava/model/builder.py:40-80)
            from streamvln_tpu.models import lora as lora_lib
            params = lora_lib.merge_lora(
                lora_lib.apply_adapters_npz(params, lora_adapters))
        if bits in (4, 8):
            # inference-time weight quantization (reference model
            # builder: llava/model/builder.py load_4bit/load_8bit).
            # int4 decode streams through the fused dequant-matmul
            # kernel (ops/int4_matmul.py) at 0.5 B/weight.
            from streamvln_tpu.models import quant
            params = quant.quantize_llm(params, bits=bits)
        if vision_int8:
            # int8 x int8 tower matmuls (compute-bound encoder ->
            # speed lever; beyond-reference: the reference serves its
            # tower bf16/f16 only)
            from streamvln_tpu.models import quant
            params = dict(params,
                          vision=quant.quantize_vision(params["vision"]))
        return params

    if (has_ckpt or lora_adapters or bits in (4, 8) or vision_int8) \
            and jax.default_backend() != "cpu":
        # Stage on the host CPU backend, place only the FINAL tree: a
        # real 7B checkpoint arrives bf16 (15.2 GB — never fits a
        # 16 GB chip pre-quantization), and both the LoRA fold and the
        # --bits quantization materialize full f32 layer stacks as
        # temporaries. Device-side staging RESOURCE_EXHAUSTs before
        # the engine even builds; the reference avoids the same trap
        # by quantizing during load (bitsandbytes load_4bit/load_8bit,
        # streamvln_train.py:1564-1600). Host RAM is the staging
        # budget (TPU-VM hosts carry >100 GB).
        host = jax.local_devices(backend="cpu")[0]
        with jax.default_device(host):
            params = build_params()
            # pre-fuse on the host too: the engine's own fuse would
            # otherwise hold fused + unfused projection stacks on the
            # chip at once (~4-5 GB transient at 7B/14B); here the
            # engine's fuse becomes a no-op
            from streamvln_tpu.models.fuse import fuse_projections
            params = fuse_projections(params)
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = build_params()
    stop = {tok.im_end_id}
    if hasattr(tok, "eos_id"):
        stop.add(tok.eos_id)
    engine = StreamingEngine(
        params, cfg, n_envs=n_envs, cache_capacity=cache_capacity,
        max_new_tokens=max_new_tokens, stop_ids=tuple(stop),
        compute_dtype=dtype, spec_lookup=spec_lookup, kv_int8=kv_int8)
    return VLNAgent(engine, tok, deterministic_conjunction=False)


def make_env(backend: str, split: str, num_episodes: int, seed: int,
             habitat_config_path: Optional[str]):
    if backend == "habitat":
        try:
            from streamvln_tpu.eval.habitat_backend import make_habitat_env
            return make_habitat_env(habitat_config_path, split)
        except ImportError as e:
            raise SystemExit(
                f"habitat backend requested but unavailable: {e}; "
                f"use --env_backend fake for simulator-free runs")
    from streamvln_tpu.eval.fake_env import FakeNavEnv, make_episodes
    return FakeNavEnv(make_episodes(num_episodes, seed=seed))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--model_size", type=str, default="7b")
    p.add_argument("--lora_adapters", type=str, default=None,
                   help="lora_adapters.npz from train.py --lora_enable "
                        "--export_hf; merged into the base weights")
    p.add_argument("--habitat_config_path", type=str,
                   default="config/vln_r2r.yaml")
    p.add_argument("--eval_split", type=str, default="val_unseen")
    p.add_argument("--output_path", type=str,
                   default="./results/val_unseen/streamvln")
    p.add_argument("--num_future_steps", type=int, default=4)
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--num_history", type=int, default=8)
    p.add_argument("--model_max_length", type=int, default=4096)
    p.add_argument("--env_backend", choices=["habitat", "fake"],
                   default="fake")
    p.add_argument("--num_episodes", type=int, default=8,
                   help="fake backend episode count")
    p.add_argument("--max_steps_per_episode", type=int, default=None)
    p.add_argument("--save_video", action="store_true", default=False)
    p.add_argument("--n_envs", type=int, default=1,
                   help=">1: batched multi-env eval (one model, N "
                        "parallel simulators per process)")
    p.add_argument("--env_workers", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="host each env slot in its own worker process "
                        "so all N simulators step concurrently while "
                        "the chip decodes (default for --n_envs > 1; "
                        "--no-env_workers steps them in-process)")
    p.add_argument("--rank", type=int,
                   default=int(os.environ.get("RANK", 0)))
    p.add_argument("--world_size", type=int,
                   default=int(os.environ.get("WORLD_SIZE", 1)))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bits", type=int, default=16, choices=[4, 8, 16],
                   help="inference weight quantization (reference "
                        "builder load_4bit/load_8bit); 4 uses the "
                        "fused int4 dequant-matmul kernel at decode")
    p.add_argument("--kv_int8", action="store_true", default=False,
                   help="int8 KV cache values + per-token scales: half "
                        "the resident cache HBM (capacity lever for "
                        "long contexts / 14B-class at batch)")
    p.add_argument("--vision_int8", action="store_true", default=False,
                   help="int8 x int8 SigLIP tower matmuls (per-token "
                        "dynamic activation quant; the encoder is "
                        "compute-bound so int8 is a speed lever)")
    p.add_argument("--spec_lookup", type=int, default=6,
                   help="prompt-lookup speculative decode: verify this "
                        "many drafted tokens per decode forward "
                        "(greedy-exact; 0 disables)")
    args = p.parse_args(argv)

    from streamvln_tpu.eval.evaluator import VLNEvaluator

    agent = build_agent(
        args.model_path, args.model_size, args.num_frames,
        args.num_future_steps, args.num_history, args.model_max_length,
        n_envs=args.n_envs, lora_adapters=args.lora_adapters,
        spec_lookup=args.spec_lookup, bits=args.bits,
        kv_int8=args.kv_int8, vision_int8=args.vision_int8)

    if args.n_envs > 1:
        import functools

        from streamvln_tpu.eval.batched_evaluator import (
            BatchedVLNEvaluator)
        env = make_env(args.env_backend, args.eval_split,
                       args.num_episodes, args.seed,
                       args.habitat_config_path)
        episodes = list(env.episodes)[args.rank::args.world_size]
        if hasattr(env, "close"):
            env.close()

        factory = functools.partial(
            make_env, args.env_backend, args.eval_split,
            args.num_episodes, args.seed, args.habitat_config_path)
        if args.env_workers:
            # default deployed topology: each simulator in its own
            # process, async-stepped while the chip decodes
            # (eval/env_workers.py; SURVEY §7 hard part 5). Frames are
            # resized worker-side (PIL-exact) so pipes and the
            # host->device link carry compact uploads — the reference
            # resizes host-side too (SigLipImageProcessor).
            from streamvln_tpu.eval.env_workers import (
                remote_env_factory, resize_rgb_transform)
            factory = remote_env_factory(
                factory,
                obs_transform=resize_rgb_transform(
                    agent.cfg.vision.image_size))
        ev = BatchedVLNEvaluator(
            factory, agent, args.output_path,
            max_steps_per_episode=args.max_steps_per_episode)
        try:
            results = ev.run(episodes)
        finally:
            ev.close()
        n = max(len(results), 1)
        final = {
            "sucs_all": sum(r["success"] for r in results) / n,
            "spls_all": sum(r["spl"] for r in results) / n,
            "oss_all": sum(r["os"] for r in results) / n,
            "ones_all": sum(r["ne"] for r in results) / n,
            "length": len(results),
        }
        if results and all("ndtw" in r for r in results):
            final["ndtw_all"] = sum(r["ndtw"] for r in results) / n
        print(json.dumps(final))
        return final

    env = make_env(args.env_backend, args.eval_split, args.num_episodes,
                   args.seed, args.habitat_config_path)
    ev = VLNEvaluator(env, agent, args.output_path, rank=args.rank,
                      world_size=args.world_size,
                      save_video=args.save_video,
                      max_steps_per_episode=args.max_steps_per_episode)
    partial = ev.eval_action()
    final = ev.aggregate([partial])
    print(json.dumps(final))
    return final


if __name__ == "__main__":
    main()
