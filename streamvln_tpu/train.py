"""Training entry point: stage-1 VLN SFT / stage-2 co-training.

CLI parity with the reference trainer surface (reference:
streamvln/streamvln_train.py:1549-1878 + streamvln/args.py): model config
overrides (num_frames/num_history/num_future_steps, pool mode), tunable-
part freezing, dataset assembly (VLN + optional co-training mixture),
task-grouped batching, per-module LRs, checkpoint resume, HF export.

TPU runtime: jax.distributed multi-host init, ('dp','fsdp','tp') mesh,
pjit FSDP train step, Orbax async checkpoints.

Usage:
  python -m streamvln_tpu.train --video_folders data/traj1,data/traj2 \
      --output_dir runs/stage1 --num_steps 1000 --batch_size 8
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import List, Optional

import numpy as np

from streamvln_tpu import configs
from streamvln_tpu.data.collate import (
    CombineDataset, TaskGroupedBatchSampler, collate)
from streamvln_tpu.data.tokenizer import load_tokenizer
from streamvln_tpu.data.vln_dataset import VLNActionDataset


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--model_path", type=str, default=None,
                   help="HF checkpoint dir to load (else random init)")
    p.add_argument("--model_size", type=str, default="7b",
                   help="7b/1.5b/0.5b/tiny or any configs.LLM_REGISTRY "
                        "family name (llama2-7b, mistral-7b, "
                        "mixtral-8x7b, mpt-7b, ...)")
    p.add_argument("--spatial_pool_mode", type=str, default="bilinear")
    # streaming/data params (reference defaults)
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--num_future_steps", type=int, default=4)
    p.add_argument("--num_history", type=int, default=8)
    p.add_argument("--video_folders", type=str, required=True,
                   help="comma-separated trajectory folders")
    p.add_argument("--cotrain_yaml", type=str, default=None,
                   help="stage-2 co-training mixture yaml "
                        "(QA/SCANQA/MMC4 groups)")
    p.add_argument("--media_root_qa", type=str, default="")
    p.add_argument("--media_root_scanqa", type=str, default="")
    p.add_argument("--media_root_mmc4", type=str, default="")
    p.add_argument("--remove_init_turns", action="store_true")
    p.add_argument("--data_augmentation", action="store_true")
    p.add_argument("--model_max_length", type=int, default=32768)
    p.add_argument("--group_by_task", action="store_true", default=True)
    # optimization (reference: streamvln_train_slurm.sh:55-68)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--mm_vision_tower_lr", type=float, default=5e-6)
    p.add_argument("--mm_projector_lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8,
                   help="global batch size")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--freeze_vision", action="store_true")
    p.add_argument("--freeze_projector", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    # long-context memory knobs (reference trains at model_max_length
    # 32768, scripts/streamvln_train_slurm.sh:68; the 7B@32k v5e-1
    # recipe is remat_chunk 7 + mlp_chunk 2048 + loss_chunk 1024)
    p.add_argument("--remat_chunk", type=int, default=None,
                   help="layers per nested-remat chunk (must divide "
                   "num_layers); saves residual-stream boundaries")
    p.add_argument("--mlp_chunk", type=int, default=None,
                   help="token-chunked MLP remat (bounds [S,F] temps)")
    p.add_argument("--loss_chunk", type=int, default=512,
                   help="sequence-chunked cross-entropy block")
    # LoRA / k-bit (reference: streamvln_train.py:1564-1632 —
    # --lora_enable + bitsandbytes --bits path)
    p.add_argument("--lora_enable", action="store_true",
                   help="train only LoRA adapters on the LLM")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    p.add_argument("--bits", type=int, default=16, choices=[4, 8, 16],
                   help="8/4: int8 (per-channel) / int4 (group-wise) "
                        "weight-only quantize of the LLM after load "
                        "(models/quant.py; reference: bitsandbytes "
                        "--bits 4/8, streamvln_train.py:1564-1600)")
    p.add_argument("--act_int8", action="store_true",
                   help="int8 x int8 MXU matmuls with per-token "
                        "activation quant (requires --bits 8; STE "
                        "gradients). QAT knob — measured ~12% SLOWER "
                        "for training on v5e (backward runs "
                        "dequantized and remat doubles the quant "
                        "ops); the throughput win is inference "
                        "prefill (-27%)")
    # mesh
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    # io
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--log_steps", type=int, default=10)
    # mid-training eval (reference: llava_trainer_eval.py:8-50 runs
    # lmms_eval mid-training; here: in-process held-out episode eval)
    p.add_argument("--eval_steps", type=int, default=0,
                   help="evaluate every N steps (0 = off)")
    p.add_argument("--eval_episodes", type=int, default=4)
    p.add_argument("--export_hf", action="store_true",
                   help="also write an HF-format safetensors export")
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="batches prepared ahead by the background "
                        "loader thread (0 = synchronous; reference "
                        "overlaps via 8 DataLoader workers/rank, "
                        "llava_trainer.py:304-356)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report_to", choices=("none", "wandb"),
                   default="none",
                   help="mirror train metrics to wandb (reference: "
                   "--report_to wandb)")
    p.add_argument("--run_name", default="streamvln_tpu")
    return p


def build_config(args) -> configs.StreamVLNConfig:
    short = {"7b": configs.qwen2_7b, "1.5b": configs.qwen2_1_5b,
             "0.5b": configs.qwen2_0_5b, "tiny": configs.tiny_llm}
    if args.model_size in short:
        llm = short[args.model_size]()
    else:
        # any LLM family from the registry (llama/mistral/gemma/
        # mixtral/mpt/... — reference model-builder dispatch,
        # llava/model/builder.py:27-305)
        llm = configs.llm_config(args.model_size)
    vision = (configs.tiny_vision() if args.model_size == "tiny"
              else configs.siglip_so400m())
    return configs.StreamVLNConfig(
        vision=vision, llm=llm,
        spatial_pool_mode=args.spatial_pool_mode,
        num_frames=args.num_frames,
        num_future_steps=args.num_future_steps,
        num_history=args.num_history)


def build_transform(enabled: bool, seed: int = 0):
    """Data augmentation parity (reference: streamvln_train.py:1803-1811
    uses torchvision v2 ColorJitter/Posterize/Sharpness/Autocontrast);
    PIL-based host-side equivalents."""
    if not enabled:
        return None
    from PIL import ImageEnhance, ImageOps
    rng = np.random.default_rng(seed)

    def transform(img):
        if rng.random() < 0.8:
            img = ImageEnhance.Brightness(img).enhance(
                1 + rng.uniform(-0.3, 0.3))
            img = ImageEnhance.Contrast(img).enhance(
                1 + rng.uniform(-0.3, 0.3))
            img = ImageEnhance.Color(img).enhance(
                1 + rng.uniform(-0.3, 0.3))
        if rng.random() < 0.2:
            img = ImageOps.posterize(img, int(rng.integers(4, 8)))
        if rng.random() < 0.3:
            img = ImageEnhance.Sharpness(img).enhance(
                1 + rng.uniform(-0.5, 0.5))
        if rng.random() < 0.3:
            img = ImageOps.autocontrast(img)
        return img

    return transform


def main(argv: Optional[List[str]] = None):
    args = build_argparser().parse_args(argv)

    # multi-host init (replaces torchrun/NCCL env:// rendezvous;
    # reference: streamvln/utils/dist.py:48-89)
    import jax
    if "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    proc0 = jax.process_index() == 0

    # persistent compilation cache: the train step compiles twice (the
    # donated state comes back with loop-internal layouts, so the
    # second call has a new jit signature) — both land in the cache,
    # so restarts skip straight to steady state
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from streamvln_tpu.models import convert_hf, streamvln
    from streamvln_tpu.parallel import mesh as mesh_lib
    from streamvln_tpu.parallel import train as train_lib
    from streamvln_tpu.utils import checkpoint as ckpt

    cfg = build_config(args)
    tcfg = train_lib.TrainConfig(
        learning_rate=args.learning_rate,
        vision_lr=args.mm_vision_tower_lr,
        projector_lr=args.mm_projector_lr,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.num_steps,
        freeze_vision=args.freeze_vision,
        freeze_projector=args.freeze_projector,
        grad_accum_steps=args.grad_accum_steps,
        remat=not args.no_remat,
        remat_chunk=args.remat_chunk,
        mlp_chunk=args.mlp_chunk,
        loss_chunk_size=args.loss_chunk,
        lora_only=args.lora_enable)

    tok = load_tokenizer(args.model_path, args.model_max_length)
    transform = build_transform(args.data_augmentation, args.seed)
    from streamvln_tpu.data.collate import RobustDataset
    datasets = [RobustDataset(VLNActionDataset(
        tok, cfg, args.video_folders.split(","), transform=transform,
        remove_init_turns=args.remove_init_turns, seed=args.seed))]
    if args.cotrain_yaml:
        from streamvln_tpu.data.cotrain_datasets import (
            build_cotraining_datasets)
        datasets += build_cotraining_datasets(
            tok, cfg, args.cotrain_yaml,
            media_roots={"qa": args.media_root_qa,
                         "scanqa": args.media_root_scanqa,
                         "mmc4": args.media_root_mmc4},
            seed=args.seed)
    dataset = CombineDataset(datasets)
    sampler = TaskGroupedBatchSampler(dataset.task_ids, args.batch_size,
                                      seed=args.seed)

    mesh = mesh_lib.make_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
        else jnp.float32
    if args.bits in (4, 8) and not args.lora_enable:
        # int leaves carry float0 grads; only the LoRA path's
        # set_to_zero branch tolerates them (reference's k-bit
        # load likewise requires PEFT adapters,
        # streamvln_train.py:1564-1632)
        raise SystemExit(f"--bits {args.bits} requires --lora_enable")
    if args.act_int8 and args.bits != 8:
        raise SystemExit("--act_int8 requires --bits 8 (group-wise "
                         "int4 scales cannot ride the int32 output)")
    if args.act_int8:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, act_int8=True))

    def build_params():
        if args.model_path:
            params = convert_hf.load_streamvln_checkpoint(
                args.model_path, cfg, dtype)
        else:
            params = streamvln.init(jax.random.PRNGKey(args.seed), cfg,
                                    dtype)
        if args.bits in (4, 8):
            from streamvln_tpu.models import quant
            params = quant.quantize_llm(params, bits=args.bits)
        if args.lora_enable:
            from streamvln_tpu.models import lora as lora_lib
            params = lora_lib.add_lora(params, jax.random.PRNGKey(
                args.seed + 1), cfg.llm, rank=args.lora_r,
                alpha=args.lora_alpha)
        return params

    if (args.model_path or args.bits in (4, 8)) \
            and jax.default_backend() != "cpu":
        # Stage on the host: a real 7B checkpoint arrives bf16
        # (15.2 GB) and quantize_llm materializes full f32 layer
        # stacks — neither fits a 16 GB chip pre-quantization.
        # shard_params places only the final (packed + LoRA) tree over
        # the mesh. Same posture as eval_cli.build_agent and the
        # reference's quantize-during-load (bitsandbytes).
        host = jax.local_devices(backend="cpu")[0]
        with jax.default_device(host):
            params = build_params()
    else:
        params = build_params()
    params = mesh_lib.shard_params(params, mesh)
    state = train_lib.create_train_state(params, tcfg)
    state, start_step = ckpt.resume_latest(
        os.path.join(args.output_dir, "ckpt"), state)
    step_fn = train_lib.make_train_step(cfg, tcfg, mesh)

    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "train_log.jsonl")
    # wandb mirror of the JSONL log when --report_to wandb (reference:
    # streamvln_train_slurm.sh:74 `--report_to wandb`); missing/failed
    # wandb degrades to JSONL-only.
    from streamvln_tpu.utils.observability import MetricsLogger
    mlog = MetricsLogger(args.output_dir,
                         rank=0 if proc0 else 1,
                         use_wandb=(args.report_to == "wandb"),
                         run_name=args.run_name)
    evaluator = None
    if args.eval_steps > 0:
        if jax.process_count() > 1:
            # sharded params span hosts; an in-process eval would need a
            # cross-host gather — skip rather than crash (the reference
            # hook also runs as a separate launched job,
            # llava_trainer_eval.py:17-34)
            if proc0:
                print("eval_steps: skipped on multi-host runs")
        else:
            from streamvln_tpu.eval.hook import MidTrainingEvaluator
            evaluator = MidTrainingEvaluator(
                cfg, tok, n_episodes=args.eval_episodes,
                seed=args.seed)
    # background prefetch: load+collate+upload the next batches while
    # the device runs the current step (reference overlaps via
    # DataLoader workers; llava_trainer.py:304-356)
    from jax.sharding import NamedSharding
    from streamvln_tpu.data.prefetch import BatchPrefetcher
    bspec = NamedSharding(mesh, mesh_lib.batch_spec())

    def make_batch(batch_idx):
        samples = [dataset[i] for i in batch_idx]
        batch = collate(samples, cfg, max_length=args.model_max_length)
        batch = {k: v for k, v in batch.items()
                 if k not in ("time_ids", "task_type")}
        # upload from the worker thread so H2D overlaps compute; the
        # step's own device_put then no-ops on already-placed arrays
        return {k: jax.device_put(v, bspec) for k, v in batch.items()}

    prefetcher = BatchPrefetcher(sampler, make_batch,
                                 depth=args.prefetch_depth)
    step = start_step
    t_last = time.perf_counter()
    try:
        while step < args.num_steps:
            batch = prefetcher.get()
            state, metrics = step_fn(state, batch)
            step += 1
            if proc0 and step % args.log_steps == 0:
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                rec = {"step": step,
                       "loss": float(metrics["loss"]),
                       "grad_norm": float(metrics["grad_norm"]),
                       "steps_per_sec": args.log_steps / dt}
                print(json.dumps(rec), flush=True)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                mlog.log(rec, step=step)
            if evaluator is not None and step % args.eval_steps == 0:
                metrics_ev = evaluator.evaluate(
                    jax.device_get(state.params), step)
                if proc0:
                    rec = {"step": step, **metrics_ev}
                    print(json.dumps(rec), flush=True)
                    with open(log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                    mlog.log(rec, step=step)
            if step % args.save_steps == 0:
                ckpt.save_checkpoint(
                    os.path.join(args.output_dir, "ckpt"), state, step)
    finally:
        prefetcher.close()
        mlog.close()

    ckpt.save_checkpoint(os.path.join(args.output_dir, "ckpt"), state,
                         step, wait=True)
    if proc0 and args.export_hf:
        export_params = jax.device_get(state.params)
        if args.lora_enable:
            # adapter-only artifact + merged full export (reference
            # split save: streamvln_train.py:1860-1870)
            from streamvln_tpu.models import lora as lora_lib
            if args.bits == 8:
                # merge into DEQUANTIZED weights: folding the delta
                # into int8 and requantizing rounds away adapter
                # deltas smaller than half the quant step
                from streamvln_tpu.models import quant
                export_params = quant.dequantize_llm(export_params)
            _, adapters = lora_lib.split_lora(export_params)
            flat = {k: np.asarray(v)
                    for k, v in adapters["layers"].items()}
            flat["lora_scale"] = np.asarray(adapters["lora_scale"])
            np.savez(os.path.join(args.output_dir,
                                  "lora_adapters.npz"), **flat)
            export_params = lora_lib.merge_lora(export_params)
        ckpt.save_hf(export_params, cfg,
                     os.path.join(args.output_dir, "hf_export"))
    if proc0:
        print(json.dumps({"final_step": step, "done": True}))
    return state


if __name__ == "__main__":
    main()
