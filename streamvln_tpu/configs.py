"""Model / runtime configuration dataclasses and presets.

Shapes follow the reference stack: SigLIP-so400m-patch14-384
(reference: llava/model/multimodal_encoder/siglip_encoder.py:70-101) and
Qwen2-7B (HF `Qwen/Qwen2-7B-Instruct` config, used via
lmms-lab/LLaVA-Video-7B-Qwen2; reference: scripts/streamvln_train_slurm.sh:15,25).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    """SigLIP vision tower config.

    The reference drops the final encoder layer and the pooling head
    (siglip_encoder.py:570-571) and takes the pre-post-layernorm hidden state
    of the remaining stack (siglip_encoder.py:586) — so `num_layers` here is
    the number of layers actually run (26 for so400m-27L).
    """
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 26          # 27 in the checkpoint, last one dropped
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    # gelu_pytorch_tanh in the reference; we use jax.nn.gelu(approximate=True)

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size  # 27

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2  # 729

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads  # 72


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    """Qwen2 decoder config (RMSNorm + RoPE + GQA + SwiGLU)."""
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attn_logits_soft_cap: Optional[float] = None
    # qkv projections carry bias in Qwen2; o/gate/up/down do not.
    qkv_bias: bool = True
    # int8 x int8 MXU matmuls with per-token dynamic activation quant
    # (models/quant.py::int8_dynamic_matmul); only meaningful when the
    # weights are int8-quantized, and only wins on compute-bound
    # shapes (prefill) — decode at bs=1 stays bandwidth-bound.
    act_int8: bool = False
    # family knobs (Llama/Mistral: defaults; Gemma: gelu MLP,
    # (1 + w) RMSNorm parameterization, sqrt(hidden) embed scaling;
    # MPT: alibi positions, weight-only LayerNorm, ungated gelu MLP)
    mlp_act: str = "silu"            # "silu" | "gelu_tanh" | "gelu"
    norm_offset: bool = False
    scale_embeddings: bool = False
    positional: str = "rope"         # "rope" | "alibi"
    norm_type: str = "rmsnorm"       # "rmsnorm" | "layernorm"
    mlp_gated: bool = True           # False: up -> act -> down (MPT)
    # sparse MoE MLP (Mixtral / Qwen2-MoE wrapper families); 0 = dense
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True      # Mixtral yes; Qwen2-MoE no
    # Qwen2-MoE only: always-on shared expert, sigmoid-gated
    shared_expert_intermediate_size: Optional[int] = None
    # "dense": every expert runs on every token, one-hot combine
    # (exact, E/k extra FLOPs — fine for small E). "capacity":
    # matmul-based dispatch into [E, C] buckets, C =
    # ceil(N*k/E * moe_capacity_factor); overflow tokens drop that
    # expert's contribution (standard TPU MoE; needed when E >> k,
    # e.g. Qwen2-MoE's 60 experts where dense is 15x FLOPs).
    # CAVEAT: drops depend on the per-call token count N, so capacity
    # mode is NOT bit-identical between prefill and incremental
    # decode — keep "dense" where the streaming-parity invariant
    # (CLAUDE.md) must hold.
    moe_dispatch: str = "dense"
    moe_capacity_factor: float = 1.25


@dataclasses.dataclass(frozen=True)
class StreamVLNConfig:
    """Full multimodal stack + streaming parameters."""
    vision: SigLIPConfig = dataclasses.field(default_factory=SigLIPConfig)
    llm: Qwen2Config = dataclasses.field(default_factory=Qwen2Config)
    # mm projector: mlp2x_gelu 1152 -> 3584 (reference:
    # llava/model/multimodal_projector/builder.py:32-65, mm_projector_type).
    projector_type: str = "mlp2x_gelu"
    # 2x2 spatial pooling mode for frame tokens, 729 -> 196
    # (reference: stream_video_vln.py:53-73, mm_spatial_pool_mode).
    spatial_pool_mode: str = "bilinear"
    spatial_pool_stride: int = 2
    # streaming window parameters (reference defaults:
    # streamvln_eval.py:497-500).
    num_frames: int = 32          # sliding window length in env steps
    num_future_steps: int = 4     # actions emitted per model call
    num_history: int = 8          # pooled history frames in slow memory

    @property
    def tokens_per_frame(self) -> int:
        side = -(-self.vision.patches_per_side // self.spatial_pool_stride)
        return side * side  # ceil(27/2)^2 = 196

    @property
    def memory_tokens(self) -> int:
        return self.num_history * self.tokens_per_frame  # 1568


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

def qwen2_7b() -> Qwen2Config:
    return Qwen2Config()


def qwen2_14b() -> Qwen2Config:
    """Qwen2.5-14B-class decoder. The int4 capacity target: ~7.4 GB
    packed weights + scales fit the 16 GB v5e chip with KV + vision,
    which int8 (14.8 GB weights alone) cannot — the fused int4 kernel
    (ops/int4_matmul.py) is what makes this class servable at decent
    decode speed on one chip. All projection dims are 512-multiples, so
    every matmul is kernel-eligible."""
    return Qwen2Config(
        vocab_size=152064, hidden_size=5120, intermediate_size=13824,
        num_layers=48, num_heads=40, num_kv_heads=8, head_dim=128)


def qwen2_1_5b() -> Qwen2Config:
    return Qwen2Config(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        tie_word_embeddings=True)


def qwen2_0_5b() -> Qwen2Config:
    return Qwen2Config(
        vocab_size=151936, hidden_size=896, intermediate_size=4864,
        num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
        tie_word_embeddings=True)


def llama2_7b() -> Qwen2Config:
    """Llama-2-7B (reference LLM-wrapper family:
    llava/model/language_model/llava_llama.py)."""
    return Qwen2Config(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=4096, qkv_bias=False)


def llama3_8b() -> Qwen2Config:
    return Qwen2Config(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, rms_norm_eps=1e-5,
        max_position_embeddings=8192, qkv_bias=False)


def mistral_7b() -> Qwen2Config:
    """Mistral-7B-v0.1 (llava_mistral.py family)."""
    return Qwen2Config(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=32768, qkv_bias=False)


def gemma_2b() -> Qwen2Config:
    """Gemma-2B (llava_gemma.py family): gelu MLP, (1+w) RMSNorm,
    sqrt(hidden) embedding scale, tied head."""
    return Qwen2Config(
        vocab_size=256000, hidden_size=2048, intermediate_size=16384,
        num_layers=18, num_heads=8, num_kv_heads=1, head_dim=256,
        rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=8192, qkv_bias=False,
        tie_word_embeddings=True, mlp_act="gelu_tanh",
        norm_offset=True, scale_embeddings=True)


def mpt_7b() -> Qwen2Config:
    """MPT-7B (llava_mpt.py family): alibi attention, weight-only
    LayerNorm, ungated gelu MLP, tied head."""
    return Qwen2Config(
        vocab_size=50432, hidden_size=4096, intermediate_size=16384,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rms_norm_eps=1e-5, max_position_embeddings=2048,
        qkv_bias=False, tie_word_embeddings=True, mlp_act="gelu",
        positional="alibi", norm_type="layernorm", mlp_gated=False)


def mixtral_8x7b() -> Qwen2Config:
    """Mixtral-8x7B (llava_mixtral.py family): 8 experts, top-2."""
    return Qwen2Config(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1e6, rms_norm_eps=1e-5,
        max_position_embeddings=32768, qkv_bias=False,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=True)


def qwen2_moe_a2_7b() -> Qwen2Config:
    """Qwen1.5-MoE-A2.7B-style (llava_qwen_moe.py family): 60 experts
    top-4 plus a sigmoid-gated shared expert."""
    return Qwen2Config(
        vocab_size=151936, hidden_size=2048, intermediate_size=5632,
        num_layers=24, num_heads=16, num_kv_heads=16, head_dim=128,
        rope_theta=1e6, rms_norm_eps=1e-6,
        max_position_embeddings=8192, qkv_bias=True,
        num_experts=60, num_experts_per_tok=4, norm_topk_prob=False,
        moe_intermediate_size=1408,
        shared_expert_intermediate_size=5632)


LLM_REGISTRY = {
    "qwen2-7b": qwen2_7b, "qwen2-14b": qwen2_14b,
    "qwen2-1.5b": qwen2_1_5b,
    "qwen2-0.5b": qwen2_0_5b, "llama2-7b": llama2_7b,
    "llama3-8b": llama3_8b, "mistral-7b": mistral_7b,
    "gemma-2b": gemma_2b, "mixtral-8x7b": mixtral_8x7b,
    "qwen2-moe-a2.7b": qwen2_moe_a2_7b, "mpt-7b": mpt_7b,
}


def llm_config(name: str) -> Qwen2Config:
    """Family dispatch (reference: llava/model/language_model/* — one
    wrapper class per HF family; here one parameterized decoder)."""
    if name not in LLM_REGISTRY:
        raise ValueError(
            f"unknown LLM {name!r}; known: {sorted(LLM_REGISTRY)}")
    return LLM_REGISTRY[name]()


def siglip_so400m() -> SigLIPConfig:
    return SigLIPConfig()


def streamvln_7b() -> StreamVLNConfig:
    return StreamVLNConfig(vision=siglip_so400m(), llm=qwen2_7b())


def tiny_vision(image_size: int = 56, patch_size: int = 14) -> SigLIPConfig:
    """Small vision tower for tests: 4x4 = 16 patches."""
    return SigLIPConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        image_size=image_size, patch_size=patch_size)


def tiny_llm(vocab_size: int = 512) -> Qwen2Config:
    return Qwen2Config(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, max_position_embeddings=2048)


def tiny_streamvln(vocab_size: int = 512) -> StreamVLNConfig:
    """End-to-end tiny stack: 16 patches -> 2x2 pool -> 4 tokens/frame."""
    return StreamVLNConfig(
        vision=tiny_vision(), llm=tiny_llm(vocab_size),
        num_frames=8, num_future_steps=2, num_history=2)


DTYPE_MAP = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "fp32": jnp.float32,
    "bf16": jnp.bfloat16,
}
