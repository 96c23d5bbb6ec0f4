"""Pallas flash attention (TPU). Placeholder until the kernel lands.

Replaces the reference's flash-attn 2 CUDA dependency
(reference: streamvln_eval.py:526, modeling_llama.py:51-53).
"""
from __future__ import annotations

from typing import Optional

import jax


def shapes_supported(q, k, v) -> bool:
    return False


def flash_attention(q, k, v, mask=None, scale: Optional[float] = None,
                    logits_soft_cap: Optional[float] = None):
    raise NotImplementedError("Pallas flash attention kernel not yet built")
