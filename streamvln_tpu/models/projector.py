"""Multimodal projector (vision hidden -> LLM hidden).

Parity: `mlp2x_gelu` used by StreamVLN (1152 -> 3584 two-layer GELU MLP);
'linear' and deeper mlpNx variants also supported
(reference: llava/model/multimodal_projector/builder.py:32-65).
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp

Params = dict


def parse_type(projector_type: str) -> int:
    """Return mlp depth (1 == linear)."""
    if projector_type == "linear":
        return 1
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return int(m.group(1))
    raise ValueError(f"unsupported projector type: {projector_type}")


def init(rng: jax.Array, projector_type: str, in_dim: int, out_dim: int,
         dtype=jnp.float32) -> Params:
    depth = parse_type(projector_type)
    keys = jax.random.split(rng, depth)
    layers = []
    d = in_dim
    for i in range(depth):
        w = (jax.random.normal(keys[i], (d, out_dim), jnp.float32)
             * (d ** -0.5)).astype(dtype)
        b = jnp.zeros((out_dim,), dtype)
        layers.append({"w": w, "b": b})
        d = out_dim
    return {"layers": layers}


def forward(params: Params, x: jax.Array) -> jax.Array:
    """x: [..., in_dim] -> [..., out_dim]. GELU between layers (exact erf
    gelu, matching torch nn.GELU default used by the reference builder)."""
    layers = params["layers"]
    for i, p in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = (jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
             + p["b"].astype(jnp.float32)).astype(x.dtype)
    return x
