"""Device mesh construction + parameter sharding rules.

Replaces the reference's NCCL/DeepSpeed distribution stack
(reference: streamvln/utils/dist.py, scripts/zero{2,3}.json) with XLA SPMD
over a `jax.sharding.Mesh`:

- axis 'dp'   — pure data parallelism (across slices / DCN if present)
- axis 'fsdp' — ZeRO-3-style parameter+optimizer sharding; also a data
  axis for the batch (the standard JAX FSDP recipe: batch over
  ('dp','fsdp'), params over 'fsdp', XLA inserts all-gathers over ICI)
- axis 'tp'   — tensor parallelism for the 7B LLM when per-chip HBM
  requires it (the reference has no TP; SURVEY §2.5.8 reserves the axis)

Sharding specs are assigned per parameter-path by rule, with a fallback
that never shards an axis whose size does not divide the mesh axis.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, fsdp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('dp','fsdp','tp') mesh. fsdp=None uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None:
        assert n % (dp * tp) == 0, (n, dp, tp)
        fsdp = n // (dp * tp)
    need = dp * fsdp * tp
    assert need <= n, (dp, fsdp, tp, n)
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


# (path regex, spec) — first match wins. Layer stacks carry a leading [L]
# axis that is never sharded (it is scanned over).
_RULES: Tuple[Tuple[str, P], ...] = (
    # LLM layer stacks (same rules cover int8/int4-packed storage —
    # quantization keeps the names and the [L, din(/2), dout] axis
    # order; fused qkv_w/gu_w come from models/fuse.py)
    (r"llm/layers/(q_w|k_w|v_w|gate_w|up_w|qkv_w|gu_w)$",
     P(None, "fsdp", "tp")),
    (r"llm/layers/(o_w|down_w)$", P(None, "tp", "fsdp")),
    (r"llm/layers/(q_b|k_b|v_b|qkv_b)$", P(None, "tp")),
    # quantization scales follow their weight's OUTPUT-dim sharding
    # (int8: [L, 1, dout]; int4 group scales: [L, G, dout])
    (r"llm/layers/(q_w|k_w|v_w|gate_w|up_w|qkv_w|gu_w)_scale$",
     P(None, None, "tp")),
    (r"llm/layers/(o_w|down_w)_scale$", P(None, None, "fsdp")),
    # MoE: experts ride the tp axis (expert parallelism — each chip
    # group holds E/tp experts), matmul dims ride fsdp
    (r"llm/layers/(e_gate|e_up)$", P(None, "tp", "fsdp", None)),
    (r"llm/layers/e_down$", P(None, "tp", None, "fsdp")),
    (r"llm/layers/router_w$", P(None, "fsdp", None)),
    (r"llm/layers/(s_gate_w|s_up_w)$", P(None, "fsdp", "tp")),
    (r"llm/layers/s_down_w$", P(None, "tp", "fsdp")),
    (r"llm/layers/s_route_w$", P(None, "fsdp", None)),
    (r"llm/layers/", P(None, None)),          # norms
    (r"llm/embed$", P("fsdp", "tp")),
    (r"llm/embed_scale$", P("fsdp", None)),
    (r"llm/lm_head$", P("fsdp", "tp")),
    (r"llm/lm_head_scale$", P(None, "tp")),
    (r"llm/final_norm$", P()),
    # vision tower
    (r"vision/layers/(q_w|k_w|v_w|fc1_w)$", P(None, None, "fsdp")),
    (r"vision/layers/(o_w|fc2_w)$", P(None, "fsdp", None)),
    (r"vision/layers/", P(None, None)),
    (r"vision/(patch_w|pos_embed)$", P(None, "fsdp")),
    (r"vision/patch_b$", P()),
    # projector
    (r"projector/.*w$", P(None, "fsdp")),
    (r"projector/", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharding on axes that don't divide the mesh axis size."""
    out = []
    for i, axis in enumerate(tuple(spec) + (None,) * (len(shape) -
                                                      len(tuple(spec)))):
        if axis is None:
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        total = int(np.prod([mesh.shape[a] for a in axes]))
        if shape[i] % total == 0 and total > 1:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpec matching `params` (or a shape pytree)."""
    def one(path, leaf):
        s = _path_str(path)
        shape = getattr(leaf, "shape", None)
        for pat, spec in _RULES:
            if re.search(pat, s):
                return _fit_spec(spec, shape, mesh)
        return P()
    return jax.tree_util.tree_map_with_path(one, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        param_specs(params, mesh),
                        is_leaf=lambda x: isinstance(x, P))


def batch_spec() -> P:
    """Batch dims shard over the combined data axes."""
    return P(("dp", "fsdp"))


def shard_params(params, mesh: Mesh):
    """Place (or re-place) a param pytree onto the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))
