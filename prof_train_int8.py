"""7B-int8 + LoRA train-step time: act_int8 off vs on (real chip)."""
import dataclasses, time
import jax, jax.numpy as jnp
import numpy as np
from streamvln_tpu import configs
from streamvln_tpu.models import lora as lora_lib
from streamvln_tpu.models import projector as proj_lib
from streamvln_tpu.models import quant, siglip, streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import train as train_lib
from streamvln_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

B, T = 1, 2048

def build(act_int8):
    cfg = configs.streamvln_7b()
    if act_int8:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, act_int8=True))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "vision": siglip.init(k1, cfg.vision, jnp.bfloat16),
        "projector": proj_lib.init(k2, cfg.projector_type,
                                   cfg.vision.hidden_size,
                                   cfg.llm.hidden_size, jnp.bfloat16),
        "llm": quant.init_quantized_llm(k3, cfg.llm, jnp.bfloat16),
    }
    params = lora_lib.add_lora(params, jax.random.PRNGKey(1), cfg.llm,
                               rank=16)
    return cfg, params

def batch_for(cfg):
    rng = np.random.RandomState(0)
    ids = np.concatenate([[7, IMAGE_TOKEN_INDEX],
                          rng.randint(10, 1000, 64)]).astype(np.int32)
    labels = np.where(np.arange(len(ids)) < 2, IGNORE_INDEX, ids).astype(np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, labels=labels, pad_to=T)
    batch = {k: jnp.asarray(v) for k, v in
             streamvln.stack_layouts([layout] * B).items() if k != "lengths"}
    S = cfg.vision.image_size
    batch["images"] = jnp.asarray(rng.rand(B, 1, S, S, 3).astype(np.float32))
    return batch

import sys
for flag in ([sys.argv[1] == "1"] if len(sys.argv) > 1
             else [False, True]):
    cfg, params = build(flag)
    tcfg = train_lib.TrainConfig(learning_rate=1e-4, total_steps=50,
                                 remat=True, lora_only=True)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1)
    params = mesh_lib.shard_params(params, mesh)
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)
    batch = batch_for(cfg)
    state, m = step(state, batch)
    np.asarray(m["loss"])
    t0 = time.perf_counter(); n = 8
    for _ in range(n):
        state, m = step(state, batch)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"act_int8={flag}: {dt*1e3:.0f} ms/step  loss={float(m['loss']):.3f}", flush=True)
