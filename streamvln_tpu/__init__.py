"""streamvln_tpu — a TPU-native (JAX/XLA/Pallas/pjit) streaming VLN framework.

Re-implements the full capability surface of StreamVLN (reference:
kason-huang/StreamVLN) with a TPU-first design:

- `models/`    pure-functional SigLIP / Qwen2 / projector / StreamVLN stack
- `ops/`       Pallas kernels (flash attention, ring-buffer decode attention,
               fused image preprocessing) + dense references
- `parallel/`  device-mesh construction, FSDP/TP sharding rules, train step
- `streaming/` the streaming inference engine (HBM KV ring buffer, per-env
               dialogue state, jitted prefill/decode)
- `data/`      tokenizer, trajectory-window dataset, collator, mixtures
- `eval/`      metrics (SR/SPL/OS/NE/nDTW), fake env, episode runner
- `serve/`     HTTP agent server
- `realworld/` robot client (PID controller, goal integration)
"""

__version__ = "0.1.0"
