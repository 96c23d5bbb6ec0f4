"""End-to-end action-token parity vs a torch-side reference.

Builds a tiny torch StreamVLN from stock HF parts (Qwen2ForCausalLM +
SiglipVisionModel + mlp2x_gelu projector) implementing the REFERENCE'S
streaming semantics — embeds-cache + past_key_values suffix recompute,
project->2x2-pool frame tokens, <image>/<memory> splicing, greedy
decode — and drives it in lockstep with our StreamingEngine on shared
random weights for 40 env steps across 4 window boundaries (memory
path included). Emitted token ids must match exactly per call
(BASELINE.md "bit-comparable action-token outputs").

Reference semantics mirrored (studied from, not copied):
  get_2dPool / encode_rgbd      stream_video_vln.py:53-141
  multimodal splice             stream_video_vln.py:144-291
  generate embeds-cache         stream_video_vln.py:396-407
  cache_position suffix slice   stream_video_vln.py:409-471
  agent prompt/memory loop      streamvln_agent.py:169-258
  eval output_ids concat        streamvln_eval.py:305-306
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import (Qwen2Config, SigLIPConfig,
                                   StreamVLNConfig)
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import convert_hf
from streamvln_tpu.ops.preprocess import preprocess_frames
from streamvln_tpu.streaming.engine import StreamingEngine
from streamvln_tpu.utils.constants import (IMAGE_TOKEN_INDEX,
                                           MEMORY_TOKEN_INDEX)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Torch-side mini StreamVLN (reference semantics, independent build)
# ---------------------------------------------------------------------------

class TorchStreamVLN:
    """Streaming multimodal generate with the reference's caching:
    per-env `inputs_embeds` cache grows with each call's prompt embeds;
    `past_key_values` carries KV; only the suffix past the KV length is
    recomputed (stream_video_vln.py:396-450). The caller concatenates a
    call's generated ids into the next call's prompt
    (streamvln_eval.py:305-306)."""

    def __init__(self, llm, tower, projector, cfg: StreamVLNConfig):
        self.llm = llm
        self.tower = tower
        self.projector = projector
        self.cfg = cfg
        self.embeds = None
        self.past = None

    def reset(self):
        """Window reset (stream_video_vln.py:477-479)."""
        self.embeds = None
        self.past = None

    def _pool(self, feats):
        """get_2dPool 'bilinear' (stream_video_vln.py:53-73)."""
        V, P, D = feats.shape
        side = int(round(P ** 0.5))
        x = feats.view(V, side, side, D).permute(0, 3, 1, 2)
        out_side = -(-side // self.cfg.spatial_pool_stride)
        x = torch.nn.functional.interpolate(
            x, size=(out_side, out_side), mode="bilinear")
        return x.permute(0, 2, 3, 1).reshape(V, out_side * out_side, D)

    def _encode(self, pixels):
        """[V, 3, S, S] -> pooled LLM tokens [V, tpf, D]: tower (last
        layer dropped, pre-post-LN hidden) -> projector -> pool
        (encode_rgbd, stream_video_vln.py:102-141)."""
        out = self.tower(pixel_values=pixels, output_hidden_states=True)
        feats = out.hidden_states[-2]
        return self._pool(self.projector(feats))

    def _splice(self, ids, img_feats, mem_feat):
        """<image>/<memory> sentinel expansion
        (prepare_inputs_labels_for_multimodal,
        stream_video_vln.py:182-238)."""
        embed = self.llm.get_input_embeddings()
        pieces, buf, img_i = [], [], 0
        for t in ids:
            if t in (IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX):
                if buf:
                    pieces.append(embed(torch.tensor(buf)))
                    buf = []
                if t == IMAGE_TOKEN_INDEX:
                    pieces.append(img_feats[img_i])
                    img_i += 1
                else:
                    pieces.append(mem_feat)
            else:
                buf.append(t)
        if buf:
            pieces.append(embed(torch.tensor(buf)))
        return torch.cat(pieces, dim=0)[None]

    @torch.no_grad()
    def call(self, ids, pixels, n_history, max_new, stop_ids):
        """One streaming model call. ids: prompt ids for this call
        (caller includes the previous call's generated ids). pixels:
        [V, 3, S, S] — first n_history are memory frames. Returns the
        generated token ids (greedy, early stop)."""
        feats = self._encode(pixels)
        if n_history:
            mem = feats[:n_history].reshape(1, -1, feats.shape[-1])[0]
            img = feats[n_history:]
        else:
            mem, img = None, feats
        new_embeds = self._splice(ids, img, mem)
        self.embeds = new_embeds if self.embeds is None else torch.cat(
            [self.embeds, new_embeds], dim=1)

        from transformers import DynamicCache
        if self.past is None:
            self.past = DynamicCache()
        past_len = self.past.get_seq_length()
        total = self.embeds.shape[1]
        cur = self.embeds[:, past_len:]
        pos = torch.arange(past_len, total)[None]

        toks = []
        while True:
            out = self.llm(inputs_embeds=cur, position_ids=pos,
                           past_key_values=self.past, use_cache=True)
            self.past = out.past_key_values
            tok = int(out.logits[0, -1].argmax())
            toks.append(tok)
            if tok in stop_ids or len(toks) >= max_new:
                return toks
            cur = self.llm.get_input_embeddings()(
                torch.tensor([[tok]]))
            pos = torch.tensor([[self.past.get_seq_length()]])


# ---------------------------------------------------------------------------
# Shared-weight construction
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def stack():
    from transformers import (Qwen2Config as HFQwen2Config,
                              Qwen2ForCausalLM, SiglipVisionConfig,
                              SiglipVisionModel)
    torch.manual_seed(0)

    cfg = StreamVLNConfig(
        vision=SigLIPConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=4, image_size=56,
                            patch_size=14),
        llm=Qwen2Config(vocab_size=512, hidden_size=64,
                        intermediate_size=128, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=16,
                        rope_theta=10000.0,
                        max_position_embeddings=4096),
        num_frames=8, num_future_steps=2, num_history=2)

    hf_llm = Qwen2ForCausalLM(HFQwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=4096,
        rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager")).eval().float()
    hf_tower = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        attn_implementation="eager")).eval().float()
    lin1 = torch.nn.Linear(32, 64)
    lin2 = torch.nn.Linear(64, 64)
    hf_proj = torch.nn.Sequential(lin1, torch.nn.GELU(), lin2).eval()

    params = {
        "llm": convert_hf.convert_qwen2(
            {k: v.detach().numpy()
             for k, v in hf_llm.state_dict().items()},
            cfg.llm, dtype=jnp.float32),
        "vision": convert_hf.convert_siglip(
            {k: v.detach().numpy()
             for k, v in hf_tower.state_dict().items()},
            cfg.vision, dtype=jnp.float32),
        "projector": convert_hf.convert_projector(
            {f"mm_projector.{k}": v.detach().numpy()
             for k, v in hf_proj.state_dict().items()},
            "mlp2x_gelu", dtype=jnp.float32),
    }
    tmodel = TorchStreamVLN(hf_llm, hf_tower, hf_proj, cfg)
    return cfg, params, tmodel


@pytest.mark.parametrize("emit", [2, 3])
@pytest.mark.slow
def test_streaming_action_tokens_match_torch_reference(stack, emit):
    """emit == num_future_steps (2) drives the aligned regime the
    reference exercises in practice; emit == 3 desyncs model calls from
    window boundaries so the first post-reset call is misaligned —
    memory + history are injected from time_ids[0] (the reference's
    history formula, streamvln_eval.py:315-318; its image stacking gate
    at :313 would leave memory_features=None and crash the splice at
    stream_video_vln.py:228-231, so the torch oracle here implements
    the clause's intent) and never-encoded frames ride the backfill
    path."""
    cfg, params, tmodel = stack
    tmodel.reset()
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=1, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=6,
        cache_capacity=2048, buckets=(128, 768), attn_impl="dense")
    agent = VLNAgent(engine, tok)

    rng = np.random.default_rng(7)
    S = cfg.vision.image_size
    instruction = "walk past the table and stop at the red door"
    stop_ids = {tok.im_end_id}

    all_rgb = {}
    prev_out = []          # torch side: last call's generated ids
    queue = []             # fake action queue: model runs when empty
    n_calls = 0
    n_memory_calls = 0
    n_misaligned = 0

    for step in range(40):
        rgb = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
        all_rgb[step] = rgb

        if queue:
            queue.pop(0)
            agent.step(0, rgb, run_model=False)
            if (step + 1) % cfg.num_frames == 0:
                # agent.step already reset the engine; mirror on torch
                tmodel.reset()
                prev_out = []
            continue

        # NOTE the unconditional boundary mirror at the END of the
        # model branch below: the deployed reference resets on EVERY
        # num_frames boundary (streamvln_eval.py:346-350 runs after
        # env.step regardless of whether the step ran the model), and
        # agent.finish_model_step now performs the same bookkeeping.

        req = agent.prepare_model_step(0, rgb, instruction)
        env_id, frame, turn_ids, step_id, history = req["request"]
        assert step_id == step
        jax_toks = engine.generate(env_id, frame, turn_ids, step_id,
                                   history)
        agent.finish_model_step(0)

        # torch side: same turn ids, prompt prefixed by the previous
        # call's generated ids (streamvln_eval.py:305-306); history
        # frames re-encoded (stream_video_vln.py:111-131)
        t_ids = prev_out + [int(t) for t in turn_ids]
        frames_u8 = np.stack([all_rgb[s] for s in history] + [rgb])
        pixels = np.asarray(preprocess_frames(
            jnp.asarray(frames_u8), S, dtype=jnp.float32))
        t_pixels = torch.tensor(pixels).permute(0, 3, 1, 2)
        t_toks = tmodel.call(t_ids, t_pixels, len(history),
                             max_new=6, stop_ids=stop_ids)

        assert jax_toks == t_toks, (
            f"step {step}: engine {jax_toks} != torch {t_toks}")
        prev_out = t_toks
        n_calls += 1
        if history:
            n_memory_calls += 1
            if step % cfg.num_frames != 0:
                n_misaligned += 1
        queue.extend([1] * emit)
        queue.pop(0)       # the call's step consumes the first action
        if (step + 1) % cfg.num_frames == 0:
            # model call landed ON the boundary: the agent resets in
            # finish_model_step; mirror on the torch side
            tmodel.reset()
            prev_out = []

    assert n_calls >= 10
    assert n_memory_calls >= 2   # >= 2 window boundaries w/ memory path
    if emit != cfg.num_future_steps:
        assert n_misaligned >= 2   # misaligned regime actually driven
