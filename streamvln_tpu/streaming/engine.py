"""Streaming inference engine: the TPU-native equivalent of the
reference's per-env KV + inputs_embeds caches and HF greedy generate
(reference: streamvln/model/stream_video_vln.py:353-479 and the eval/agent
loops around it).

Design:

- **KV cache** is a fixed-capacity HBM buffer (models/qwen2.KVCache).
  A window reset is O(1): set the env's length to 0; stale keys are never
  attended (key validity = pos < length). The reference instead drops the
  python cache object (stream_video_vln.py:473-479).
- **Frame-feature cache**: every model call encodes exactly one current
  frame; its pooled projector output (196 tokens) is stored in a per-env
  device slab keyed by env step. At a window boundary the slow memory is
  assembled by GATHERING 8 cached frame features instead of re-encoding 8
  history frames through the 26-layer tower (the math is identical — the
  tower is deterministic per frame; reference re-encodes:
  stream_video_vln.py:111-131). A `reencode_history=True` mode keeps the
  reference-exact path for parity testing and for history steps that were
  never encoded (possible when the LLM emits != num_future_steps actions).
- **One compiled step** `_prefill_decode`: splice embeds (vision pool is a
  static [B, (num_history+1)*tpf, D] buffer: slots 0..H-1 memory, slot H
  current frame), append to KV at per-row offsets, take last-real-token
  logits, then a `lax.while_loop` greedy decode with <|im_end|> early
  stop — replacing HF's python generation loop with max_new_tokens=10000
  (reference: streamvln_eval.py:332).
- **Sequence-length buckets** keep jit shapes static; a handful of
  buckets cover first-call / mid-window / window-boundary prompt sizes.
- The token generated last in a call (usually <|im_end|>) is never fed
  back inside that call, so its KV is absent — it is prepended to the
  next call's token stream ("pending token"), exactly reproducing HF's
  cache_position suffix semantics (stream_video_vln.py:428-450).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import qwen2, streamvln
from streamvln_tpu.models.qwen2 import KVCache
from streamvln_tpu.models.siglip import forward_raw as siglip_forward_raw
from streamvln_tpu.ops.preprocess import preprocess_frames

DEFAULT_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 2560, 3072, 4096)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new", "stop_ids", "attn_impl",
                     "fused_pre", "spec_k"),
    # the engine replaces its cache/feat_cache/ids_buf with this call's
    # outputs, so the inputs are dead on dispatch: donating them lets
    # XLA update the KV append in place instead of allocating a second
    # full-capacity cache per call — at 14B-int4 (params 8.9 GiB +
    # cache 1.6 GiB) the duplicate cache was the difference between
    # fitting and RESOURCE_EXHAUSTED on the 16 GB chip, and at every
    # size it deletes a cache-sized HBM copy per call
    donate_argnames=("cache", "feat_cache", "ids_buf"))
def _prefill_decode(
    params,
    cfg: StreamVLNConfig,
    cache: KVCache,
    feat_cache: jax.Array,        # [B, slots, tpf, D]
    frame: jax.Array,             # [B, H, W, 3] uint8 (camera res)
    packed: jax.Array,            # [B, 3, T] int32: ids/is_vision/vidx
    meta: jax.Array,              # [B, num_history + 3] int32:
    #   hist_slots..., write_slot, length, active
    max_new: int,
    stop_ids: Tuple[int, ...],
    attn_impl: str = "auto",
    fused_pre: bool = False,
    ids_buf: Optional[jax.Array] = None,   # [B, capacity] int32 token
    # shadow of the KV slots (speculative drafting source)
    spec_k: int = 0,
    sample_params=None,       # (temp [B], top_p [B], key) -> sampling
    # decode (serving do_sample parity); overrides spec_k
):
    """One streaming call, a single device dispatch. All per-call host
    data rides in TWO uploads (frame + packed ints) — critical when the
    host<->device link has per-transfer latency (tunneled TPUs; and it
    also minimizes PCIe round-trips on directly-attached hosts).

    Returns (out [B, 2 + max_new] int32: n_out, tokens, then a
    trailing verify-forwards telemetry column, cache,
    feat_cache). Inactive rows (meta active=0) keep their KV lengths.
    """
    token_ids = packed[:, 0, :]
    is_vision = packed[:, 1, :].astype(bool)
    vision_index = packed[:, 2, :]
    nh = cfg.num_history
    hist_slots = meta[:, :nh]
    write_slot = meta[:, nh]
    lengths = meta[:, nh + 1]
    active = meta[:, nh + 2].astype(bool)
    saved_length = cache.length

    B, T = token_ids.shape
    tpf = cfg.tokens_per_frame
    compute_dtype = feat_cache.dtype

    # 1. encode current frame -> pooled tokens; store in feature cache.
    # Inactive rows carry meta zeros (write_slot 0); routing their write
    # to the reserved scratch slot (last index, never host-assigned)
    # keeps slot 0's real step-0 features intact.
    write_slot = jnp.where(active, write_slot,
                           jnp.int32(feat_cache.shape[1] - 1))
    raw = frame.reshape((-1,) + frame.shape[2:]) if frame.ndim == 5 \
        else frame
    if fused_pre:
        # fused resize/normalize/patch-embed (ops/fused_patch_embed.py)
        from streamvln_tpu.models import projector as projector_lib
        from streamvln_tpu.models.streamvln import pool_2d
        feats = siglip_forward_raw(
            params["vision"], cfg.vision, raw, attn_impl,
            compute_dtype=compute_dtype)
        feats = projector_lib.forward(params["projector"], feats)
        pooled = pool_2d(feats, cfg.vision.patches_per_side,
                         cfg.spatial_pool_stride, cfg.spatial_pool_mode)
    else:
        pixels = preprocess_frames(raw, cfg.vision.image_size,
                                   dtype=compute_dtype)
        pooled = streamvln.encode_frames(
            params, cfg, pixels[:, None], attn_impl)      # [B, tpf, D]
    pooled = pooled.reshape(B, tpf, -1).astype(compute_dtype)
    feat_cache = jax.vmap(
        lambda fc, p, s: jax.lax.dynamic_update_slice(fc, p[None], (s, 0, 0))
    )(feat_cache, pooled, write_slot)

    # 2. assemble vision pool: [B, (H+1)*tpf, D]
    mem = jax.vmap(lambda fc, idx: fc[idx])(feat_cache, hist_slots)
    pool = jnp.concatenate([mem.reshape(B, -1, mem.shape[-1]),
                            pooled], axis=1)

    # 3. splice + prefill
    embeds = streamvln.splice_embeds(
        params, pool, token_ids, is_vision, vision_index, cfg.llm)
    embeds = embeds.astype(compute_dtype)
    offsets = cache.length
    positions = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    logits, cache = qwen2.forward(
        params["llm"], cfg.llm, embeds, positions, cache=cache,
        new_lengths=lengths, attn_impl=attn_impl,
        # idle rows' padded-bucket dummy writes become self-copies —
        # a full idle row's clamped write would otherwise smash its
        # live low KV slots (host guards cover only requested envs)
        write_mask=active,
        logits_positions=lengths - 1)
    last_logits = logits[:, 0]

    # 4. greedy decode with early stop; inactive rows are done from the
    # start so they never extend the while loop
    stop_arr = jnp.asarray(stop_ids, jnp.int32)
    if ids_buf is not None:
        # token-id shadow of the KV slots: vision slots get -1 (never
        # drafted through); padding past `lengths` is invisible to the
        # n-gram match (bounded by cache.length). Written on EVERY
        # call that carries a shadow — sampled calls advance
        # cache.length too, and a stale shadow region would silently
        # collapse later speculative acceptance to ~1 token/forward.
        # Inactive rows self-copy (same clamp hazard as the KV write:
        # a capacity-full idle row's clamped write would overwrite
        # live shadow slots and silently degrade later acceptance).
        shadow = jnp.where(is_vision, jnp.int32(-1), token_ids)
        ids_buf = _shadow_write(ids_buf, shadow, offsets, active)
    if sample_params is not None:
        temp, top_p, key = sample_params
        out, n_out, cache, ids_sampled = _sample_loop(
            params, cfg, cache, last_logits, max_new, stop_arr,
            attn_impl, compute_dtype, temp, top_p, key,
            force_done=~active, ids_buf=ids_buf)
        if ids_sampled is not None:
            ids_buf = ids_sampled
        iters = jnp.maximum(n_out - 1, 0)
    elif spec_k:
        p0 = jnp.take_along_axis(
            token_ids, jnp.maximum(lengths - 1, 0)[:, None], axis=1
        )[:, 0]
        out, n_out, cache, ids_buf, iters = _spec_loop(
            params, cfg, cache, ids_buf, last_logits, p0, max_new,
            spec_k, stop_arr, attn_impl, compute_dtype,
            force_done=~active)
    else:
        out, n_out, cache = _greedy_loop(
            params, cfg, cache, last_logits, max_new, stop_arr,
            attn_impl, compute_dtype, force_done=~active)
        iters = jnp.maximum(n_out - 1, 0)

    # inactive rows keep their pre-call KV lengths (their dummy writes
    # land past the kept length and are never attended)
    cache = KVCache(cache.k, cache.v,
                    jnp.where(active, cache.length, saved_length),
                    cache.k_scale, cache.v_scale)
    result = jnp.concatenate(
        [jnp.where(active, n_out, 0)[:, None], out,
         jnp.where(active, iters, 0)[:, None]], axis=1)
    return result, cache, feat_cache, ids_buf


def _scratch_size(n_tokens: int) -> int:
    """Sublane-aligned scratch capacity for a decode loop that can
    write at most n_tokens KV entries (see qwen2.make_scratch)."""
    return max(8, -(-n_tokens // 8) * 8)


def _shadow_write(ids_buf, vals, offsets, active):
    """Masked write into the token-id shadow of the KV slots: row b
    gets vals[b] written at offsets[b]; rows with active[b]=False write
    back what they read (exact self-copy). The mask matters because
    dynamic_update_slice CLAMPS the start index — a capacity-full idle
    row's clamped write would overwrite its live trailing shadow slots
    with dummy ids and silently degrade later speculative acceptance
    (same contract as the KV write_mask; see qwen2._append_stack).

    vals is [B, W] (or [B] for W=1 callers who pass vals[:, None])."""
    def wr(row, s, off, act):
        cur = jax.lax.dynamic_slice(row, (off,), (s.shape[0],))
        return jax.lax.dynamic_update_slice(
            row, jnp.where(act, s, cur), (off,))
    return jax.vmap(wr)(ids_buf, vals, offsets, active)


def _greedy_loop(params, cfg, cache, last_logits, max_new: int,
                 stop_arr, attn_impl, compute_dtype, force_done=None):
    """Shared greedy while-loop: first token from `last_logits`, then
    feed-forward decode with per-row stop masking. Returns
    (out [B, max_new], n_out [B], cache). Rows in `force_done` emit
    their argmax token but never advance the loop or their KV length.

    The big cache is LOOP-INVARIANT: each step's KV appends into a tiny
    scratch cache (qwen2.forward scratch mode) that merges into the big
    cache ONCE after the loop — appending into the full cache inside
    the while-loop made XLA carry an S-untiled relayout copy of the
    whole capacity across iterations (2x cache HBM; the 14B batched-8
    OOM — docs/decode_roofline.md)."""
    B = last_logits.shape[0]
    first_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

    def is_stop(t):
        return jnp.any(t[:, None] == stop_arr[None, :], axis=-1)

    out0 = jnp.zeros((B, max_new), jnp.int32).at[:, 0].set(first_tok)
    scratch0 = qwen2.make_scratch(cfg.llm, B, _scratch_size(max_new),
                                  cache)

    def cond(state):
        scratch, cur, out, n, done = state
        return jnp.logical_and(jnp.any(~done), n < max_new)

    wm = None if force_done is None else ~force_done

    def body(state):
        scratch, cur, out, n, done = state
        emb = qwen2.embed_tokens(params["llm"], cur[:, None],
                                 cfg.llm).astype(compute_dtype)
        pos = (cache.length + scratch.length)[:, None]
        logits, new_scratch = qwen2.forward(
            params["llm"], cfg.llm, emb, pos, cache=cache,
            scratch=scratch, attn_impl=attn_impl)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        # rows already done must not advance their lengths; their garbage
        # KV write lands past the frozen length, is never attended, and is
        # overwritten by the next real write at that offset.
        new_scratch = KVCache(
            new_scratch.k, new_scratch.v,
            jnp.where(done, scratch.length, new_scratch.length),
            new_scratch.k_scale, new_scratch.v_scale)
        out = jnp.where(done[:, None], out,
                        jax.vmap(lambda o, t, i: o.at[i].set(t))(
                            out, nxt, jnp.full((B,), 0, jnp.int32) + n))
        done_next = done | is_stop(nxt)
        cur = jnp.where(done_next, cur, nxt)
        return (new_scratch, cur, out, n + 1, done_next)

    done0 = is_stop(first_tok)
    if force_done is not None:
        done0 = jnp.logical_or(done0, force_done)
    state = (scratch0, first_tok, out0, jnp.int32(1), done0)
    scratch, _, out, n_steps, _ = jax.lax.while_loop(cond, body, state)
    cache = qwen2.merge_scratch(cache, scratch, write_mask=wm)

    # count real tokens per row: tokens up to and including first stop
    stop_mask = jnp.any(out[:, :, None] == stop_arr[None, None, :],
                        axis=-1)
    has_stop = jnp.any(stop_mask, axis=1)
    first_stop = jnp.argmax(stop_mask, axis=1)
    n_out = jnp.where(has_stop, first_stop + 1, n_steps)
    return out, n_out, cache


def _sample_tok(logits, temp, top_p, key):
    """Temperature + nucleus (top-p) token pick, HF-semantics
    (TopPLogitsWarper: sort desc, drop tokens once the cumulative
    probability BEFORE them exceeds top_p, always keep the best;
    reference serving: llava/serve/model_worker.py:143-167).
    Rows with temp ~ 0 take the argmax (HF do_sample gate at 0.001).

    Truncation is INDEX-based like HF's warper (keep the kth+1 best by
    sorted position), not value-based: tokens tied with the cutoff
    logit beyond the cutoff index are dropped, so tied inputs sample
    the same support HF would."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = (logits / jnp.maximum(temp, 1e-6)[:, None]).astype(jnp.float32)
    sl = jnp.sort(lg, axis=-1)[:, ::-1]
    pr = jax.nn.softmax(sl, axis=-1)
    before = jnp.cumsum(pr, axis=-1) - pr
    kth = jnp.maximum(jnp.sum(before <= top_p[:, None], axis=-1) - 1, 0)
    order = jnp.argsort(-lg, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    masked = jnp.where(ranks <= kth[:, None], lg, -jnp.inf)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(temp > 1e-3, sampled.astype(jnp.int32), greedy)


def _sample_loop(params, cfg, cache, last_logits, max_new: int,
                 stop_arr, attn_impl, compute_dtype, temp, top_p, key,
                 force_done=None, ids_buf=None):
    """Sampling twin of _greedy_loop: temperature/top-p categorical
    picks instead of argmax (serving parity with the reference's
    do_sample generate; llava/serve/model_worker.py:148-167). Same KV
    bookkeeping and stop semantics. When the engine keeps a
    speculative token-id shadow (ids_buf), fed tokens are recorded so
    later speculative calls draft from fresh context."""
    B = last_logits.shape[0]
    key, sub = jax.random.split(key)
    first_tok = _sample_tok(last_logits, temp, top_p, sub)

    def is_stop(t):
        return jnp.any(t[:, None] == stop_arr[None, :], axis=-1)

    out0 = jnp.zeros((B, max_new), jnp.int32).at[:, 0].set(first_tok)
    track = ids_buf is not None
    if not track:
        ids_buf = jnp.zeros((B, 1), jnp.int32)    # dummy carry
    scratch0 = qwen2.make_scratch(cfg.llm, B, _scratch_size(max_new),
                                  cache)

    def cond(state):
        done, n = state[4], state[3]
        return jnp.logical_and(jnp.any(~done), n < max_new)

    wm = None if force_done is None else ~force_done

    def body(state):
        scratch, cur, out, n, done, key, ids_buf = state
        emb = qwen2.embed_tokens(params["llm"], cur[:, None],
                                 cfg.llm).astype(compute_dtype)
        tot_len = cache.length + scratch.length
        pos = tot_len[:, None]
        if track:
            # done rows self-copy: a forced-done capacity-full row's
            # clamped write would clobber live shadow slots every
            # iteration (same hazard as the pre-loop pending write)
            ids_buf = _shadow_write(ids_buf, cur[:, None], tot_len,
                                    ~done)
        logits, new_scratch = qwen2.forward(
            params["llm"], cfg.llm, emb, pos, cache=cache,
            scratch=scratch, attn_impl=attn_impl)
        key, sub = jax.random.split(key)
        nxt = _sample_tok(logits[:, 0], temp, top_p, sub)
        new_scratch = KVCache(
            new_scratch.k, new_scratch.v,
            jnp.where(done, scratch.length, new_scratch.length),
            new_scratch.k_scale, new_scratch.v_scale)
        out = jnp.where(done[:, None], out,
                        jax.vmap(lambda o, t, i: o.at[i].set(t))(
                            out, nxt, jnp.full((B,), 0, jnp.int32) + n))
        done_next = done | is_stop(nxt)
        cur = jnp.where(done_next, cur, nxt)
        return (new_scratch, cur, out, n + 1, done_next, key, ids_buf)

    done0 = is_stop(first_tok)
    if force_done is not None:
        done0 = jnp.logical_or(done0, force_done)
    state = (scratch0, first_tok, out0, jnp.int32(1), done0, key,
             ids_buf)
    scratch, _, out, n_steps, _, _, ids_buf = jax.lax.while_loop(
        cond, body, state)
    cache = qwen2.merge_scratch(cache, scratch, write_mask=wm)

    stop_mask = jnp.any(out[:, :, None] == stop_arr[None, None, :],
                        axis=-1)
    has_stop = jnp.any(stop_mask, axis=1)
    first_stop = jnp.argmax(stop_mask, axis=1)
    n_out = jnp.where(has_stop, first_stop + 1, n_steps)
    return out, n_out, cache, (ids_buf if track else None)


def _spec_loop(params, cfg, cache, ids_buf, last_logits, p0_init,
               max_new: int, spec_k: int, stop_arr, attn_impl,
               compute_dtype, force_done=None):
    """Prompt-lookup speculative greedy decode (greedy-EXACT: every
    emitted token is the argmax continuation; drafts only change how
    many tokens one forward verifies).

    Each iteration drafts spec_k tokens by bigram lookup over the
    token-id shadow of this row's KV slots (action-decode text repeats
    its scaffolding every round, so the most recent occurrence of
    (prev, cur) predicts the continuation well), feeds
    [cur, d_1..d_k] through one cached forward, and accepts the longest
    prefix where argmax agrees with the draft — emitting between 1 and
    k+1 tokens for ~the HBM cost of one (decode is weight-bandwidth
    bound). Rejected slots are rolled back by NOT advancing the row's
    KV length; the next append overwrites them.

    Returns (out [B, max_new], n_out [B], cache, ids_buf,
    iters [B] — verify-forwards per row, for acceptance telemetry:
    accepted drafts per forward = (n_out - 1) / iters)."""
    B = last_logits.shape[0]
    k = spec_k
    cap = cache.capacity
    wm = None if force_done is None else ~force_done
    first_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

    def is_stop_mat(t):          # [...] -> bool same shape
        return jnp.any(t[..., None] == stop_arr, axis=-1)

    out0 = jnp.zeros((B, max_new), jnp.int32).at[:, 0].set(first_tok)
    done0 = is_stop_mat(first_tok)
    if force_done is not None:
        done0 = done0 | force_done
    n0 = jnp.ones((B,), jnp.int32)
    done0 = done0 | (n0 >= max_new)

    def draft_row(ids_row, length, p, c):
        idx = jnp.arange(cap, dtype=jnp.int32)
        prev1 = jnp.concatenate(
            [jnp.full((1,), -2, jnp.int32), ids_row[:-1]])
        prev2 = jnp.concatenate(
            [jnp.full((2,), -2, jnp.int32), ids_row[:-2]])
        # the invariant p == ids_row[length-1] holds (accepted tokens
        # are written to the shadow before length advances), so the
        # 3-gram context extends backwards through the shadow itself
        p2 = ids_row[jnp.clip(length - 2, 0, cap - 1)]
        m2 = (prev1 == p) & (ids_row == c) & (idx < length)
        m3 = m2 & (prev2 == p2) & (length >= 2)
        # prefer the most recent 3-gram match (higher-precision
        # continuation on repeated action scaffolding); fall back to
        # the most recent bigram match
        j3 = jnp.max(jnp.where(m3, idx, -1))
        j2 = jnp.max(jnp.where(m2, idx, -1))
        j = jnp.where(j3 >= 0, j3, j2)
        dr = jax.lax.dynamic_slice(
            ids_row, (jnp.clip(j + 1, 0, cap - k),), (k,))
        # no match: draft an impossible id — all-reject, plain 1-token
        # progress for that row
        return jnp.where(j >= 0, dr, jnp.full((k,), -7, jnp.int32))

    scratch0 = qwen2.make_scratch(cfg.llm, B,
                                  _scratch_size(max_new + k), cache)

    def cond(state):
        done = state[6]
        return jnp.any(~done)

    def body(state):
        scratch, ids_buf, p0, c0, out, n, done, iters = state
        tot_len = cache.length + scratch.length
        drafts = jax.vmap(draft_row)(ids_buf, tot_len, p0, c0)
        fed = jnp.concatenate([c0[:, None], drafts], axis=1)  # [B,k+1]
        emb = qwen2.embed_tokens(
            params["llm"], fed, cfg.llm).astype(compute_dtype)
        pos = tot_len[:, None] + \
            jnp.arange(k + 1, dtype=jnp.int32)[None]
        logits, new_scratch = qwen2.forward(
            params["llm"], cfg.llm, emb, pos, cache=cache,
            scratch=scratch, attn_impl=attn_impl)
        truth = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B,k+1]

        # longest accepted prefix: d_{i+1} must equal truth[i]
        match = (drafts == truth[:, :k]).astype(jnp.int32)
        m_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        raw_emit = m_acc + 1
        # trim at the first stop token among the emitted candidates
        stop_m = is_stop_mat(truth)
        in_range = jnp.arange(k + 1)[None] < raw_emit[:, None]
        stop_in = stop_m & in_range
        has_stop = jnp.any(stop_in, axis=1)
        first_stop = jnp.argmax(stop_in, axis=1).astype(jnp.int32)
        emit = jnp.where(has_stop, first_stop + 1, raw_emit)
        # trim to the remaining token budget; done rows emit nothing
        emit = jnp.minimum(emit, max_new - n)
        emit = jnp.where(done, 0, emit)
        stopped = has_stop & (first_stop + 1 <= emit)

        # write emitted tokens at out[b, n_b : n_b+emit_b]
        col = n[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None]
        valid = jnp.arange(k + 1)[None] < emit[:, None]
        col = jnp.where(valid, col, max_new)       # OOB -> dropped
        out = out.at[jnp.arange(B)[:, None], col].set(truth,
                                                      mode="drop")

        # roll back rejected KV: keep exactly `emit` new entries
        # (c0 + the accepted draft prefix); record their token ids.
        # Done rows self-copy — their frozen tot_len can sit clamped
        # at a full row where the k+1-wide write would overwrite live
        # trailing shadow slots with dummy drafts every iteration
        ids_buf = _shadow_write(ids_buf, fed, tot_len, ~done)
        new_scratch = KVCache(new_scratch.k, new_scratch.v,
                              scratch.length + emit,
                              new_scratch.k_scale, new_scratch.v_scale)

        last_i = jnp.maximum(emit - 1, 0)[:, None]
        last_tok = jnp.take_along_axis(truth, last_i, axis=1)[:, 0]
        prev_tok = jnp.take_along_axis(
            truth, jnp.maximum(last_i - 1, 0), axis=1)[:, 0]
        new_c0 = jnp.where(emit > 0, last_tok, c0)
        new_p0 = jnp.where(emit > 1, prev_tok,
                           jnp.where(emit == 1, c0, p0))
        iters = iters + (~done).astype(jnp.int32)
        n = n + emit
        done = done | stopped | (n >= max_new)
        return (new_scratch, ids_buf, new_p0, new_c0, out, n, done,
                iters)

    state = (scratch0, ids_buf, p0_init, first_tok, out0, n0, done0,
             jnp.zeros((B,), jnp.int32))
    scratch, ids_buf, _, _, out, n, _, iters = jax.lax.while_loop(
        cond, body, state)
    cache = qwen2.merge_scratch(cache, scratch, write_mask=wm)
    return out, n, cache, ids_buf, iters


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new", "stop_ids", "attn_impl",
                              "spec_k", "compute_dtype"),
    donate_argnames=("cache", "ids_buf"))
def _decode_continue(params, cfg: StreamVLNConfig, cache: KVCache,
                     pending: jax.Array,      # [B] int32
                     active: jax.Array,       # [B] bool
                     max_new: int, stop_ids: Tuple[int, ...],
                     attn_impl: str = "auto",
                     ids_buf: Optional[jax.Array] = None,
                     spec_k: int = 0,
                     sample_params=None,
                     compute_dtype=jnp.bfloat16):
    """Decode-only continuation: feed each active row's pending token
    (the last one emitted by the previous call, whose KV is absent by
    the suffix-cache convention) and greedily decode up to max_new more.
    This is the chunk primitive for token-streaming serving — the
    reference streams from inside HF generate via TextIteratorStreamer
    (llava/serve/model_worker.py:126-180); our decode loop is one fused
    device dispatch, so streaming = a sequence of these chunk calls.

    compute_dtype must be passed explicitly: inferring it from
    cache.k.dtype breaks for the int8-quantized cache (hidden states
    would be cast to int8)."""
    saved_length = cache.length
    if spec_k:
        ids_buf = _shadow_write(ids_buf, pending[:, None], cache.length,
                                active)
    emb = qwen2.embed_tokens(params["llm"], pending[:, None],
                             cfg.llm).astype(compute_dtype)
    pos = cache.length[:, None]
    # write_mask: inactive rows' dummy pending-token append becomes a
    # self-copy (a full row's clamped write would smash live low slots)
    logits, cache = qwen2.forward(params["llm"], cfg.llm, emb, pos,
                                  cache=cache, attn_impl=attn_impl,
                                  write_mask=active)
    stop_arr = jnp.asarray(stop_ids, jnp.int32)
    if sample_params is not None:
        temp, top_p, key = sample_params
        out, n_out, cache, ids_sampled = _sample_loop(
            params, cfg, cache, logits[:, 0], max_new, stop_arr,
            attn_impl, compute_dtype, temp, top_p, key,
            force_done=~active, ids_buf=ids_buf)
        if ids_sampled is not None:
            ids_buf = ids_sampled
        iters = jnp.maximum(n_out - 1, 0)
    elif spec_k:
        out, n_out, cache, ids_buf, iters = _spec_loop(
            params, cfg, cache, ids_buf, logits[:, 0], pending,
            max_new, spec_k, stop_arr, attn_impl, compute_dtype,
            force_done=~active)
    else:
        out, n_out, cache = _greedy_loop(
            params, cfg, cache, logits[:, 0], max_new, stop_arr,
            attn_impl, compute_dtype, force_done=~active)
        iters = jnp.maximum(n_out - 1, 0)
    cache = KVCache(cache.k, cache.v,
                    jnp.where(active, cache.length, saved_length),
                    cache.k_scale, cache.v_scale)
    result = jnp.concatenate(
        [jnp.where(active, n_out, 0)[:, None], out,
         jnp.where(active, iters, 0)[:, None]], axis=1)
    return result, cache, ids_buf


@functools.partial(jax.jit,
                   static_argnames=("cfg", "attn_impl", "fused_pre"),
                   donate_argnames=("feat_cache",))
def _encode_store(params, cfg: StreamVLNConfig, feat_cache: jax.Array,
                  frame: jax.Array, env: jax.Array, write_slot: jax.Array,
                  attn_impl: str = "auto", fused_pre: bool = False):
    """Encode one frame and store its pooled features at
    feat_cache[env, write_slot] (history backfill path). Must use the
    SAME preprocess flavor as _prefill_decode so a feature cache never
    mixes encoder provenances."""
    if fused_pre:
        from streamvln_tpu.models import projector as projector_lib
        from streamvln_tpu.models.streamvln import pool_2d
        feats = siglip_forward_raw(params["vision"], cfg.vision,
                                   frame[None], attn_impl,
                                   compute_dtype=feat_cache.dtype)
        feats = projector_lib.forward(params["projector"], feats)
        pooled = pool_2d(feats, cfg.vision.patches_per_side,
                         cfg.spatial_pool_stride,
                         cfg.spatial_pool_mode)[0]
    else:
        pixels = preprocess_frames(frame[None], cfg.vision.image_size,
                                   dtype=feat_cache.dtype)
        pooled = streamvln.encode_frames(params, cfg, pixels[:, None],
                                         attn_impl)[0]
    pooled = pooled.astype(feat_cache.dtype)
    return jax.lax.dynamic_update_slice(
        feat_cache, pooled[None, None], (env, write_slot, 0, 0))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "attn_impl", "fused_pre"),
                   donate_argnames=("feat_cache",))
def _encode_store_batch(params, cfg: StreamVLNConfig,
                        feat_cache: jax.Array,
                        frames: jax.Array,        # [N, H, W, 3] uint8
                        env: jax.Array,
                        write_slots: jax.Array,   # [N] int32
                        attn_impl: str = "auto",
                        fused_pre: bool = False):
    """Batched _encode_store: one tower pass + one dispatch for N
    history frames (the misaligned-window boundary can need up to
    num_history backfills; per-frame dispatches cost ~30 ms each on a
    tunneled host — CLAUDE.md gotchas). Padding rows point their
    write_slot at the scratch slot."""
    if fused_pre:
        from streamvln_tpu.models import projector as projector_lib
        from streamvln_tpu.models.streamvln import pool_2d
        feats = siglip_forward_raw(params["vision"], cfg.vision,
                                   frames, attn_impl,
                                   compute_dtype=feat_cache.dtype)
        feats = projector_lib.forward(params["projector"], feats)
        pooled = pool_2d(feats, cfg.vision.patches_per_side,
                         cfg.spatial_pool_stride, cfg.spatial_pool_mode)
    else:
        pixels = preprocess_frames(frames, cfg.vision.image_size,
                                   dtype=feat_cache.dtype)
        pooled = streamvln.encode_frames(params, cfg, pixels[:, None],
                                         attn_impl)
    pooled = pooled.astype(feat_cache.dtype)      # [N, tpf, D]

    def write(fc, i):
        return jax.lax.dynamic_update_slice(
            fc, pooled[i][None, None], (env, write_slots[i], 0, 0)), None
    feat_cache, _ = jax.lax.scan(
        write, feat_cache,
        jnp.arange(frames.shape[0], dtype=jnp.int32))
    return feat_cache


@dataclasses.dataclass
class EnvState:
    """Host-side per-env dialogue bookkeeping."""
    pending_token: Optional[int] = None   # last generated, not yet in KV
    frame_slots: dict = dataclasses.field(default_factory=dict)
    # step_id -> feature-cache slot for encoded frames
    next_slot: int = 0
    # host shadow of the device KV length (exact: prefill length +
    # decode tokens fed); used for overflow checks without device reads
    kv_length: int = 0


class StreamingEngine:
    """Owns device state for n_envs parallel dialogues (batch axis).

    API parity with the reference model-side surface: `reset(env_num)` /
    `reset_for_env(i)` (reference: stream_video_vln.py:473-479) plus
    `generate(env, frame, turn_ids, ...)` which subsumes
    model.generate(images=..., inputs=..., past_key_values=...).
    """

    def __init__(self, params, cfg: StreamVLNConfig, *,
                 n_envs: int = 1,
                 cache_capacity: int = 4096,
                 feat_slots: int = 160,
                 max_new_tokens: int = 16,
                 stop_ids: Sequence[int] = (),
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 compute_dtype=jnp.bfloat16,
                 attn_impl: str = "auto",
                 fused_preprocess: bool = False,
                 spec_lookup: int = 0,
                 fuse_proj: bool = True,
                 kv_int8: bool = False):
        if fuse_proj:
            # single-launch qkv / gate-up matmuls (models/fuse.py):
            # decode-shape dots are launch-bound, and the fused split
            # is bit-equal (output columns are independent reductions).
            # No-op for layers it cannot fuse (LoRA-carrying, MoE).
            from streamvln_tpu.models.fuse import fuse_projections
            params = fuse_projections(params)
        self.params = params
        self.cfg = cfg
        self.n_envs = n_envs
        self.max_new = max_new_tokens
        self.stop_ids = tuple(int(s) for s in stop_ids)
        self.buckets = tuple(sorted(buckets))
        self.attn_impl = attn_impl
        self.fused_preprocess = fused_preprocess
        self.compute_dtype = compute_dtype
        # prompt-lookup speculative decoding: verify spec_lookup drafted
        # tokens per decode forward (greedy-exact; see _spec_loop).
        # 0 = classic one-token-per-forward greedy.
        self.spec_lookup = int(spec_lookup)
        # kv_int8: int8 cache values + per-(token, head) scales — halves
        # resident cache HBM (the capacity lever for long contexts /
        # 14B-class at batch); appends quantize post-RoPE, reads
        # dequantize in the attention operand stream (models/qwen2).
        self.cache = KVCache.create(cfg.llm, n_envs, cache_capacity,
                                    compute_dtype, quantized=kv_int8)
        self.ids_buf = jnp.full((n_envs, cache_capacity), -1,
                                jnp.int32) if self.spec_lookup else None
        D = cfg.llm.hidden_size
        # +1 scratch slot: inactive batch rows write their dummy-frame
        # encoding there (see _prefill_decode); hosts never assign it.
        self.feat_slots = feat_slots
        self.feat_cache = jnp.zeros(
            (n_envs, feat_slots + 1, cfg.tokens_per_frame, D),
            compute_dtype)
        self.envs = [EnvState() for _ in range(n_envs)]
        self._inflight: set = set()
        # decode telemetry: loop tokens emitted vs verify forwards run
        # (greedy: 1 token/forward; spec: up to spec_lookup+1).
        # tokens_per_forward > 1 == realized speculation acceptance.
        self.decode_tokens = 0
        self.decode_forwards = 0
        # sampling RNG stream: seed + per-call counter (deterministic
        # given the seed and call order)
        self.sample_seed = 0
        self._sample_calls = 0

    # -- reset ----------------------------------------------------------
    def reset(self):
        """Full reset of every env, matching the reference's
        `reset(env_num)` which rebuilds all per-env state
        (stream_video_vln.py:473-479) — including the episode-scoped
        frame-feature slots, so engines reused across episodes do not
        exhaust the slot pool."""
        self.cache = KVCache(self.cache.k, self.cache.v,
                             jnp.zeros_like(self.cache.length),
                             self.cache.k_scale, self.cache.v_scale)
        for e in self.envs:
            e.pending_token = None
            e.kv_length = 0
            e.frame_slots.clear()
            e.next_slot = 0
        self._inflight.clear()

    def reset_for_env(self, env: int):
        """Window reset: drop dialogue KV; the frame-feature cache is
        EPISODE-scoped and survives (it feeds the slow memory)."""
        mask = np.zeros((self.n_envs,), bool)
        mask[env] = True
        self.cache = self.cache.reset_rows(jnp.asarray(mask))
        self.envs[env].pending_token = None
        self.envs[env].kv_length = 0

    def reset_episode(self, env: int):
        self.reset_for_env(env)
        self.envs[env].frame_slots.clear()
        self.envs[env].next_slot = 0

    # -- generate -------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"sequence length {n} exceeds largest bucket "
                         f"{self.buckets[-1]}")

    def _prepare_request(self, env: int, frame_u8, turn_ids, step_id,
                         history_steps, pad_to: int):
        st = self.envs[env]
        ids = list(map(int, turn_ids))
        if st.pending_token is not None:
            ids = [st.pending_token] + ids

        num_hist = len(history_steps)
        if num_hist:
            assert num_hist == self.cfg.num_history, (
                f"memory expects {self.cfg.num_history} history frames, "
                f"got {num_hist}")
            missing = [s for s in history_steps if s not in st.frame_slots]
            assert not missing, (
                f"history steps {missing} were never encoded; call "
                f"backfill(env, frame, step) for them first")
            hist_slots = [st.frame_slots[s] for s in history_steps]
        else:
            hist_slots = [0] * self.cfg.num_history  # never referenced

        # current frame gets the next free slot (the last physical slot
        # is reserved scratch for inactive rows — never assigned here)
        write_slot = st.next_slot
        if write_slot >= self.feat_slots:
            raise RuntimeError(
                f"env {env}: frame-feature cache full "
                f"({self.feat_slots} slots); raise feat_slots "
                f"or call reset_episode between episodes")
        st.frame_slots[step_id] = write_slot
        st.next_slot += 1

        layout = streamvln.build_splice_layout(
            np.asarray(ids, np.int32), self.cfg, pad_to=pad_to)
        # vision pool layout: memory slots first, current frame last —
        # matches build_splice_layout's consumption order (<memory>
        # precedes <image> in every prompt that has both).
        if not num_hist:
            # no <memory> sentinel: frame 0 of the pool must be the
            # current frame -> shift indices up by num_history frames
            layout.vision_index = layout.vision_index + np.int32(
                self.cfg.num_history * self.cfg.tokens_per_frame)
        return layout, hist_slots, write_slot

    def _sample_params(self, temperature, top_p):
        """(temp [B], top_p [B], key) for a sampling call, or None for
        greedy (HF do_sample gate: temperature <= 0.001 is greedy —
        reference llava/serve/model_worker.py:148). Scalars apply to
        all rows; dicts ({env: value}) give per-row settings for
        coalesced batches — rows at temp 0 take the exact argmax."""
        B = self.n_envs

        def row_values(v, default):
            if v is None:
                return np.full((B,), default, np.float32)
            if isinstance(v, dict):
                out = np.full((B,), default, np.float32)
                for e, x in v.items():
                    out[int(e)] = float(x)
                return out
            return np.full((B,), float(v), np.float32)

        temps = row_values(temperature, 0.0)
        if not np.any(temps > 1e-3):
            return None
        self._sample_calls += 1
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.sample_seed), self._sample_calls)
        return (jnp.asarray(temps),
                jnp.asarray(row_values(top_p, 1.0)), key)

    def generate(
        self,
        env: int,
        frame_u8: np.ndarray,            # [H, W, 3] uint8 current frame
        turn_ids: np.ndarray,            # int32 ids incl. sentinels
        step_id: int,
        history_steps: Sequence[int] = (),
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> List[int]:
        """Run one model call for one env. Returns generated token ids
        (up to and including the stop token)."""
        return self.generate_batch(
            [(env, frame_u8, turn_ids, step_id, history_steps)],
            temperature=temperature, top_p=top_p)[env]

    def generate_batch(self, requests, temperature=None,
                       top_p=None) -> dict:
        """Blocking batched call: dispatch + collect."""
        return self.collect(self.generate_batch_async(
            requests, temperature=temperature, top_p=top_p))

    def generate_batch_async(self, requests, temperature=None,
                             top_p=None) -> dict:
        """Run model calls for SEVERAL envs in one device dispatch.

        requests: iterable of (env, frame_u8, turn_ids, step_id,
        history_steps). All envs decode together (the deployed
        multi-env-per-chip mode; the reference instead runs one env per
        GPU — SURVEY §2.5.6).

        Returns a handle immediately (jax dispatch is async): the host
        can overlap simulator stepping with device decode and call
        `collect(handle)` when it needs the tokens.
        """
        requests = list(requests)
        assert requests
        envs = [r[0] for r in requests]
        assert len(set(envs)) == len(envs), "duplicate env in batch"
        stale = self._inflight.intersection(envs)
        if stale:
            raise RuntimeError(
                f"envs {sorted(stale)} have an uncollected async handle; "
                f"collect() it before dispatching them again (pending "
                f"token / kv_length bookkeeping settles at collect)")

        # ---- validate EVERYTHING before mutating any engine state:
        # a bucket/overflow error must leave the engine reusable (no
        # leaked inflight marks or consumed feature slots) ----
        def ids_with_pending(env, turn_ids):
            ids = list(map(int, turn_ids))
            if self.envs[env].pending_token is not None:
                ids = [self.envs[env].pending_token] + ids
            return ids
        # shared bucket: max expanded length over the batch (may raise
        # ValueError for an oversized prompt)
        pad_to = self._bucket(max(
            self._expanded_len(ids_with_pending(r[0], r[2]))
            for r in requests))
        cap = self.cache.capacity
        # the decode loop's scratch merge writes its full sublane-padded
        # extent at the post-prefill offset (qwen2.merge_scratch), so
        # active rows need that much headroom past their real tokens
        scr = _scratch_size(self.max_new + self.spec_lookup)
        for env, frame_u8, turn_ids, step_id, history_steps in requests:
            length = self._expanded_len(ids_with_pending(env, turn_ids))
            worst = self.envs[env].kv_length + length + scr
            # the prefill writes the FULL padded bucket at this row's
            # offset; dynamic_update_slice CLAMPS a start that would
            # run past capacity, silently shifting the write down over
            # valid low slots (measured token corruption) — so the
            # padded write must fit too, not just the real tokens
            worst = max(worst, self.envs[env].kv_length + pad_to)
            if worst > cap:
                raise RuntimeError(
                    f"env {env}: KV cache would overflow "
                    f"({worst} > capacity {cap}, incl. the padded "
                    f"{pad_to}-token bucket write); raise "
                    f"cache_capacity or shorten the window/prompt")

        self._inflight.update(envs)
        B = self.n_envs
        nh = self.cfg.num_history
        packed = np.zeros((B, 3, pad_to), np.int32)
        meta = np.zeros((B, nh + 3), np.int32)
        meta[:, nh + 1] = 1                   # inactive rows: 1 dummy tok
        frame_shape = requests[0][1].shape
        frames = np.zeros((B,) + frame_shape, requests[0][1].dtype)

        prefill_lens = {}
        for env, frame_u8, turn_ids, step_id, history_steps in requests:
            layout, hist_slots, write_slot = self._prepare_request(
                env, frame_u8, turn_ids, step_id, history_steps, pad_to)
            prefill_lens[env] = layout.length
            packed[env, 0] = layout.token_ids
            packed[env, 1] = layout.is_vision
            packed[env, 2] = layout.vision_index
            meta[env, :nh] = hist_slots
            meta[env, nh] = write_slot
            meta[env, nh + 1] = layout.length
            meta[env, nh + 2] = 1             # active
            frames[env] = frame_u8

        result, self.cache, self.feat_cache, self.ids_buf = \
            _prefill_decode(
                self.params, self.cfg, self.cache, self.feat_cache,
                jnp.asarray(frames), jnp.asarray(packed),
                jnp.asarray(meta), self.max_new, self.stop_ids,
                self.attn_impl, self.fused_preprocess,
                self.ids_buf, self.spec_lookup,
                self._sample_params(temperature, top_p))
        return {"result": result, "envs": envs,
                "prefill_lens": prefill_lens}

    def collect(self, handle) -> dict:
        """Block on a generate_batch_async handle; returns
        {env: token list} and settles host-side bookkeeping."""
        res = np.asarray(handle["result"])    # single download
        out = {}
        self._inflight.difference_update(handle["envs"])
        for env in handle["envs"]:
            n_out = int(res[env, 0])
            toks = [int(t) for t in res[env, 1: 1 + n_out]]
            self.decode_tokens += max(n_out - 1, 0)
            self.decode_forwards += int(res[env, 1 + self.max_new])
            if toks:
                self.envs[env].pending_token = toks[-1]
            # device KV grew by the prefill plus each decode token fed
            # (the final emitted token is pending, not yet in KV)
            self.envs[env].kv_length += handle["prefill_lens"][env] \
                + max(n_out - 1, 0)
            out[env] = toks
        return out

    def continue_decode(self, env: int,
                        temperature: Optional[float] = None,
                        top_p: Optional[float] = None) -> List[int]:
        """Decode one more chunk (up to max_new_tokens) for `env` from
        its pending token, without a new frame or turn. The serving
        token-streaming primitive: generate() + continue_decode()* is
        token-for-token identical to one generate() with a larger
        decode budget (tests/test_streaming.py chunked-parity)."""
        st = self.envs[env]
        if st.pending_token is None:
            raise RuntimeError(
                f"env {env}: no pending token; call generate() first")
        if env in self._inflight:
            raise RuntimeError(
                f"env {env} has an uncollected async handle")
        worst = st.kv_length + 1 + _scratch_size(
            self.max_new + self.spec_lookup)
        if worst > self.cache.capacity:
            raise RuntimeError(
                f"env {env}: KV cache would overflow ({worst} > "
                f"capacity {self.cache.capacity})")
        pending = np.zeros((self.n_envs,), np.int32)
        pending[env] = st.pending_token
        active = np.zeros((self.n_envs,), bool)
        active[env] = True
        result, self.cache, self.ids_buf = _decode_continue(
            self.params, self.cfg, self.cache, jnp.asarray(pending),
            jnp.asarray(active), self.max_new, self.stop_ids,
            self.attn_impl, self.ids_buf, self.spec_lookup,
            self._sample_params(temperature, top_p),
            compute_dtype=self.compute_dtype)
        res = np.asarray(result)
        n_out = int(res[env, 0])
        toks = [int(t) for t in res[env, 1: 1 + n_out]]
        self.decode_tokens += max(n_out - 1, 0)
        self.decode_forwards += int(res[env, 1 + self.max_new])
        if toks:
            st.pending_token = toks[-1]
        st.kv_length += 1 + max(n_out - 1, 0)
        return toks

    def backfill(self, env: int, frame_u8: np.ndarray, step_id: int):
        """Encode a history frame that was never seen at a model call
        (happens when the LLM emits != num_future_steps actions)."""
        self.backfill_batch(env, [frame_u8], [step_id])

    def backfill_batch(self, env: int, frames_u8, step_ids):
        """Batched backfill: ONE dispatch for all missing history
        frames (a misaligned boundary can need up to num_history; the
        per-frame path cost one ~30 ms dispatch each on tunneled
        hosts). Frames are padded to num_history rows (one compiled
        shape); padding writes to the scratch slot."""
        st = self.envs[env]
        missing = [(f, s) for f, s in zip(frames_u8, step_ids)
                   if s not in st.frame_slots]
        if not missing:
            return
        if st.next_slot + len(missing) > self.feat_slots:
            raise RuntimeError(
                f"env {env}: frame-feature cache full "
                f"({self.feat_slots} slots); raise feat_slots")
        slots = []
        for _, s in missing:
            st.frame_slots[s] = st.next_slot
            slots.append(st.next_slot)
            st.next_slot += 1
        n_pad = self.cfg.num_history
        while len(slots) > n_pad:       # more than one window's worth
            n_pad *= 2
        frames = np.zeros((n_pad,) + missing[0][0].shape,
                          missing[0][0].dtype)
        wslots = np.full((n_pad,), self.feat_slots, np.int32)  # scratch
        for i, (f, _) in enumerate(missing):
            frames[i] = f
            wslots[i] = slots[i]
        self.feat_cache = _encode_store_batch(
            self.params, self.cfg, self.feat_cache,
            jnp.asarray(frames), jnp.int32(env), jnp.asarray(wslots),
            self.attn_impl, self.fused_preprocess)

    def _expanded_len(self, ids) -> int:
        tpf = self.cfg.tokens_per_frame
        n = 0
        for t in ids:
            if t == -200:
                n += tpf
            elif t == -300:
                n += self.cfg.num_history * tpf
            else:
                n += 1
        return n
