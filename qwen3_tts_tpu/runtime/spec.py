"""Speculative multi-frame decoding: verify step + acceptance plumbing.

DESIGN §12 records why full speculative decoding is not default-on: the
draft must propose COMPLETE frames (the talker feedback embeds all 16
codes of a frame — engine.rs:622-631), and no trained draft head ships
with the reference checkpoints.  This module lands the two prerequisites
as working, tested code so a trained MTP/EAGLE-style head is a drop-in
(VERDICT r4 #8):

  (a) the mid-decode multi-token verify forward
      (models.talker.talker_verify_frames — ONE 28-layer weight stream
      for K drafted frames, the whole point on a bandwidth-bound decode,
      DESIGN §10);
  (b) per-lane acceptance counts with masked cursor rollback
      (`gen_frames_spec` below — the KVCache's per-lane write cursors
      already support data-dependent moves <= K).

Acceptance rule: a drafted frame is accepted iff ALL 16 of its codes
exactly match the target's (code_0 from the talker's sampler, residuals
from the predictor's greedy expansion).  Exact-match is the correct rule
for the deterministic parts (residuals ARE greedy argmax) and a
conservative-but-valid rule for sampled code_0: with temperature > 0 the
emitted frames are still target-distributed because every emitted frame
is the TARGET's (accepted drafts equal it; the first mismatch emits the
target's frame — "resample on first reject").  The standard
min(1, p_target/p_draft) rule, which accepts more under sampling, needs
the draft head's proposal distribution and lands with a trained head.

PRNG note: target code_0 draws split keys per frame in gen_frames' order,
so greedy (temperature <= 0) output is EXACTLY the sequential path's
(tests/test_spec.py pins 100%- and 0%-acceptance parity); with sampling,
a spec call consumes K keys regardless of acceptance, so the stream
differs from sequential after the first rejected frame (same class of
note as the fused chunk kernel's inverse-CDF sampler, chunk_step.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import protocol as P
from ..core.config import EngineConfig
from ..models import talker as talker_lib
from ..ops.sampling import sample_logits
from .generate import (GenState, SamplerParams, _frame_emb_sum,
                       _predict_frame_dispatch)


def gen_frames_spec(cfg: EngineConfig, talker_params, predictor_params,
                    assets_pack: Dict[str, Any], state: GenState,
                    draft_codes: jnp.ndarray, sampler: SamplerParams,
                    prompt_cap: int, uniform_cursor: bool = True,
                    ) -> Tuple[GenState, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray]:
    """Verify K drafted frames against the target model; emit the accepted
    prefix plus one corrected frame (standard speculative-decoding loop,
    frame-granular).

    draft_codes: [B, K, 16] int32 complete drafted frames (any source:
    a trained MTP head via `draft_frames`, or `repeat_draft`).
    Returns (new_state, codes [B, K, 16], valid [B, K], n_emit [B]):
    codes are the TARGET's frames at every position (identical to the
    sequential path's output wherever valid); lane b emits codes[b, :n_emit[b]],
    and valid additionally clears frames after a stream's EOS exactly like
    gen_frames.  1 <= n_emit <= K always — a call can never emit zero
    frames, so the outer loop makes progress even at 0% acceptance.

    Cost: ONE K-token talker forward + ONE batched B*K predictor frame +
    ONE single-token talker step — versus K-to-1 sequential frames; on a
    weight-stream-bound decode the verify forward costs ~a single step
    (DESIGN §10), so the break-even acceptance rate is low.
    """
    b, k, n_q = draft_codes.shape
    tables = assets_pack["codec_tables"]
    tables_1024 = assets_pack["codec_tables_1024"]
    proj_w = assets_pack["proj_w"].astype(jnp.float32)
    proj_b = assets_pack["proj_b"].astype(jnp.float32)
    tts_pad = assets_pack["tts_pad"].astype(jnp.float32)

    old_cursor = state.cache.write_idx                      # [B]

    # ---- 1. drafted feedback embeds, then ONE multi-token verify forward
    fb_d = (_frame_emb_sum(tables, draft_codes.reshape(b * k, n_q))
            .reshape(b, k, -1) + tts_pad)                   # [B, K, D] f32
    logits_v, hidden_v, cache_v = talker_lib.talker_verify_frames(
        cfg.talker, talker_params, fb_d, state.pos, state.cache,
        prompt_cap, uniform_cursor=uniform_cursor)

    # ---- 2. per-position target logits/hidden: position i's target is the
    # model output after consuming draft i-1's feedback (position 0 uses
    # the carried state — same as a sequential step would)
    logits_seq = jnp.concatenate(
        [state.logits[:, None, :].astype(logits_v.dtype), logits_v[:, :-1]],
        axis=1)                                             # [B, K, Vc]
    hidden_seq = jnp.concatenate(
        [state.hidden[:, None, :].astype(hidden_v.dtype), hidden_v[:, :-1]],
        axis=1)                                             # [B, K, D]

    # ---- 3. target code_0 per position (keys split in gen_frames' order)
    key = state.key
    c0_list = []
    for i in range(k):
        key, sub = jax.random.split(key)
        c0_list.append(sample_logits(logits_seq[:, i], sub,
                                     sampler.temperature, sampler.top_k,
                                     sampler.top_p))
    c0 = jnp.stack(c0_list, axis=1)                         # [B, K] int32

    # ---- 4. target residuals: ONE batched predictor call over B*K frames
    # (the predictor stream amortizes across positions, DESIGN §12)
    h1024 = (hidden_seq.astype(jnp.float32).reshape(b * k, -1) @ proj_w.T
             + proj_b)
    codes_t = _predict_frame_dispatch(
        cfg, predictor_params, h1024, c0.reshape(b * k),
        tables_1024).reshape(b, k, n_q)                     # [B, K, 16]

    # ---- 5. per-lane leading-match acceptance
    match = jnp.all(codes_t == draft_codes, axis=-1)        # [B, K] bool
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
    n_acc = jnp.sum(acc, axis=1)                            # [B] in [0, K]
    n_emit = jnp.minimum(n_acc + 1, k)                      # [B] in [1, K]

    # ---- 6. corrected step: the first rejected position re-decodes with
    # the TARGET frame's feedback at per-lane cursor old + n_acc (this
    # overwrites the wrong draft KV row; rows beyond stay masked by the
    # causal `slot <= cursor` predicate).  Full-accept lanes run it at
    # old + K as a discarded dummy (slot >= their final cursor).
    fb_t = (_frame_emb_sum(tables, codes_t.reshape(b * k, n_q))
            .reshape(b, k, -1) + tts_pad)
    corr_idx = jnp.minimum(n_acc, k - 1)
    fb_corr = jnp.take_along_axis(
        fb_t, corr_idx[:, None, None], axis=1)[:, 0]        # [B, D]
    cache_c = cache_v.replace(write_idx=old_cursor + n_acc)
    logits_c, hidden_c, cache_c = talker_lib.talker_decode_step(
        cfg.talker, talker_params, fb_corr, state.pos + n_acc, cache_c,
        prompt_cap, uniform_cursor=False)

    # ---- 7. merge carried state per lane
    full = (n_acc == k)[:, None]
    logits_new = jnp.where(full, logits_v[:, -1], logits_c)
    hidden_new = jnp.where(full, hidden_v[:, -1], hidden_c)
    cache_new = cache_c.replace(write_idx=old_cursor + n_emit)

    # ---- 8. EOS bookkeeping over emitted frames (mirrors gen_frames:
    # the EOS frame ITSELF is flagged invalid — engine.rs:558-561 breaks
    # before emitting it — and done is sticky)
    emit_mask = (jnp.arange(k, dtype=jnp.int32)[None, :]
                 < n_emit[:, None])                         # [B, K]
    eos = (c0 == P.EOS) & emit_mask
    eos_incl = jnp.cumsum(eos.astype(jnp.int32), axis=1) > 0  # [B, K]
    valid = emit_mask & ~(state.done[:, None] | eos_incl)
    done_new = state.done | jnp.any(eos, axis=1)

    new_state = GenState(
        cache=cache_new, logits=logits_new, hidden=hidden_new,
        pos=state.pos + n_emit,
        # scalar frame counter: lanes advance unevenly under speculation,
        # so track the slowest lane (capacity bookkeeping must be
        # conservative; per-lane progress is pos - lengths)
        step=state.step + jnp.min(n_emit),
        done=done_new, key=key)
    return new_state, codes_t, valid, n_emit


# ---------------------------------------------------------------------------
# draft sources
# ---------------------------------------------------------------------------
def repeat_draft(last_codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Trivial draft: repeat the last emitted frame K times.  [B, 16] ->
    [B, K, 16].  Useful as a live end-to-end exerciser (sustained vowels
    and silence DO repeat frames) and as the 0%-acceptance worst case."""
    return jnp.broadcast_to(last_codes[:, None, :],
                            (last_codes.shape[0], k, last_codes.shape[1]))


def init_draft_params(cfg: EngineConfig, key: jax.Array,
                      d_hidden: int = 512) -> Dict[str, Any]:
    """Random-init MTP-style draft head (FlashTTS/MTP per PAPERS.md): a
    small trunk consuming [talker hidden; frame embedding] and 16 output
    heads (one per codebook).  Trained weights drop into the same pytree;
    with random weights acceptance is ~0 (the documented reason spec mode
    is not default — DESIGN §12)."""
    d = cfg.talker.d_model
    k1, k2, k3 = jax.random.split(key, 3)
    s_in = (2 * d) ** -0.5
    return {
        "trunk": jax.random.normal(k1, (2 * d, d_hidden), jnp.float32) * s_in,
        "trunk_b": jnp.zeros((d_hidden,), jnp.float32),
        # head 0 covers the sampled codec range [0, 2160); residual heads
        # cover their 2048-row codebooks (prompt.rs:5-16 ranges)
        "head0": jax.random.normal(k2, (d_hidden, P.CODE_SAMPLING_LIMIT),
                                   jnp.float32) * d_hidden ** -0.5,
        "heads": jax.random.normal(k3, (15, d_hidden, 2048),
                                   jnp.float32) * d_hidden ** -0.5,
    }


def draft_frames(cfg: EngineConfig, draft_params: Dict[str, Any],
                 assets_pack: Dict[str, Any], hidden: jnp.ndarray,
                 last_codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Greedily draft K complete frames from the talker hidden state.

    Autoregressive over frames: x_i = gelu([hidden-proxy; emb(frame_{i-1})]
    @ trunk); each codebook head proposes argmax codes.  hidden: [B, D]
    (the carried talker hidden); last_codes: [B, 16] (the last emitted
    frame).  Returns [B, K, 16] int32 for gen_frames_spec.
    """
    tables = assets_pack["codec_tables"]
    h = hidden.astype(jnp.float32)
    prev = last_codes
    out = []
    for _ in range(k):
        fb = _frame_emb_sum(tables, prev)                   # [B, D]
        x = jnp.concatenate([h, fb], axis=-1)
        t = jax.nn.gelu(x @ draft_params["trunk"] + draft_params["trunk_b"])
        c0 = jnp.argmax(t @ draft_params["head0"], axis=-1).astype(jnp.int32)
        res = jnp.argmax(
            jnp.einsum("bh,qhv->bqv", t, draft_params["heads"]),
            axis=-1).astype(jnp.int32)                      # [B, 15]
        frame = jnp.concatenate([c0[:, None], res], axis=1)  # [B, 16]
        out.append(frame)
        prev = frame
    return jnp.stack(out, axis=1)
