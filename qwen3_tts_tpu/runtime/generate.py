"""The fused, jittable generation loop.

Replaces the reference's host-orchestrated hot loop (engine.rs:545-642),
which crosses the Rust→C++ boundary ~16x per frame and bounces the talker
hidden state through host memory every step.  Here one traced program per
frame runs entirely on device:

  sample code_0 (masked [0,2160), temperature/top-k/top-p, jax.random)
  -> EOS flags -> project hidden 2048->1024 -> predictor prefill + 14-step
  scan -> 15 residual codes -> feedback = sum of 16 codec embeds + tts_pad
  -> talker decode step (M-RoPE position) -> next logits/hidden

Frames are batched `frames_per_chunk` at a time with `lax.scan`, so the host
dispatches once per 4-frame chunk (the streaming granularity of the
reference's decoder thread, engine.rs:509-510).  Sampler parameters are
traced scalars: changing temperature/top_k/top_p/seed never recompiles.

Batch dimension B is native throughout — multi-stream serving shards it over
the device mesh (parallel/).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core import protocol as P
from ..core.config import EngineConfig
from ..models import predictor as predictor_lib
from ..models import talker as talker_lib
from ..models.transformer import KVCache
from ..ops.sampling import sample_logits


@struct.dataclass
class GenState:
    cache: KVCache            # talker KV cache
    logits: jnp.ndarray       # [B, V_codec] logits for the next code_0
    hidden: jnp.ndarray       # [B, 2048] talker hidden at the sampled position
    pos: jnp.ndarray          # [B] next logical position (prompt len + steps)
    step: jnp.ndarray         # scalar int32: frames generated so far
    done: jnp.ndarray         # [B] bool: stream hit EOS
    key: jax.Array            # PRNG key


@struct.dataclass
class SamplerParams:
    """Traced sampling scalars (no recompilation on change)."""
    temperature: jnp.ndarray
    top_k: jnp.ndarray
    top_p: jnp.ndarray

    @staticmethod
    def make(cfg) -> "SamplerParams":
        return SamplerParams(
            temperature=jnp.float32(cfg.temperature),
            top_k=jnp.int32(cfg.top_k),
            top_p=jnp.float32(cfg.top_p))


def prefill(cfg: EngineConfig, talker_params, embeds: jnp.ndarray,
            lengths: jnp.ndarray, key: jax.Array) -> GenState:
    """Build the initial GenState from a padded prompt batch.

    embeds: [B, S_max, 2048] right-padded prompt embeddings;
    lengths: [B] true prompt lengths.
    """
    b, s_max, _ = embeds.shape
    # Round the cache capacity to a coarse bucket so changing max_steps does
    # not change compiled shapes (the flash kernel also reads 512-slot
    # chunks, so capacity stays aligned with its DMA granularity).
    need = s_max + cfg.runtime.max_steps + cfg.runtime.frames_per_chunk
    capacity = ((need + 511) // 512) * 512
    cache = talker_lib.init_talker_cache(cfg.talker, b, capacity)
    logits, hidden, cache = talker_lib.talker_prefill(
        cfg.talker, talker_params, embeds, lengths, cache)
    return GenState(
        cache=cache, logits=logits, hidden=hidden,
        pos=lengths.astype(jnp.int32),
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((b,), bool),
        key=key)


def prefill_with_prefix(cfg: EngineConfig, talker_params,
                        prefix_k: jnp.ndarray, prefix_v: jnp.ndarray,
                        prefix_len, suffix_embeds: jnp.ndarray,
                        suffix_lengths, key: jax.Array,
                        total_bucket: int) -> GenState:
    """Prefill continuing from a cached prompt prefix.

    The prefix KV (slots [0, prefix_len), padded to the static Pcap block)
    is injected at slot 0 of a fresh cache; the suffix rows (task text +
    activation marker) prefill at write cursor `prefix_len` with positions
    prefix_len..  Validity stays one contiguous range [0, prefix_len +
    suffix_len), so the existing masks and the flash kernel apply
    unchanged; slots in [lengths, total_bucket) are invisible exactly like
    ordinary prompt padding.  `total_bucket` must equal the prompt_cap the
    decode chunks will use (same capacity formula as `prefill`).

    prefix_k/v: [L, B, Hkv, Pcap, Dh] from a previous prefill's cache;
    suffix_embeds: [B, Scap, 2048]; prefix_len/suffix_lengths: [B] int32.
    """
    b, s_cap, _ = suffix_embeds.shape
    need = total_bucket + cfg.runtime.max_steps + cfg.runtime.frames_per_chunk
    capacity = ((need + 511) // 512) * 512
    cache = talker_lib.init_talker_cache(cfg.talker, b, capacity)
    zeros5 = (0, 0, 0, 0, 0)
    cache = cache.replace(
        k=jax.lax.dynamic_update_slice(cache.k, prefix_k.astype(cache.k.dtype),
                                       zeros5),
        v=jax.lax.dynamic_update_slice(cache.v, prefix_v.astype(cache.v.dtype),
                                       zeros5))
    prefix_len = jnp.broadcast_to(jnp.asarray(prefix_len, jnp.int32), (b,))
    suffix_lengths = jnp.asarray(suffix_lengths, jnp.int32)
    lengths_total = prefix_len + suffix_lengths
    cache = cache.replace(lengths=lengths_total, write_idx=prefix_len)

    pos = prefix_len[:, None] + jnp.arange(s_cap, dtype=jnp.int32)[None, :]
    pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], axis=-1)
    cos, sin = talker_lib._rope_tables(cfg.talker, pos4)
    hidden_all, cache = transformer_forward_suffix(
        cfg, talker_params, suffix_embeds, cos, sin, cache, total_bucket)

    last = jnp.clip(suffix_lengths - 1, 0, s_cap - 1)
    hidden = jnp.take_along_axis(hidden_all, last[:, None, None],
                                 axis=1)[:, 0]
    logits = talker_lib._codec_logits(talker_params, hidden)
    # decode region starts at total_bucket, as after an ordinary prefill
    cache = cache.replace(write_idx=jnp.full((b,), total_bucket, jnp.int32))
    return GenState(
        cache=cache, logits=logits, hidden=hidden,
        pos=lengths_total,
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((b,), bool),
        key=key)


def transformer_forward_suffix(cfg, talker_params, embeds, cos, sin, cache,
                               total_bucket: int):
    from ..models import transformer
    return transformer.decoder_forward(
        cfg.talker, talker_params,
        embeds.astype(jnp.dtype(cfg.talker.dtype)), cos, sin, cache,
        prompt_cap=total_bucket, a8=True)


def _predict_frame_dispatch(cfg: EngineConfig, predictor_params, h1024,
                            code0, tables_1024):
    """Pick the predictor inner-loop implementation.

    Default on TPU (decode-shaped batches): the single-launch Pallas
    megakernel (kernels/predictor_frame.py) with VMEM-resident weights.
    Measured against the XLA path in isolation: 2.65 vs 4.12 ms/frame on
    one axon host, 3.7 vs 3.8 on another (per-dispatch latency differs
    1.5-28 ms between tunnel hosts, which dwarfs the kernel delta at these
    sizes — inside the fused chunk/bulk programs the kernel is reliably
    never slower, and the r2 driver bench ran bulk+fused-predictor
    end-to-end at RTF 0.065).  Semantics match the XLA path exactly in
    interpret mode; on hardware Mosaic's bf16 rounding can flip greedy
    argmax near-ties (immaterial for synthesis: those codes are within the
    model's own quantization noise).  QTTS_FUSED_PREDICTOR=0 opts out
    (exact XLA-path numerics); big batches and non-TPU backends always use
    the XLA path."""
    import os
    if os.environ.get("QTTS_FUSED_PREDICTOR", "1") != "0":
        from ..kernels.flash_decode import use_flash_decode
        from ..kernels.predictor_frame import (predict_frame_fused,
                                               supported)
        if use_flash_decode() and supported(cfg.predictor,
                                            int(h1024.shape[0])):
            return predict_frame_fused(cfg.predictor, predictor_params,
                                       h1024, code0, tables_1024)
    return predictor_lib.predict_frame(
        cfg.predictor, predictor_params, h1024, code0, tables_1024)


def gen_frames(cfg: EngineConfig, talker_params, predictor_params,
               assets_pack: Dict[str, Any], state: GenState,
               sampler: SamplerParams, n_frames: int, prompt_cap: int,
               uniform_cursor: bool = True,
               ) -> Tuple[GenState, jnp.ndarray, jnp.ndarray]:
    """Generate `n_frames` frames (static count).

    Returns (state, codes [B, n_frames, 16] int32, valid [B, n_frames] bool).
    Frames after a stream's EOS are generated but flagged invalid, mirroring
    the reference's early `break` (engine.rs:558-561) per stream.
    """
    # Chunk-level megakernel: the whole n_frames loop (sampling + predictor
    # + feedback + talker steps + codec head) in ONE Pallas launch
    # (kernels/chunk_step.py).  Generator packs the prepped weights under
    # talker_params["chunk"] when QTTS_FUSED_CHUNK=1 and the config
    # qualifies; here we only need the per-call gates (batch, frame count,
    # uniform cursor).
    chunk_pack = (talker_params.get("chunk")
                  if isinstance(talker_params, dict) else None)
    if chunk_pack is not None and uniform_cursor:
        from ..kernels import chunk_step as _cs
        if _cs.supported(cfg.talker, cfg.predictor,
                         int(state.hidden.shape[0]), n_frames):
            return _gen_frames_chunk(cfg, talker_params, chunk_pack, state,
                                     sampler, n_frames, prompt_cap)
    tables_1024 = assets_pack["codec_tables_1024"]
    proj_w = assets_pack["proj_w"].astype(jnp.float32)
    proj_b = assets_pack["proj_b"].astype(jnp.float32)
    tts_pad = assets_pack["tts_pad"].astype(jnp.float32)

    def frame(state: GenState, _):
        key, sub = jax.random.split(state.key)
        code0 = sample_logits(state.logits, sub, sampler.temperature,
                              sampler.top_k, sampler.top_p)  # [B]
        eos = code0 == P.EOS            # 2150; 151673 unreachable in [0,2160)
        done = state.done | eos

        h1024 = (state.hidden.astype(jnp.float32) @ proj_w.T + proj_b)
        codes = _predict_frame_dispatch(cfg, predictor_params, h1024, code0,
                                        tables_1024)

        frame_emb = _frame_emb_sum(assets_pack["codec_tables"], codes)
        feedback = frame_emb + tts_pad  # [B, 2048]

        logits, hidden, cache = talker_lib.talker_decode_step(
            cfg.talker, talker_params, feedback, state.pos, state.cache,
            prompt_cap=prompt_cap, uniform_cursor=uniform_cursor)

        new_state = GenState(
            cache=cache, logits=logits, hidden=hidden, pos=state.pos + 1,
            step=state.step + 1, done=done, key=key)
        return new_state, (codes, ~done)

    state, (codes, valid) = jax.lax.scan(frame, state, None, length=n_frames)
    # scan stacks on axis 0: [n, B, ...] -> [B, n, ...]
    return state, jnp.transpose(codes, (1, 0, 2)), jnp.transpose(valid, (1, 0))


def _gen_frames_chunk(cfg: EngineConfig, talker_params, chunk_pack,
                      state: GenState, sampler: SamplerParams,
                      n_frames: int, prompt_cap: int,
                      interpret: bool = False,
                      ) -> Tuple[GenState, jnp.ndarray, jnp.ndarray]:
    """gen_frames through the chunk megakernel (kernels/chunk_step.py).

    Key evolution mirrors the per-frame scan exactly (one split per frame);
    the subkey feeds a uniform draw instead of jax.random.categorical, so
    sampled sequences are distribution-equivalent but not draw-identical to
    the XLA path (greedy is identical).  EOS/valid bookkeeping matches
    gen_frames: the EOS frame itself is flagged invalid.
    """
    from ..kernels import chunk_step as _cs

    b = state.hidden.shape[0]
    key = state.key
    us = []
    for _ in range(n_frames):
        key, sub = jax.random.split(key)
        us.append(jax.random.uniform(sub, (b,), jnp.float32))
    u = jnp.stack(us)                                   # [F, B]
    sampler_vec = jnp.stack(
        [sampler.temperature.astype(jnp.float32),
         sampler.top_k.astype(jnp.float32),
         sampler.top_p.astype(jnp.float32),
         jnp.float32(0)]).reshape(1, 4)

    cache = state.cache
    codes, logits, hidden, k_new, v_new = _cs.gen_chunk_fused(
        cfg.talker, cfg.predictor, talker_params, chunk_pack["pred_w"],
        chunk_pack["extras"], state.logits, state.hidden, cache.k, cache.v,
        cache.lengths, cache.write_idx[0], state.pos, u, sampler_vec,
        n_frames=n_frames, prompt_cap=prompt_cap, interpret=interpret)

    eos = codes[:, :, 0] == P.EOS                       # [B, F]
    cum = jnp.cumsum(eos.astype(jnp.int32), axis=1) > 0
    valid = ~(state.done[:, None] | cum)
    done = state.done | cum[:, -1]

    v_in = state.logits.shape[-1]
    new_state = GenState(
        cache=cache.replace(
            k=k_new, v=v_new,
            write_idx=cache.write_idx + jnp.int32(n_frames)),
        logits=logits[:, :v_in].astype(state.logits.dtype),
        hidden=hidden.astype(state.hidden.dtype),
        pos=state.pos + jnp.int32(n_frames),
        step=state.step + jnp.int32(n_frames),
        done=done, key=key)
    return new_state, codes, valid


def _frame_emb_sum(codec_tables: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """sum_q codec_tables[q][codes[:, q]] for codes [B, 16] -> [B, 2048]."""
    n_q = codec_tables.shape[0]
    rows = codec_tables.shape[1]
    safe = jnp.clip(codes, 0, rows - 1)
    # One fused gather: flatten (q, code) -> q * rows + code.
    flat = codec_tables.reshape(n_q * rows, -1)
    idx = jnp.arange(n_q, dtype=jnp.int32)[None, :] * rows + safe  # [B, 16]
    gathered = jnp.take(flat, idx, axis=0)  # [B, 16, 2048]
    return jnp.sum(gathered.astype(jnp.float32), axis=1)


def prefill_lane(cfg: EngineConfig, talker_params, embeds: jnp.ndarray,
                 length: jnp.ndarray, lane: jnp.ndarray, state: GenState,
                 ) -> GenState:
    """Prefill ONE lane of a running batch with a new prompt (continuous
    batching).  embeds: [S_max, 2048] padded prompt; length: scalar true
    length; lane: scalar lane index.  Other lanes' cache/cursors are
    untouched; the refilled lane's write cursor restarts at prompt_cap, so
    its previous occupant's decode slots become unreachable (slot > cursor)
    and are progressively overwritten."""
    cache = state.cache
    s_max = embeds.shape[0]
    k_lane = jax.lax.dynamic_slice_in_dim(cache.k, lane, 1, axis=1)
    v_lane = jax.lax.dynamic_slice_in_dim(cache.v, lane, 1, axis=1)
    lane_cache = cache.replace(
        k=k_lane, v=v_lane, write_idx=jnp.zeros((1,), jnp.int32),
        lengths=length[None].astype(jnp.int32))
    logits, hidden, lane_cache = talker_lib.talker_prefill(
        cfg.talker, talker_params, embeds[None], length[None].astype(jnp.int32),
        lane_cache)

    lane = jnp.asarray(lane, jnp.int32)
    new_cache = cache.replace(
        k=jax.lax.dynamic_update_slice(cache.k, lane_cache.k, (0, lane, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, lane_cache.v, (0, lane, 0, 0, 0)),
        lengths=cache.lengths.at[lane].set(length.astype(jnp.int32)),
        write_idx=cache.write_idx.at[lane].set(jnp.int32(s_max)),
    )
    return state.replace(
        cache=new_cache,
        logits=state.logits.at[lane].set(logits[0]),
        hidden=state.hidden.at[lane].set(hidden[0]),
        pos=state.pos.at[lane].set(length.astype(jnp.int32)),
        done=state.done.at[lane].set(False),
    )


def prefill_lanes(cfg: EngineConfig, talker_params, embeds: jnp.ndarray,
                  lengths: jnp.ndarray, lanes: jnp.ndarray, state: GenState,
                  ) -> GenState:
    """Batched lane refill: prefill R lanes of a running batch in ONE
    program (continuous batching's per-refill host round-trips collapse to
    one dispatch per scheduler round).  embeds: [R, S_max, 2048] padded
    prompts; lengths/lanes: [R].  Duplicate lane indices are ALLOWED ONLY
    with identical rows (callers pad a partial refill group by repeating
    row 0) — the scatter picks an arbitrary duplicate, which is then the
    same data.  Semantics per lane match prefill_lane."""
    cache = state.cache
    r, s_max, _ = embeds.shape
    lanes = jnp.asarray(lanes, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    # Prefill into a COMPACT fresh cache (capacity = the prompt bucket) —
    # the old contents of the refilled lanes are irrelevant (masked), and
    # gathering/scattering full-capacity lanes through XLA advanced
    # indexing copied the whole cache per refill round (~1.4 s at b=32).
    lane_cache = talker_lib.init_talker_cache(cfg.talker, r, s_max)
    lane_cache = lane_cache.replace(lengths=lengths)
    logits, hidden, lane_cache = talker_lib.talker_prefill(
        cfg.talker, talker_params, embeds, lengths, lane_cache)
    # in-place lane injection (Pallas DMA kernel with aliased outputs;
    # interpret-mode on CPU backends)
    from ..kernels.flash_decode import inject_prompt_lanes, use_flash_decode
    k_new, v_new = inject_prompt_lanes(
        cache.k, cache.v, lane_cache.k, lane_cache.v, lanes,
        interpret=not use_flash_decode())
    new_cache = cache.replace(
        k=k_new, v=v_new,
        lengths=cache.lengths.at[lanes].set(lengths),
        write_idx=cache.write_idx.at[lanes].set(jnp.int32(s_max)))
    return state.replace(
        cache=new_cache,
        logits=state.logits.at[lanes].set(logits.astype(state.logits.dtype)),
        hidden=state.hidden.at[lanes].set(hidden.astype(state.hidden.dtype)),
        pos=state.pos.at[lanes].set(lengths),
        done=state.done.at[lanes].set(False))


def gen_frames_with_audio(cfg: EngineConfig, talker_params, predictor_params,
                          assets_pack, codec_params, state: GenState,
                          dec_state, sampler: SamplerParams, n_frames: int,
                          prompt_cap: int, uniform_cursor: bool = True):
    """Fused LM chunk + codec decode: ONE device program per audio chunk.

    The reference needs a separate decoder thread to overlap codec decode
    with generation (engine.rs:487-543); fusing both into one XLA program
    removes a host round-trip per chunk entirely — on high-latency transports
    (remote TPU) that halves the steady-state per-chunk overhead.
    Returns (state, dec_state, codes, valid, wav [B, n*spf]).
    """
    from ..models.codec import decoder as codec_decoder
    state, codes, valid = gen_frames(cfg, talker_params, predictor_params,
                                     assets_pack, state, sampler, n_frames,
                                     prompt_cap, uniform_cursor)
    wav, dec_state = codec_decoder.decode_chunk(cfg.codec_decoder,
                                                codec_params, codes,
                                                dec_state)
    return state, dec_state, codes, valid, wav


def _gen_bulk(cfg: EngineConfig, talker_params, predictor_params,
              assets_pack, codec_params, state: GenState, dec_state,
              sampler: SamplerParams, budgets=None, *, max_frames: int,
              chunk: int, prompt_cap: int, uniform_cursor: bool = True):
    """Whole-request generation in ONE device program.

    A `lax.while_loop` over `chunk`-frame groups replaces the host chunk
    loop of `_stream_inference`: the host dispatches once per REQUEST, not
    once per 4 frames, so wall time is independent of host<->device dispatch
    latency (a remote-TPU transport costs tens of ms per dispatch — 512
    frames would otherwise pay ~128 of them).  The loop early-exits on the
    first chunk boundary where every lane is done, preserving the
    reference's EOS `break` (engine.rs:558-561) at chunk granularity —
    exactly like the host loop it replaces.

    codec_params None -> codes-only (the ONNX-codec path decodes after);
    else the codec decode is fused per chunk and wav is written into a
    preallocated [B, F*spf] buffer.

    `budgets` [B] int32 (traced) are per-lane frame budgets <= max_frames
    (wave batching: each request carries its own); a lane is done when it
    hits EOS or its budget, and the loop exits when every lane is done.

    Returns (state, dec_state, codes [B, F, 16], valid [B, F],
    wav [B, F*spf] or None, frames_done scalar, saw_eos [B] bool) with
    F = max_frames rounded up to a whole number of chunks; columns >=
    budgets[lane] are always flagged invalid so the frame budget is exact.
    saw_eos[i] is True iff lane i actually sampled EOS (as opposed to
    exhausting its frame budget) — the chunked host loop's `saw_eos`
    equivalent, so BatchResult.eos agrees between the two paths even when
    EOS lands exactly on the budget boundary.
    """
    from ..models.codec import decoder as codec_decoder

    b = state.hidden.shape[0]
    if budgets is None:
        budgets = max_frames
    budgets = jnp.broadcast_to(jnp.asarray(budgets, jnp.int32), (b,))
    n_chunks = -(-max_frames // chunk)
    f_cap = n_chunks * chunk
    with_audio = codec_params is not None
    spf = cfg.codec_decoder.samples_per_frame if with_audio else 0

    codes_buf = jnp.zeros((b, f_cap, P.NUM_CODEBOOKS), jnp.int32)
    valid_buf = jnp.zeros((b, f_cap), bool)
    wav_buf = (jnp.zeros((b, f_cap * spf), jnp.float32) if with_audio
               else jnp.zeros((b, 0), jnp.float32))
    saw_eos0 = jnp.zeros((b,), bool)

    def cond(carry):
        ci, state, *_ = carry
        return (ci < n_chunks) & ~jnp.all(state.done)

    def body(carry):
        ci, state, dec_state, codes_buf, valid_buf, wav_buf, saw_eos = carry
        prev_done = state.done
        state, codes, valid = gen_frames(
            cfg, talker_params, predictor_params, assets_pack, state,
            sampler, chunk, prompt_cap, uniform_cursor)
        # gen_frames only flips `done` on a sampled EOS, so lanes newly done
        # this chunk are exactly the lanes that hit EOS (budget-done lanes
        # were already marked below in a previous iteration).
        saw_eos = saw_eos | (state.done & ~prev_done)
        codes_buf = jax.lax.dynamic_update_slice(
            codes_buf, codes, (0, ci * chunk, 0))
        valid_buf = jax.lax.dynamic_update_slice(
            valid_buf, valid, (0, ci * chunk))
        if with_audio:
            wav, dec_state = codec_decoder.decode_chunk(
                cfg.codec_decoder, codec_params, codes, dec_state)
            wav_buf = jax.lax.dynamic_update_slice(
                wav_buf, wav.astype(jnp.float32), (0, ci * chunk * spf))
        # a lane that exhausted its own budget is done (stops the loop as
        # soon as every lane is done — EOS or budget, whichever first)
        state = state.replace(done=state.done | ((ci + 1) * chunk >= budgets))
        return ci + 1, state, dec_state, codes_buf, valid_buf, wav_buf, saw_eos

    (ci, state, dec_state, codes_buf, valid_buf, wav_buf,
     saw_eos) = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), state, dec_state, codes_buf, valid_buf,
         wav_buf, saw_eos0))
    # exact per-lane frame budget: columns past a lane's budget never count
    valid_buf = valid_buf & (jnp.arange(f_cap)[None, :] < budgets[:, None])
    return (state, dec_state, codes_buf, valid_buf,
            wav_buf if with_audio else None, ci * chunk, saw_eos)


class Generator:
    """Compiled-function holder: jits prefill and the chunked frame loop once
    per (batch, prompt_cap) signature and keeps donation-friendly wrappers."""

    def __init__(self, cfg: EngineConfig, talker_params, predictor_params,
                 assets_pack, codec_params=None):
        self.cfg = cfg
        self.talker_params = talker_params
        self.predictor_params = predictor_params
        self.assets_pack = assets_pack
        self.codec_params = codec_params

        # Fused-talker modes that transform weights (int4 repack / bf16
        # dequant) pre-pack ONCE here; int8/w8a8 pass the int8 tensors
        # through untouched so they need no copy.  The packed pytree rides
        # inside talker_params under "fused_<mode>" where
        # kernels.talker_step.talker_step_fused picks it up.
        from ..kernels.talker_step import fused_mode as _fused_mode
        _mode = _fused_mode()
        if _mode in ("bf16", "w4a8"):
            from ..kernels import talker_step as _ts
            if _ts.supported(cfg.talker, 1, _mode):
                self.talker_params = dict(talker_params)
                self.talker_params["fused_" + _mode] = jax.jit(
                    functools.partial(_ts.prep_layer_weights, cfg.talker,
                                      weights=_mode))(talker_params)

        # Chunk megakernel prep (QTTS_FUSED_CHUNK=1): predictor weights in
        # resident w4a8 form + the static extras (codec head slice, proj,
        # tables, rope rows).  Packed once here; gen_frames routes through
        # kernels/chunk_step when the pack is present and the per-call
        # gates (batch 1/8/16, uniform cursor, 1..8 frames) hold.
        from ..kernels import chunk_step as _cs
        if (_mode == "w4a8" and _cs.chunk_mode()
                and _cs.supported(cfg.talker, cfg.predictor, 1,
                                  cfg.runtime.frames_per_chunk)):
            pred_w = jax.jit(functools.partial(
                _cs.prep_predictor_w4, cfg.predictor))(predictor_params)
            extras = _cs.prep_chunk_extras(
                cfg.talker, cfg.predictor, talker_params, predictor_params,
                assets_pack)
            self.talker_params = dict(self.talker_params)
            self.talker_params["chunk"] = {"pred_w": pred_w,
                                           "extras": extras}

        self._prefill = jax.jit(
            functools.partial(prefill, cfg), static_argnames=())
        donate = ("state",) if cfg.runtime.donate_cache else ()
        self._gen_chunk = jax.jit(
            functools.partial(gen_frames, cfg),
            static_argnames=("n_frames", "prompt_cap", "uniform_cursor"),
            donate_argnames=donate,
        )
        self._gen_chunk_audio = jax.jit(
            functools.partial(gen_frames_with_audio, cfg),
            static_argnames=("n_frames", "prompt_cap", "uniform_cursor"),
            donate_argnames=(donate + ("dec_state",)
                             if cfg.runtime.donate_cache else ()),
        )

    def start(self, embeds: jnp.ndarray, lengths, key) -> GenState:
        return self._prefill(self.talker_params, embeds,
                             jnp.asarray(lengths, jnp.int32), key)

    def start_from_plans(self, text_table, codec_tables, text_idx,
                         codec_idx, frame_slot, spk_flag, frames, spk_emb,
                         lengths, key) -> GenState:
        """Fused prompt-assembly + prefill: ONE device program per request
        instead of assemble-then-prefill (saves a dispatch round-trip and
        never materializes the [B, bucket, 2048] prompt in HBM between
        programs).  Args are the stacked padded plan arrays of
        engine.prompt_to_device."""
        if not hasattr(self, "_prefill_from_plans"):
            from ..prompt import assemble as _assemble

            def f(talker_params, text_table, codec_tables, ti, ci, fs, sf,
                  fr, se, lengths, key):
                embeds = jax.vmap(
                    _assemble, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0))(
                    text_table, codec_tables, ti, ci, fs, sf, fr, se,
                    lengths)
                return prefill(self.cfg, talker_params, embeds, lengths,
                               key)

            self._prefill_from_plans = jax.jit(f)
        return self._prefill_from_plans(
            self.talker_params, text_table, codec_tables, text_idx,
            codec_idx, frame_slot, spk_flag, frames, spk_emb,
            jnp.asarray(lengths, jnp.int32), key)

    def _fused_start_ok(self, b: int) -> bool:
        """Single-program wave start pays off only at small batch: fusing
        prefill+chunk+codec saves one dispatch+sync round-trip (~15-30 ms
        on remote-TPU transports, the dominant term at b=1) but XLA
        schedules the combined module measurably worse at batch — measured
        b=8: 69 vs 74 ms, b=16: 86 vs 94, b=32: 144 vs 169 (two-program vs
        fused, min of 4) with far higher fused variance.  Above the
        threshold the same API runs the two-program schedule."""
        import os
        return b <= int(os.environ.get("QTTS_FUSED_START_MAX_B", "2"))

    def start_first_chunk(self, embeds, lengths, key, dec_state,
                          sampler: SamplerParams, prompt_cap: int,
                          n_frames: int = 1):
        """Prefill + the first n_frames + codec first chunk; at small batch
        this is ONE device program, so TTFT pays a single dispatch + host
        sync round-trip instead of two of each (the reference cannot fuse
        these at all — prefill and decode are separate llama_decode calls
        with a thread channel to the codec, engine.rs:457-543).  At larger
        batch the two-program schedule wins (see _fused_start_ok) and is
        selected automatically.  Returns (state, dec_state, codes, valid,
        wav)."""
        if not self._fused_start_ok(int(embeds.shape[0])):
            state = self.start(embeds, lengths, key)
            return self.chunk_with_audio(state, dec_state, sampler,
                                         prompt_cap=prompt_cap,
                                         n_frames=n_frames)
        if not hasattr(self, "_start_first"):
            def f(tp, pp, pack, cp, embeds, lengths, key, dec_state,
                  sampler, n_frames, prompt_cap):
                state = prefill(self.cfg, tp, embeds, lengths, key)
                return gen_frames_with_audio(
                    self.cfg, tp, pp, pack, cp, state, dec_state, sampler,
                    n_frames=n_frames, prompt_cap=prompt_cap)

            self._start_first = jax.jit(
                f, static_argnames=("n_frames", "prompt_cap"))
        return self._start_first(
            self.talker_params, self.predictor_params, self.assets_pack,
            self.codec_params, embeds, jnp.asarray(lengths, jnp.int32),
            key, dec_state, sampler, n_frames=n_frames,
            prompt_cap=prompt_cap)

    def start_plans_first_chunk(self, text_table, codec_tables, text_idx,
                                codec_idx, frame_slot, spk_flag, frames,
                                spk_emb, lengths, key, dec_state,
                                sampler: SamplerParams, prompt_cap: int,
                                n_frames: int = 1):
        """Whole wave start: prompt assembly + prefill + first n_frames +
        codec first chunk (the plans variant of start_first_chunk;
        engine.stream_batch's first dispatch).  ONE device program at small
        batch, fused-assembly-prefill + chunk at larger batch (see
        _fused_start_ok).  Returns (state, dec_state, codes, valid, wav)."""
        if not self._fused_start_ok(int(text_idx.shape[0])):
            state = self.start_from_plans(
                text_table, codec_tables, text_idx, codec_idx, frame_slot,
                spk_flag, frames, spk_emb, lengths, key)
            return self.chunk_with_audio(state, dec_state, sampler,
                                         prompt_cap=prompt_cap,
                                         n_frames=n_frames)
        if not hasattr(self, "_start_plans_first"):
            from ..prompt import assemble as _assemble

            def f(tp, pp, pack, cp, text_table, codec_tables, ti, ci, fs,
                  sf, fr, se, lengths, key, dec_state, sampler, n_frames,
                  prompt_cap):
                embeds = jax.vmap(
                    _assemble, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0))(
                    text_table, codec_tables, ti, ci, fs, sf, fr, se,
                    lengths)
                state = prefill(self.cfg, tp, embeds, lengths, key)
                return gen_frames_with_audio(
                    self.cfg, tp, pp, pack, cp, state, dec_state, sampler,
                    n_frames=n_frames, prompt_cap=prompt_cap)

            self._start_plans_first = jax.jit(
                f, static_argnames=("n_frames", "prompt_cap"))
        return self._start_plans_first(
            self.talker_params, self.predictor_params, self.assets_pack,
            self.codec_params, text_table, codec_tables, text_idx,
            codec_idx, frame_slot, spk_flag, frames, spk_emb,
            jnp.asarray(lengths, jnp.int32), key, dec_state, sampler,
            n_frames=n_frames, prompt_cap=prompt_cap)

    def start_with_prefix(self, prefix_k, prefix_v, prefix_len,
                          suffix_embeds, suffix_lengths, key,
                          total_bucket: int) -> GenState:
        """Prefill reusing a cached prompt-prefix KV (see
        prefill_with_prefix).  total_bucket must be the prompt_cap the
        decode chunks will use."""
        if not hasattr(self, "_prefill_prefix"):
            self._prefill_prefix = jax.jit(
                functools.partial(prefill_with_prefix, self.cfg),
                static_argnames=("total_bucket",))
        return self._prefill_prefix(
            self.talker_params, prefix_k, prefix_v,
            jnp.asarray(prefix_len, jnp.int32), suffix_embeds,
            jnp.asarray(suffix_lengths, jnp.int32), key,
            total_bucket=total_bucket)

    def start_with_prefix_from_plans(self, prefix_k, prefix_v, prefix_len,
                                     text_table, codec_tables, text_idx,
                                     codec_idx, frame_slot, spk_flag,
                                     frames, spk_emb, suffix_lengths, key,
                                     total_bucket: int) -> GenState:
        """Fused suffix assembly + continued prefill (see
        prefill_with_prefix): one device program for a prefix-cache start."""
        if not hasattr(self, "_prefix_from_plans"):
            from ..prompt import assemble as _assemble

            def f(talker_params, prefix_k, prefix_v, prefix_len, text_table,
                  codec_tables, ti, ci, fs, sf, fr, se, lengths, key,
                  total_bucket):
                embeds = jax.vmap(
                    _assemble, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0))(
                    text_table, codec_tables, ti, ci, fs, sf, fr, se,
                    lengths)
                return prefill_with_prefix(
                    self.cfg, talker_params, prefix_k, prefix_v, prefix_len,
                    embeds, lengths, key, total_bucket)

            self._prefix_from_plans = jax.jit(
                f, static_argnames=("total_bucket",))
        return self._prefix_from_plans(
            self.talker_params, prefix_k, prefix_v,
            jnp.asarray(prefix_len, jnp.int32), text_table, codec_tables,
            text_idx, codec_idx, frame_slot, spk_flag, frames, spk_emb,
            jnp.asarray(suffix_lengths, jnp.int32), key,
            total_bucket=total_bucket)

    def refill_lane(self, state: GenState, embeds_1: jnp.ndarray, length,
                    lane) -> GenState:
        """Prefill lane `lane` with a new [S_max, 2048] prompt."""
        if not hasattr(self, "_prefill_lane"):
            self._prefill_lane = jax.jit(
                functools.partial(prefill_lane, self.cfg),
                donate_argnames=("state",)
                if self.cfg.runtime.donate_cache else ())
        return self._prefill_lane(self.talker_params, embeds_1,
                                  jnp.asarray(length, jnp.int32),
                                  jnp.asarray(lane, jnp.int32), state)

    def refill_lanes(self, state: GenState, embeds_r: jnp.ndarray, lengths,
                     lanes, pad_to: int = None) -> GenState:
        """Batched refill: prefill len(lanes) lanes in ONE device program.
        embeds_r: [R, S_max, 2048]; lengths/lanes: length-R sequences.  R is
        padded by repeating row 0 (duplicate lane writes of identical data —
        safe, see prefill_lanes): to `pad_to` when given (schedulers pass
        their batch size so the refill program has ONE signature per bucket
        — a mid-run Mosaic/XLA compile on a remote tunnel costs more than a
        full-width prefill ever will), else to the next power of two."""
        import numpy as np
        r = int(embeds_r.shape[0])
        rp = pad_to if pad_to is not None else 1 << (r - 1).bit_length()
        assert rp >= r, f"pad_to {rp} < refill group {r}"
        lengths = np.asarray(lengths, np.int32)
        lanes = np.asarray(lanes, np.int32)
        if rp != r:
            pad = rp - r
            embeds_r = jnp.concatenate(
                [embeds_r, jnp.broadcast_to(embeds_r[:1],
                                            (pad,) + embeds_r.shape[1:])])
            lengths = np.concatenate([lengths, np.repeat(lengths[:1], pad)])
            lanes = np.concatenate([lanes, np.repeat(lanes[:1], pad)])
        if not hasattr(self, "_prefill_lanes"):
            self._prefill_lanes = jax.jit(
                functools.partial(prefill_lanes, self.cfg),
                donate_argnames=("state",)
                if self.cfg.runtime.donate_cache else ())
        return self._prefill_lanes(self.talker_params, embeds_r,
                                   jnp.asarray(lengths), jnp.asarray(lanes),
                                   state)

    def chunk(self, state: GenState, sampler: SamplerParams, prompt_cap: int,
              n_frames: int = None, uniform_cursor: bool = True):
        n = n_frames or self.cfg.runtime.frames_per_chunk
        return self._gen_chunk(self.talker_params, self.predictor_params,
                               self.assets_pack, state, sampler,
                               n_frames=n, prompt_cap=prompt_cap,
                               uniform_cursor=uniform_cursor)

    def run_bulk(self, state: GenState, dec_state, sampler: SamplerParams,
                 prompt_cap: int, max_frames: int, n_frames: int = None,
                 budgets=None, uniform_cursor: bool = True):
        """One-dispatch whole-request generation (see _gen_bulk).  With
        codec_params fused codec decode is included; otherwise pass
        dec_state=0 and wav comes back None (ONNX-codec path).  budgets:
        optional [B] per-lane frame budgets (default max_frames).
        Returns (state, dec_state, codes, valid, wav, frames_done,
        saw_eos)."""
        n = n_frames or self.cfg.runtime.frames_per_chunk
        if budgets is None:
            budgets = jnp.int32(max_frames)
        if not hasattr(self, "_gen_bulk"):
            donate = (("state", "dec_state")
                      if self.cfg.runtime.donate_cache else ())
            self._gen_bulk = jax.jit(
                functools.partial(_gen_bulk, self.cfg),
                static_argnames=("max_frames", "chunk", "prompt_cap",
                                 "uniform_cursor"),
                donate_argnames=donate)
        return self._gen_bulk(
            self.talker_params, self.predictor_params, self.assets_pack,
            self.codec_params, state, dec_state, sampler,
            jnp.asarray(budgets, jnp.int32),
            max_frames=max_frames, chunk=n, prompt_cap=prompt_cap,
            uniform_cursor=uniform_cursor)

    def run_bulk_codes(self, state: GenState, sampler: SamplerParams,
                       prompt_cap: int, max_frames: int, n_frames: int = None,
                       budgets=None, uniform_cursor: bool = True):
        """Codes-only bulk generation (the codec runs separately — ONNX
        path).  Returns (state, codes, valid, frames_done, saw_eos)."""
        n = n_frames or self.cfg.runtime.frames_per_chunk
        if budgets is None:
            budgets = jnp.int32(max_frames)
        if not hasattr(self, "_gen_bulk_codes"):
            donate = ("state",) if self.cfg.runtime.donate_cache else ()
            self._gen_bulk_codes = jax.jit(
                functools.partial(_gen_bulk, self.cfg, codec_params=None),
                static_argnames=("max_frames", "chunk", "prompt_cap",
                                 "uniform_cursor"),
                donate_argnames=donate)
        state, _, codes, valid, _, done, saw_eos = self._gen_bulk_codes(
            self.talker_params, self.predictor_params, self.assets_pack,
            state=state, dec_state=jnp.zeros(()), sampler=sampler,
            budgets=jnp.asarray(budgets, jnp.int32),
            max_frames=max_frames, chunk=n, prompt_cap=prompt_cap,
            uniform_cursor=uniform_cursor)
        return state, codes, valid, done, saw_eos

    def chunk_with_audio(self, state: GenState, dec_state,
                         sampler: SamplerParams, prompt_cap: int,
                         n_frames: int = None, uniform_cursor: bool = True):
        if self.codec_params is None:
            raise ValueError("Generator built without codec_params")
        n = n_frames or self.cfg.runtime.frames_per_chunk
        return self._gen_chunk_audio(
            self.talker_params, self.predictor_params, self.assets_pack,
            self.codec_params, state, dec_state, sampler,
            n_frames=n, prompt_cap=prompt_cap,
            uniform_cursor=uniform_cursor)
