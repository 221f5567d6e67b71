"""Shared Qwen3-style decoder core for the talker and predictor.

Pure-functional: parameters are pytrees of stacked per-layer arrays and the
forward pass scans over layers (one `lax.scan`, compiler-friendly for 28
layers).  Architecture: pre-RMSNorm, GQA with per-head q/k RMSNorm (Qwen3),
rotary embeddings supplied by the caller (M-RoPE for the talker, standard
RoPE for the predictor), SwiGLU MLP.  The KV cache has a static capacity;
variable prompt lengths are handled by attention masking (see ops.attention).

Equivalent role to the llama.cpp decode path used by the reference
(/root/reference/src/models/llama/mod.rs via engine.rs:457-641), redesigned
for XLA: no host round-trips, static shapes, bf16 matmuls on the MXU.
"""

from __future__ import annotations

import os as _os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.attention import gqa_attend, history_mask, update_cache
from ..ops.norms import rms_norm
from ..ops.quant import matmul as _mm
from ..ops.quant import matmul_a8 as _mm_a8


@struct.dataclass
class KVCache:
    """Per-lane write cursors make the cache refill-friendly: a lane handed a
    new stream (continuous batching) restarts its cursor at prompt_cap and
    overwrites its own old decode slots — stale history is masked by the
    causal `slot <= cursor` predicate, and capacity never grows with the
    number of refills (one stream's budget bounds it statically)."""

    k: jnp.ndarray          # [L, B, Hkv, C, Dh]
    v: jnp.ndarray          # [L, B, Hkv, C, Dh]
    write_idx: jnp.ndarray  # [B] int32: next free slot per lane
    lengths: jnp.ndarray    # [B] int32: true prompt lengths (for masking)

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


def init_kv_cache(cfg, batch: int, capacity: int, dtype) -> KVCache:
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, capacity, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        write_idx=jnp.zeros((batch,), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def init_decoder_params(cfg, key: jax.Array) -> Dict[str, Any]:
    """Random-init decoder weights (stacked [L, ...]); used when no GGUF
    checkpoint is present (development / benchmarking mode)."""
    dtype = jnp.dtype(cfg.dtype)
    d, f, l = cfg.d_model, cfg.d_ff, cfg.n_layers
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    k = iter(jax.random.split(key, 8))
    s_attn = d ** -0.5
    s_ff = f ** -0.5

    def rnd(rng, shape, scale):
        return (jax.random.normal(rng, shape, jnp.float32) * scale).astype(dtype)

    # qkv and gate/up are stored FUSED along the output-feature axis: one
    # matmul instead of three (resp. two) per layer — decode steps are so
    # small that per-op overhead, not FLOPs, dominates them.
    return {
        "layers": {
            "ln1": jnp.ones((l, d), dtype),
            "ln2": jnp.ones((l, d), dtype),
            "wqkv": rnd(next(k), (l, d, (h + 2 * hkv) * dh), s_attn),
            "wo": rnd(next(k), (l, h * dh, d), (h * dh) ** -0.5),
            "q_norm": jnp.ones((l, dh), dtype),
            "k_norm": jnp.ones((l, dh), dtype),
            "w_gate_up": rnd(next(k), (l, d, 2 * f), s_attn),
            "w_down": rnd(next(k), (l, f, d), s_ff),
        },
        "final_norm": jnp.ones((d,), dtype),
    }


def decoder_forward(cfg, params: Dict[str, Any], x: jnp.ndarray,
                    cos: jnp.ndarray, sin: jnp.ndarray, cache: KVCache,
                    prompt_cap: int,
                    uniform_cursor: bool = True,
                    a8: bool = False,
                    full_prefix: bool = False) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder over S new tokens.

    x: [B, S, D] input embeddings; cos/sin: [B, S, Dh] rotary tables for the
    new positions; cache: KVCache whose write_idx marks where these tokens go.
    uniform_cursor (static): all lanes share one cursor value — the common
    case (single stream / wave batching); enables a cheap slice update
    instead of a per-lane scatter.  Continuous batching passes False.
    full_prefix (static): multi-token calls normally window attention to
    [0, max(prompt_cap, s)) because prefill has no decode history; a
    MID-DECODE multi-token forward (speculative-decoding verify step,
    runtime/spec.py — DESIGN §12 prerequisite (a)) passes True so the new
    rows attend the whole live prefix (prompt + generated slots), gated by
    the same per-lane length/cursor/causal predicates as decode steps.
    Returns (hidden [B, S, D] after final norm, updated cache).
    """
    b, s, d = x.shape
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    start = cache.write_idx
    write_at = cache.write_idx[0] if uniform_cursor else cache.write_idx
    # Pallas flash-decode for single-token steps on TPU: reads only the live
    # prefix of the cache from HBM (see kernels/flash_decode.py).
    from ..kernels.flash_decode import use_flash_decode

    # Whole-step Pallas megakernel (all layers, streamed weights, fused
    # flash attention): one launch instead of 28 (kernels/talker_step.py).
    # QTTS_FUSED_TALKER selects the weight mode: "1"/"int8" = int8 weights
    # cast in VMEM (exact ops.quant numerics; ~21 min Mosaic compile),
    # "w8a8" = int8 activations x int8 weights on the MXU (Q8_0-class
    # numerics, compiles ~2x faster), "w4a8" = half-split packed int4
    # weights x int8 activations (halves the weight stream again; Q4-class
    # numerics — DEFAULT on TPU, see kernels.talker_step.fused_mode),
    # "bf16" = pre-dequantized (small program, 2x stream), "0" = XLA path.
    import os as _os
    from ..kernels.talker_step import fused_mode as _fused_mode
    _mode = _fused_mode()
    # The megakernel covers BOTH cursor regimes: uniform (single stream /
    # wave batching; scalar write cursor, one fused dus append) and
    # per-lane (continuous batching; lane-wise validity masks + the
    # aligned-window RMW append of flash_decode.append_kv_lanes).
    if (s == 1 and use_flash_decode() and _mode is not None
            and (uniform_cursor or cache.k.shape[3] % 8 == 0)):
        from ..kernels import talker_step as _ts
        if _ts.supported(cfg, b, _mode):
            hidden1, k_new, v_new = _ts.talker_step_fused(
                cfg, params, x[:, 0], cos[:, 0], sin[:, 0],
                cache.k, cache.v, cache.lengths, write_at, prompt_cap,
                weights=_mode)
            hidden = rms_norm(hidden1[:, None, :], params["final_norm"],
                              cfg.rms_eps)
            new_cache = cache.replace(k=k_new, v=v_new,
                                      write_idx=start + jnp.int32(1))
            return hidden, new_cache
    # head_dim must fill whole 128-wide lanes: Mosaic rejects cache slices
    # whose last dim is narrower (tiny test configs use dh=16).
    use_flash = (s == 1 and getattr(cfg, "flash_decode", True)
                 and cfg.head_dim % 128 == 0 and use_flash_decode())

    # Carry-KV decode: the stacked cache rides the layer scan's CARRY and is
    # updated with one-slot writes, instead of flowing through scan xs/ys
    # (which materializes full-capacity copies of k and v every layer, every
    # step — at batch 32 several GB of HBM traffic per frame, the measured
    # reason per-stream RTF scaled ~linearly with batch).  Numerics are
    # identical to the xs/ys path (same ops in the same order).
    if s == 1 and _os.environ.get("QTTS_CARRY_KV", "1") != "0":
        return _decode_step_carry(cfg, params, x, cos, sin, cache,
                                  prompt_cap, write_at, use_flash)
    # Prefill (s > 1) only ever has live keys in slots [0, prompt_cap):
    # score against that static window instead of the full capacity
    # (bucket + max_steps slots) — a 3-8x cut of prefill attention
    # FLOPs/softmax width, straight off batched TTFT.  Masked-away slots
    # are zero/invalid either way, so numerics are unchanged.
    # The window must also cover the S rows being written this call: the
    # predictor's per-frame prefill passes prompt_cap=0 (its rows are
    # generated slots at [0, s), not prompt), so clamping to prompt_cap
    # alone would zero its attention.  max(prompt_cap, s) covers both
    # layouts — fresh prefill writes [0, s) and suffix prefill ends at or
    # below prompt_cap by construction.
    attn_win = cache.capacity if (s == 1 or full_prefix) \
        else min(max(prompt_cap, s), cache.capacity)
    mask = (None if use_flash else
            history_mask(cache.lengths, prompt_cap, start, s, attn_win))

    # Prompt-prefill matmuls run a8w8 (int8 activations x int8 weights)
    # when the caller opts in (a8=True — the talker's prompt prefill and
    # the prefix-cache suffix prefill): 1.45x the dequant-into-the-dot
    # throughput on v5e, Q8_0-class activation noise — the same class the
    # fused talker decode already applies.  QTTS_A8_PREFILL=0 restores
    # exact deq-bf16 numerics.  Decode steps (s == 1) keep the
    # bandwidth-optimal dequant path, and the predictor's tiny per-frame
    # prefill (s=2) stays exact: there is nothing to win at 2 rows and the
    # fused predictor kernel's exact-match parity must hold.
    mm = (_mm_a8 if s > 1 and a8
          and _os.environ.get("QTTS_A8_PREFILL", "1") != "0" else _mm)

    # Carry-KV prefill: same restructure as _decode_step_carry, for the
    # s > 1 case — the stacked cache threads through the scan carry
    # (in-place S-row dynamic_update_slice per layer; attention reads
    # only the [0, attn_win) window slice) instead of riding xs/ys.
    # Measured (v5e, a8, CAP=1024): b=32 87 vs 90 ms, b=48 parity —
    # XLA largely elides the ys restack in prefill (unlike decode,
    # where the carry rework was 2.3x at batch 32) — but the carry
    # form halves peak cache memory (no input+ys-stack double
    # residency), which is what bounds lanes/chip at big batch.
    # Outputs match the xs/ys path to fp32 fusion-rounding noise
    # (~2e-6, tests/test_models.py::test_prefill_carry_parity).
    # QTTS_CARRY_KV=0 restores xs/ys plumbing for prefill AND decode.
    if s > 1 and _os.environ.get("QTTS_CARRY_KV", "1") != "0":
        return _prefill_carry(cfg, params, x, cos, sin, cache, prompt_cap,
                              write_at, attn_win, mask, mm)

    def layer_fn(carry, layer):
        xx = carry
        p, k_cache, v_cache = layer
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        qkv = mm(hn, p["wqkv"])
        q = qkv[..., : h * dh].reshape(b, s, h, dh)
        kk = qkv[..., h * dh: (h + hkv) * dh].reshape(b, s, hkv, dh)
        vv = qkv[..., (h + hkv) * dh:].reshape(b, s, hkv, dh)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            kk = rms_norm(kk, p["k_norm"], cfg.rms_eps)
        q = _rope(q, cos, sin)
        kk = _rope(kk, cos, sin)
        k_cache = update_cache(k_cache, kk, write_at)
        v_cache = update_cache(v_cache, vv, write_at)
        if use_flash:
            from ..kernels.flash_decode import flash_gqa_decode
            attn = flash_gqa_decode(q[:, 0], k_cache, v_cache, cache.lengths,
                                    start, prompt_cap)[:, None]
            attn = attn.reshape(b, s, h * dh)
        else:
            attn = gqa_attend(q, k_cache[:, :, :attn_win],
                              v_cache[:, :, :attn_win],
                              mask).reshape(b, s, h * dh)
        xx = xx + mm(attn, p["wo"])
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        gu = mm(hn, p["w_gate_up"])
        f_half = gu.shape[-1] // 2
        ff = jax.nn.silu(gu[..., :f_half]) * gu[..., f_half:]
        xx = xx + mm(ff, p["w_down"])
        return xx, (k_cache, v_cache)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v),
        unroll=getattr(cfg, "layer_scan_unroll", 1))
    hidden = rms_norm(x, params["final_norm"], cfg.rms_eps)
    new_cache = cache.replace(k=new_k, v=new_v,
                              write_idx=start + jnp.int32(s))
    return hidden, new_cache


def _prefill_carry(cfg, params: Dict[str, Any], x: jnp.ndarray,
                   cos: jnp.ndarray, sin: jnp.ndarray, cache: KVCache,
                   prompt_cap: int, write_at, attn_win: int, mask,
                   mm) -> Tuple[jnp.ndarray, KVCache]:
    """Multi-token prefill with the stacked KV cache as a scan CARRY.

    Mirror of `_decode_step_carry` for S > 1: the [L, B, Hkv, C, Dh]
    cache threads through the layer scan's carry (XLA aliases loop
    carries in place), each layer appends its S rows with one
    dynamic_update_slice (scalar cursor — fresh prefill) or a per-lane
    scatter (suffix prefill continuing a prefix at per-lane offsets),
    and attention reads only the [0, attn_win) window of the current
    layer.  Versus the xs/ys scan this removes a full-capacity restack
    of k and v per layer: at 96 lanes x capacity 1024 that is ~11 GB of
    HBM copies per prefill — measured, though, XLA already elides most
    of it (b=32: 87 vs 90 ms; b=48 parity), so the carry form's real
    value is halved peak cache residency (input + ys stack never
    co-exist) and plumbing symmetry with _decode_step_carry.  Ops and
    order are identical to the xs/ys path; outputs agree to fp32
    fusion-rounding noise (~2e-6)."""
    b, s, d = x.shape
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    L = cfg.n_layers
    scalar_cursor = jnp.ndim(write_at) == 0
    if not scalar_cursor:
        write_vec = jnp.asarray(write_at, jnp.int32)
        bi = jnp.arange(b)[:, None]                        # [B, 1]
        slots = write_vec[:, None] + jnp.arange(s)[None, :]  # [B, S]

    # Flash prefill attention (kernels/flash_prefill): scores never touch
    # HBM and causally-dead K/V chunks are skipped — measured 16 ms of the
    # 90 ms b=32 prefill was XLA's materialized-scores attention.
    from ..kernels.flash_prefill import flash_gqa_prefill_stacked
    from ..kernels.flash_prefill import supported as _fp_supported
    from ..kernels.flash_prefill import use_flash_prefill
    flash_ok = (use_flash_prefill()
                and _fp_supported(s, attn_win, h, hkv, dh)
                and attn_win <= cache.capacity)

    def layer_fn(carry, inputs):
        xx, k_all, v_all = carry
        l, p = inputs
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        qkv = mm(hn, p["wqkv"])
        q = qkv[..., : h * dh].reshape(b, s, h, dh)
        kk = qkv[..., h * dh: (h + hkv) * dh].reshape(b, s, hkv, dh)
        vv = qkv[..., (h + hkv) * dh:].reshape(b, s, hkv, dh)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            kk = rms_norm(kk, p["k_norm"], cfg.rms_eps)
        q = _rope(q, cos, sin)
        kk = _rope(kk, cos, sin)
        if scalar_cursor:
            k_new = jnp.swapaxes(kk, 1, 2).astype(k_all.dtype)  # [B,Hkv,S,Dh]
            v_new = jnp.swapaxes(vv, 1, 2).astype(v_all.dtype)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[None], (l, 0, 0, write_at, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[None], (l, 0, 0, write_at, 0))
        else:
            # advanced-index scatter: value layout [B, S, Hkv, Dh] = kk
            k_all = k_all.at[l, bi, :, slots, :].set(kk.astype(k_all.dtype))
            v_all = v_all.at[l, bi, :, slots, :].set(vv.astype(v_all.dtype))
        if flash_ok:
            attn = flash_gqa_prefill_stacked(
                q, k_all, v_all, cache.lengths, write_at, l, prompt_cap,
                attn_win).reshape(b, s, h * dh)
        else:
            k_win = jax.lax.dynamic_slice(
                k_all, (l, 0, 0, 0, 0), (1, b, hkv, attn_win, dh))[0]
            v_win = jax.lax.dynamic_slice(
                v_all, (l, 0, 0, 0, 0), (1, b, hkv, attn_win, dh))[0]
            attn = gqa_attend(q, k_win, v_win, mask).reshape(b, s, h * dh)
        xx = xx + mm(attn, p["wo"])
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        gu = mm(hn, p["w_gate_up"])
        f_half = gu.shape[-1] // 2
        ff = jax.nn.silu(gu[..., :f_half]) * gu[..., f_half:]
        xx = xx + mm(ff, p["w_down"])
        return (xx, k_all, v_all), None

    (x, new_k, new_v), _ = jax.lax.scan(
        layer_fn, (x, cache.k, cache.v),
        (jnp.arange(L, dtype=jnp.int32), params["layers"]),
        unroll=getattr(cfg, "layer_scan_unroll", 1))
    hidden = rms_norm(x, params["final_norm"], cfg.rms_eps)
    new_cache = cache.replace(k=new_k, v=new_v,
                              write_idx=cache.write_idx + jnp.int32(s))
    return hidden, new_cache


def _decode_step_carry(cfg, params: Dict[str, Any], x: jnp.ndarray,
                       cos: jnp.ndarray, sin: jnp.ndarray, cache: KVCache,
                       prompt_cap: int, write_at,
                       use_flash: bool) -> Tuple[jnp.ndarray, KVCache]:
    """Single-token decode with the stacked KV cache as a scan CARRY.

    The xs/ys layer scan of `decoder_forward` makes XLA materialize a fresh
    full-capacity copy of k and v per layer per step (the ys stack), which
    is pure HBM traffic that scales with batch x capacity; at batch 32 it
    dominates the frame (~GB/frame).  Here the [L, B, Hkv, C, Dh] arrays
    thread through the loop carry — XLA aliases while-loop carries in
    place — and each layer does a ONE-SLOT dynamic_update_slice append.
    Attention reads the live prefix through the stacked-cache flash kernel
    (kernels/flash_decode.flash_gqa_decode_stacked) so the per-layer cache
    slice is never materialized either; off TPU it falls back to a per-layer
    dynamic slice + masked XLA attention (correctness path for tests).
    """
    b, s, d = x.shape
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    L = cfg.n_layers
    start = cache.write_idx
    write_vec = jnp.broadcast_to(jnp.asarray(write_at, jnp.int32), (b,))
    scalar_cursor = jnp.ndim(write_at) == 0

    from ..kernels.flash_decode import CHUNK as _FLASH_CHUNK
    from ..kernels.flash_decode import flash_gqa_decode_stacked
    flash_ok = use_flash and cache.capacity % _FLASH_CHUNK == 0
    mask = (None if flash_ok else
            history_mask(cache.lengths, prompt_cap, start, s,
                         cache.capacity))

    def layer_fn(carry, inputs):
        xx, k_all, v_all = carry
        l, p = inputs
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        qkv = _mm(hn, p["wqkv"])
        q = qkv[..., : h * dh].reshape(b, s, h, dh)
        kk = qkv[..., h * dh: (h + hkv) * dh].reshape(b, s, hkv, dh)
        vv = qkv[..., (h + hkv) * dh:].reshape(b, s, hkv, dh)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            kk = rms_norm(kk, p["k_norm"], cfg.rms_eps)
        q = _rope(q, cos, sin)
        kk = _rope(kk, cos, sin)

        # one-slot append into the carried stacked cache (in place)
        k_new = jnp.swapaxes(kk, 1, 2).astype(k_all.dtype)  # [B, Hkv, 1, Dh]
        v_new = jnp.swapaxes(vv, 1, 2).astype(v_all.dtype)
        if not scalar_cursor and flash_ok \
                and _os.environ.get("QTTS_NU_ABLATE") is None:
            # Per-lane cursors (continuous batching): append INSIDE the
            # flash kernel via aliased outputs.  Every XLA-level form of a
            # per-lane append (jnp advanced indexing AND raw layout-
            # preserving lax.scatter) defeats in-place carry reuse and
            # copies the full cache per layer — measured b=32 bulk decode
            # 346 vs 17.8 ms/frame.  The kernel DMA-writes the new rows at
            # (l, lane, cursor[lane]) into the donated cache buffer and
            # folds the current token into the online softmax in-register
            # (kernels/flash_decode._kernel_stacked_append).
            from ..kernels.flash_decode import flash_gqa_decode_append
            attn, k_all, v_all = flash_gqa_decode_append(
                q[:, 0], k_all, v_all, k_new[:, :, 0], v_new[:, :, 0],
                cache.lengths, write_vec, l, prompt_cap)
            attn = attn.reshape(b, s, h * dh)
            xx = xx + _mm(attn, p["wo"])
            hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
            gu = _mm(hn, p["w_gate_up"])
            f_half = gu.shape[-1] // 2
            ff = jax.nn.silu(gu[..., :f_half]) * gu[..., f_half:]
            xx = xx + _mm(ff, p["w_down"])
            return (xx, k_all, v_all), None
        if scalar_cursor:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[None], (l, 0, 0, write_at, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[None], (l, 0, 0, write_at, 0))
        else:
            # Per-lane cursor append via raw lax.scatter.  The obvious
            # jnp form `.at[l, bi, :, write_vec, :].set(...)` mixes basic
            # and advanced indices, so jnp transposes the advanced axes to
            # the front — materializing full-cache copies per layer per
            # step.  Measured on v5e at b=32: 339.8 vs 17.8 ms/frame
            # against the uniform-cursor path (19x) — the entire reason
            # continuous batching was host-"dispatch-bound" in round 3.
            # A layout-preserving scatter (window over [Hkv, 1, Dh],
            # indices (l, lane, cursor)) keeps the in-place update.
            if _os.environ.get("QTTS_NU_ABLATE") == "dus":
                # timing probe ONLY (wrong result for true ragged cursors):
                # uniform-style DUS at lane 0's cursor, to isolate the
                # scatter's in-context cost
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k_new[None], (l, 0, 0, write_vec[0], 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v_new[None], (l, 0, 0, write_vec[0], 0))
            else:
                dnums = jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1, 2, 3),
                    inserted_window_dims=(0, 1),
                    scatter_dims_to_operand_dims=(0, 1, 3))
                idx = jnp.stack([jnp.full((b,), 0, jnp.int32) + l,
                                 jnp.arange(b, dtype=jnp.int32),
                                 write_vec], axis=1)       # [B, 3]
                k_all = jax.lax.scatter(
                    k_all, idx, k_new, dnums, indices_are_sorted=True,
                    unique_indices=True,
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                v_all = jax.lax.scatter(
                    v_all, idx, v_new, dnums, indices_are_sorted=True,
                    unique_indices=True,
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

        if flash_ok:
            attn = flash_gqa_decode_stacked(
                q[:, 0], k_all, v_all, cache.lengths, write_vec, l,
                prompt_cap)[:, None]
            attn = attn.reshape(b, s, h * dh)
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_all, l, 0,
                                                   keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_all, l, 0,
                                                   keepdims=False)
            attn = gqa_attend(q, k_layer, v_layer, mask).reshape(b, s,
                                                                 h * dh)
        xx = xx + _mm(attn, p["wo"])
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        gu = _mm(hn, p["w_gate_up"])
        f_half = gu.shape[-1] // 2
        ff = jax.nn.silu(gu[..., :f_half]) * gu[..., f_half:]
        xx = xx + _mm(ff, p["w_down"])
        return (xx, k_all, v_all), None

    (x, new_k, new_v), _ = jax.lax.scan(
        layer_fn, (x, cache.k, cache.v),
        (jnp.arange(L, dtype=jnp.int32), params["layers"]),
        unroll=getattr(cfg, "layer_scan_unroll", 1))
    hidden = rms_norm(x, params["final_norm"], cfg.rms_eps)
    new_cache = cache.replace(k=new_k, v=new_v,
                              write_idx=cache.write_idx + jnp.int32(s))
    return hidden, new_cache


def _rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    from ..ops.rope import apply_rope
    return apply_rope(x, cos, sin)
