"""Streaming codec decoder: [frames, 16] codes -> 24 kHz waveform.

TPU-native re-design of the reference's ONNX streaming decoder
(/root/reference/src/models/onnx.rs:324-496): an 8-layer, 16-head,
d_head-64 latent transformer over summed codebook embeddings followed by a
causal conv-transpose upsampler (total factor == 2000 samples/frame).

Streaming design differs deliberately from the ONNX graph's growing-length
state tensors (onnx.rs:477-487): XLA requires static shapes, so all carried
state is fixed-capacity —

  * transformer KV is a ring buffer of `attn_window` frames with an absolute-
    position table (sliding-window attention; the mask derives validity from
    stored positions, so chunked decode == full decode bit-for-bit);
  * every causal conv carries a [(kernel-1)*dilation]-sample history;
  * the conv-transpose stages use kernel == stride (no cross-input overlap),
    making them stateless and exactly chunk-invariant.

The functional `DecoderState` plays the role of the reference's
`DecoderState` (pre_conv/latent/conv histories + 8 KV pairs) with static
shapes.  Chunk-size invariance is covered by tests/test_codec.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...core.config import CodecDecoderConfig
from ...ops.norms import rms_norm
from ...ops.rope import apply_rope, inv_frequencies, rope_cos_sin

NEG_INF = -1e9


@struct.dataclass
class DecoderState:
    ring_k: jnp.ndarray       # [L, B, H, W, Dh] (post-RoPE keys)
    ring_v: jnp.ndarray       # [L, B, H, W, Dh]
    ring_pos: jnp.ndarray     # [B, W] int32 absolute frame index per slot (-1 empty)
    count: jnp.ndarray        # [B] int32: frames decoded so far (per lane —
    #                           continuous batching refills lanes mid-flight)
    conv_hist: Tuple[jnp.ndarray, ...]  # per-causal-conv input history
    # Overlapping conv-transpose (upsample_kernel_mult > 1) overlap-add
    # tails: per stage [B, C_out, kernel - stride] of not-yet-emitted
    # output accumulation.  Empty when kernel == stride.
    up_tail: Tuple[jnp.ndarray, ...] = ()


def _stage_channels(cfg: CodecDecoderConfig) -> List[Tuple[int, int]]:
    chans = list(cfg.channels)
    pairs = []
    for i in range(len(cfg.upsample_factors)):
        c_in = chans[i]
        c_out = chans[i + 1] if i + 1 < len(chans) else chans[-1]
        pairs.append((c_in, c_out))
    return pairs


def init_decoder_params(cfg: CodecDecoderConfig, key: jax.Array) -> Dict[str, Any]:
    dtype = jnp.dtype(cfg.dtype)
    d, l, h, dh, f = cfg.d_model, cfg.n_layers, cfg.n_heads, cfg.head_dim, cfg.d_ff
    keys = iter(jax.random.split(key, 64))

    def rnd(shape, scale):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    params: Dict[str, Any] = {
        "embed": rnd((cfg.n_codebooks, cfg.codebook_size, d), 0.02),
        "layers": {
            "ln1": jnp.ones((l, d), dtype),
            "ln2": jnp.ones((l, d), dtype),
            "wq": rnd((l, d, h * dh), d ** -0.5),
            "wk": rnd((l, d, h * dh), d ** -0.5),
            "wv": rnd((l, d, h * dh), d ** -0.5),
            "wo": rnd((l, h * dh, d), (h * dh) ** -0.5),
            "w_gate": rnd((l, d, f), d ** -0.5),
            "w_up": rnd((l, d, f), d ** -0.5),
            "w_down": rnd((l, f, d), f ** -0.5),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    k0 = cfg.channels[0]
    params["pre_conv"] = {
        "w": rnd((k0, d, cfg.conv_kernel), (d * cfg.conv_kernel) ** -0.5),
        "b": jnp.zeros((k0,), dtype),
    }
    stages = []
    m = int(getattr(cfg, "upsample_kernel_mult", 1))
    for (c_in, c_out), r in zip(_stage_channels(cfg), cfg.upsample_factors):
        stages.append({
            "up_w": rnd((c_out, c_in, r * m), (c_in * r * m) ** -0.5),
            "up_b": jnp.zeros((c_out,), dtype),
            "alpha1": jnp.ones((c_out,), dtype),
            "conv1_w": rnd((c_out, c_out, cfg.conv_kernel),
                           (c_out * cfg.conv_kernel) ** -0.5),
            "conv1_b": jnp.zeros((c_out,), dtype),
            "alpha2": jnp.ones((c_out,), dtype),
            "conv2_w": rnd((c_out, c_out, 1), c_out ** -0.5),
            "conv2_b": jnp.zeros((c_out,), dtype),
        })
    params["stages"] = tuple(stages)
    c_last = _stage_channels(cfg)[-1][1]
    params["out_conv"] = {
        "w": rnd((1, c_last, cfg.conv_kernel), (c_last * cfg.conv_kernel) ** -0.5),
        "b": jnp.zeros((1,), dtype),
    }
    return params


def init_decoder_state(cfg: CodecDecoderConfig, params, batch: int) -> DecoderState:
    dtype = jnp.dtype(cfg.dtype)
    l, h, dh, w = cfg.n_layers, cfg.n_heads, cfg.head_dim, cfg.attn_window
    hists = []
    k = cfg.conv_kernel
    hists.append(jnp.zeros((batch, cfg.d_model, k - 1), dtype))  # pre_conv
    for (c_in, c_out) in _stage_channels(cfg):
        hists.append(jnp.zeros((batch, c_out, k - 1), dtype))    # res conv1
    c_last = _stage_channels(cfg)[-1][1]
    hists.append(jnp.zeros((batch, c_last, k - 1), dtype))       # out_conv
    tails = []
    m = int(getattr(cfg, "upsample_kernel_mult", 1))
    if m > 1:
        for (c_in, c_out), r in zip(_stage_channels(cfg),
                                    cfg.upsample_factors):
            tails.append(jnp.zeros((batch, c_out, (m - 1) * r), jnp.float32))
    return DecoderState(
        ring_k=jnp.zeros((l, batch, h, w, dh), dtype),
        ring_v=jnp.zeros((l, batch, h, w, dh), dtype),
        ring_pos=jnp.full((batch, w), -1, jnp.int32),
        count=jnp.zeros((batch,), jnp.int32),
        conv_hist=tuple(hists),
        up_tail=tuple(tails),
    )


def reset_lanes(state: DecoderState, lane_mask: jnp.ndarray) -> DecoderState:
    """Zero the streaming state of lanes where lane_mask[b] (jit-friendly;
    used by continuous batching when a lane is refilled with a new stream)."""
    m = lane_mask

    def zero_batch0(a):  # [B, ...] conv histories
        return jnp.where(m.reshape((-1,) + (1,) * (a.ndim - 1)), 0, a)

    return state.replace(
        ring_k=jnp.where(m[None, :, None, None, None], 0, state.ring_k),
        ring_v=jnp.where(m[None, :, None, None, None], 0, state.ring_v),
        ring_pos=jnp.where(m[:, None], -1, state.ring_pos),
        count=jnp.where(m, 0, state.count),
        conv_hist=tuple(zero_batch0(h) for h in state.conv_hist),
        up_tail=tuple(zero_batch0(t) for t in state.up_tail),
    )


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin^2(alpha*x)/alpha (per-channel alpha);
    standard in neural vocoders (BigVGAN/DAC family)."""
    a = alpha[None, :, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def causal_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                hist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal 1-D conv. x [B, C_in, T], w [C_out, C_in, K], hist [B, C_in, K-1].
    Returns (y [B, C_out, T], new_hist)."""
    k = w.shape[-1]
    xx = jnp.concatenate([hist, x], axis=2) if k > 1 else x
    y = jax.lax.conv_general_dilated(
        xx.astype(w.dtype), w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    y = (y + b[None, :, None].astype(jnp.float32)).astype(x.dtype)
    new_hist = xx[:, :, xx.shape[2] - (k - 1):] if k > 1 else hist
    return y, new_hist


def upsample(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping conv-transpose: kernel == stride == r.
    x [B, C_in, T] -> [B, C_out, T*r].  Stateless, hence chunk-invariant."""
    y = jnp.einsum("bct,ocr->botr", x.astype(jnp.float32),
                   w.astype(jnp.float32), preferred_element_type=jnp.float32)
    y = y + b[None, :, None, None].astype(jnp.float32)
    bsz, c_out, t, r = y.shape
    return y.reshape(bsz, c_out, t * r).astype(x.dtype)


def upsample_overlap(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     tail: jnp.ndarray, stride: int,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlapping causal conv-transpose: kernel == m*stride, m > 1.

    x [B, C_in, T] -> [B, C_out, T*stride] via streamed overlap-add: each
    input frame's kernel-wide contribution is split into m stride-wide
    slabs, slab j lands j input-frames later; the last (m-1)*stride output
    samples of the chunk stay un-emitted in `tail` (pre-bias accumulation)
    and are completed by the next chunk — emitted samples therefore depend
    only on current/past inputs.  Chunked == full to last-ulp float noise
    (NOT bit-equal: XLA tiles the einsum's channel reduction per chunk
    length, reassociating it; and for m >= 3 carried + fresh contributions
    reassociate the overlap sum).  Semantics (= torch ConvTranspose1d
    cropped causally to t*r outputs) and streaming invariance are pinned
    by test_overlap_op_semantics_and_streaming.
    """
    k = w.shape[-1]
    m = k // stride
    assert k == m * stride and m >= 1, (k, stride)
    bsz, _, t = x.shape
    c_out = w.shape[0]
    y = jnp.einsum("bct,ock->botk", x.astype(jnp.float32),
                   w.astype(jnp.float32), preferred_element_type=jnp.float32)
    y = y.reshape(bsz, c_out, t, m, stride)
    acc = jnp.zeros((bsz, c_out, t + m - 1, stride), jnp.float32)
    for j in range(m):
        acc = acc.at[:, :, j:j + t].add(y[:, :, :, j])
    acc = acc.reshape(bsz, c_out, (t + m - 1) * stride)
    acc = acc.at[:, :, : (m - 1) * stride].add(tail)
    out = acc[:, :, : t * stride] + b[None, :, None].astype(jnp.float32)
    new_tail = acc[:, :, t * stride:]
    return out.astype(x.dtype), new_tail


def _transformer(cfg: CodecDecoderConfig, params, x: jnp.ndarray,
                 state: DecoderState) -> Tuple[jnp.ndarray, DecoderState]:
    """Sliding-window causal transformer over N new frames."""
    b, n, d = x.shape
    h, dh, w = cfg.n_heads, cfg.head_dim, cfg.attn_window
    q_pos = state.count[:, None] + jnp.arange(n, dtype=jnp.int32)  # [B, N]
    inv_freq = jnp.asarray(inv_frequencies(dh, cfg.rope_theta))
    cos_q, sin_q = rope_cos_sin(q_pos, inv_freq)

    key_pos = jnp.concatenate([state.ring_pos, q_pos], axis=1)  # [B, W+N]
    # mask [B, N, W+N]: stored, causal, within window
    valid = key_pos[:, None, :] >= 0
    causal = key_pos[:, None, :] <= q_pos[:, :, None]
    window = key_pos[:, None, :] > (q_pos[:, :, None] - w)
    mask = valid & causal & window
    slots = (q_pos % w).astype(jnp.int32)                       # [B, N]

    def layer_fn(carry, layer):
        xx = carry
        p, rk, rv = layer
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        q = (hn @ p["wq"]).reshape(b, n, h, dh)
        kk = (hn @ p["wk"]).reshape(b, n, h, dh)
        vv = (hn @ p["wv"]).reshape(b, n, h, dh)
        q = apply_rope(q, cos_q, sin_q)
        kk = apply_rope(kk, cos_q, sin_q)
        kk_t = jnp.swapaxes(kk, 1, 2)                      # [B, H, N, Dh]
        vv_t = jnp.swapaxes(vv, 1, 2)
        keys = jnp.concatenate([rk, kk_t], axis=2)         # [B, H, W+N, Dh]
        vals = jnp.concatenate([rv, vv_t], axis=2)
        scores = jnp.einsum("bnhd,bhcd->bhnc", q.astype(jnp.float32),
                            keys.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * dh ** -0.5
        scores = jnp.where(mask[:, None], scores, NEG_INF)
        wts = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnc,bhcd->bnhd", wts, vals.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        xx = xx + out.reshape(b, n, h * dh).astype(xx.dtype) @ p["wo"]
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        ff = jax.nn.silu(hn @ p["w_gate"]) * (hn @ p["w_up"])
        xx = xx + ff @ p["w_down"]
        # write new keys/vals into the ring (N <= W; per-lane slot indices)
        rk = jax.vmap(lambda rb, kb, sl: rb.at[:, sl, :].set(kb)
                      )(rk, kk_t, slots)
        rv = jax.vmap(lambda rb, vb, sl: rb.at[:, sl, :].set(vb)
                      )(rv, vv_t, slots)
        return xx, (rk, rv)

    x, (new_rk, new_rv) = jax.lax.scan(
        layer_fn, x, (params["layers"], state.ring_k, state.ring_v))
    new_ring_pos = jax.vmap(lambda rp, sl, qp: rp.at[sl].set(qp)
                            )(state.ring_pos, slots, q_pos)
    new_state = state.replace(ring_k=new_rk, ring_v=new_rv,
                              ring_pos=new_ring_pos, count=state.count + n)
    return rms_norm(x, params["final_norm"], cfg.rms_eps), new_state


def decode_chunk(cfg: CodecDecoderConfig, params, codes: jnp.ndarray,
                 state: DecoderState) -> Tuple[jnp.ndarray, DecoderState]:
    """Decode a chunk of frames.

    codes: [B, N, 16] int32 (clamped to [0, codebook_size) as the reference
    clamps at engine.rs:515-519).  Returns (wav [B, N * samples_per_frame]
    float32, new state).
    """
    dtype = jnp.dtype(cfg.dtype)
    b, n, n_q = codes.shape
    safe = jnp.clip(codes, 0, cfg.codebook_size - 1)

    # Sum of per-codebook embeddings (one fused gather).
    flat = params["embed"].reshape(cfg.n_codebooks * cfg.codebook_size, -1)
    idx = jnp.arange(n_q, dtype=jnp.int32)[None, None, :] * cfg.codebook_size + safe
    x = jnp.sum(jnp.take(flat, idx, axis=0).astype(jnp.float32), axis=2)
    x = x.astype(dtype)                                    # [B, N, d_model]

    x, state = _transformer(cfg, params, x, state)

    hists = list(state.conv_hist)
    hi = 0
    y = jnp.swapaxes(x, 1, 2)                              # [B, d_model, N]
    y, hists[hi] = causal_conv(y, params["pre_conv"]["w"],
                               params["pre_conv"]["b"], hists[hi])
    hi += 1
    up_tails = list(state.up_tail)
    for si, (p_stage, r) in enumerate(zip(params["stages"],
                                          cfg.upsample_factors)):
        if p_stage["up_w"].shape[-1] == r:        # kernel == stride: fast
            y = upsample(y, p_stage["up_w"], p_stage["up_b"])
        else:                                     # overlapping transpose
            y, up_tails[si] = upsample_overlap(
                y, p_stage["up_w"], p_stage["up_b"], up_tails[si], r)
        res = y
        y = snake(y, p_stage["alpha1"])
        y, hists[hi] = causal_conv(y, p_stage["conv1_w"], p_stage["conv1_b"],
                                   hists[hi])
        hi += 1
        y = snake(y, p_stage["alpha2"])
        y, _ = causal_conv(y, p_stage["conv2_w"], p_stage["conv2_b"],
                           jnp.zeros((b, y.shape[1], 0), y.dtype))
        y = res + y
    y, hists[hi] = causal_conv(y, params["out_conv"]["w"],
                               params["out_conv"]["b"], hists[hi])
    wav = jnp.tanh(y[:, 0, :].astype(jnp.float32))         # [B, N * spf]
    return wav, state.replace(conv_hist=tuple(hists),
                              up_tail=tuple(up_tails))


def decode_full(cfg: CodecDecoderConfig, params, codes: jnp.ndarray,
                batch: int = None) -> jnp.ndarray:
    """Convenience non-streaming decode (tests / offline synthesis)."""
    b = codes.shape[0]
    state = init_decoder_state(cfg, params, b)
    wav, _ = decode_chunk(cfg, params, codes, state)
    return wav
