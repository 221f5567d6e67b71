"""Int8 weight quantization for the memory-bound decode path.

Autoregressive decode reads every LM weight once per step (the talker) or 15
times per frame (the predictor), so HBM traffic — not FLOPs — sets the frame
time.  Storing weights as int8 with per-output-channel f32 scales halves the
dominant stream vs bf16; XLA:TPU fuses the int8->bf16 dequant into the matmul
so no full-precision copy is materialized.

This mirrors the deployment reality of the reference, which ships Q8_0/Q5_K_M
GGUF weights through ggml's quantized kernels (SURVEY.md §2.1); here GGUF
tensors are dequantized at load and re-quantized symmetrically to int8 on
device.  Accuracy: symmetric per-channel int8 on top of Q8/Q5 sources is
within the source quantization's own error envelope.

A quantized tensor is a dict {"q": int8 [..., in, out], "s": f32 [..., out]}
(scales per output channel, broadcast over stacked layer dims).
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

QTensor = Dict[str, jnp.ndarray]


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> QTensor:
    """Symmetric per-output-channel int8 quantization.

    w: [..., in, out] (contraction axis = `axis`).  Scales are computed over
    the contraction axis so each output channel dequantizes independently.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": jnp.squeeze(scale, axis=axis)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w) and "s" in w


def is_int4(w) -> bool:
    return isinstance(w, dict) and "q4" in w


def quantize_weight_int4(w: jnp.ndarray, axis: int = -2,
                         group: int = 128) -> QTensor:
    """Symmetric grouped int4, packed two values per int8 byte.

    jnp.int4 itself RecursionErrors on the axon runtime (ROADMAP), so the
    nibbles ride in int8 carriers: byte i on the contraction axis holds
    w[2i] (low nibble) and w[2i+1] (high nibble).  Scales are per
    (input-group, output-channel): {"q4": int8 [..., in/2, out],
    "s": f32 [..., in/group, out]}.  Halves the HBM weight stream vs int8.
    Requires `axis` == -2 ([..., in, out] layout) and in % (2*group-aligned).
    """
    assert axis == -2, "int4 packing assumes [..., in, out] layout"
    wf = w.astype(jnp.float32)
    d_in = wf.shape[-2]
    assert d_in % 2 == 0
    group = min(group, d_in)
    assert d_in % group == 0
    gshape = wf.shape[:-2] + (d_in // group, group, wf.shape[-1])
    wg = wf.reshape(gshape)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(wf.shape)                               # [..., in, out]
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"q4": packed, "s": jnp.squeeze(scale, axis=-2)}


def _unpack_int4(w: QTensor, dtype) -> jnp.ndarray:
    """int8-packed nibbles -> dequantized [..., in, out] in `dtype`.
    XLA fuses the shifts + scale into the consuming dot's operand tiles, so
    HBM reads stay at 0.5 byte/weight."""
    packed = w["q4"]
    # arithmetic shifts sign-extend: low nibble via <<4 then >>4
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.stack([lo, hi], axis=-2)                      # [..., in/2, 2, out]
    q = q.reshape(packed.shape[:-2] + (packed.shape[-2] * 2,
                                       packed.shape[-1]))
    group = q.shape[-2] // w["s"].shape[-2]               # static from shapes
    s = jnp.repeat(w["s"], group, axis=-2)                # [..., in, out]
    return q.astype(dtype) * s.astype(dtype)


def matmul(x: jnp.ndarray, w: Union[jnp.ndarray, QTensor]) -> jnp.ndarray:
    """x @ w for plain or quantized weights. x: [..., in] -> [..., out]."""
    if not is_quantized(w):
        return x @ w
    if is_int4(w):
        from ..kernels.int4_matmul import matmul_int4
        return matmul_int4(x, w).astype(x.dtype)
    # Dequant fused into the dot by XLA; reads stay int8 in HBM.
    y = x @ w["q"].astype(x.dtype)
    return y * w["s"].astype(y.dtype)


def matmul_a8(x: jnp.ndarray, w: Union[jnp.ndarray, QTensor]) -> jnp.ndarray:
    """x @ w with int8 activations x int8 weights (a8w8) — the prefill
    fast path.

    The dequant-into-the-dot schedule (`matmul`) costs ~25% of prefill
    matmul throughput on v5e (measured 71.9 vs 96.1 TFLOP/s for the pure
    bf16 dot at 4096x2048x2048); quantizing the activations per-row to
    int8 and issuing an s8xs8->s32 dot instead measures 104.6 TFLOP/s —
    1.45x the dequant path.  Activation noise is Q8_0-class (the same
    class the fused talker decode step already applies by default, and
    the reference's own quantized-checkpoint deployment class).  Falls
    back to `matmul` for unquantized or int4 weights."""
    if not is_quantized(w) or is_int4(w):
        return matmul(x, w)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w["q"], (((xq.ndim - 1,), (w["q"].ndim - 2,)),
                                         ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * w["s"].astype(jnp.float32)
            ).astype(x.dtype)


def quantize_decoder_layers(layers: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the big projection matrices of a stacked layer dict
    ([L, in, out] each); norms stay high precision."""
    out = dict(layers)
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        out[name] = quantize_weight(layers[name], axis=-2)
    return out


def quantize_decoder_layers_int4(layers: Dict[str, Any],
                                 group: int = 128) -> Dict[str, Any]:
    """int4 variant of quantize_decoder_layers (packed nibbles + grouped
    scales): halves the decode-path weight stream again vs int8."""
    out = dict(layers)
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        out[name] = quantize_weight_int4(layers[name], axis=-2, group=group)
    return out


def quantize_head(head: jnp.ndarray) -> QTensor:
    """LM head [vocab, d] -> quantized over d (per-vocab-row scales)."""
    return quantize_weight(head, axis=-1)


def head_matmul(hidden: jnp.ndarray, head: Union[jnp.ndarray, QTensor]
                ) -> jnp.ndarray:
    """hidden [..., d] @ head.T -> [..., vocab] in f32."""
    if not is_quantized(head):
        return jnp.einsum("...d,vd->...v", hidden.astype(jnp.float32),
                          head.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    y = jnp.einsum("...d,vd->...v", hidden.astype(jnp.bfloat16),
                   head["q"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return y * head["s"].astype(jnp.float32)


def head_matmul_slice(hidden: jnp.ndarray, head: Union[jnp.ndarray, QTensor],
                      start, size: int) -> jnp.ndarray:
    """hidden [..., d] @ head[start:start+size].T -> [..., size] in f32.

    Streams only the needed head rows from HBM — the predictor's inner loop
    reads one 2048-row codebook window per step instead of the full
    15x2048-row vocabulary (~2 MB vs ~31 MB int8 per step)."""
    import jax

    if not is_quantized(head):
        rows = jax.lax.dynamic_slice_in_dim(head, start, size, axis=0)
        return jnp.einsum("...d,vd->...v", hidden.astype(jnp.float32),
                          rows.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    rows = jax.lax.dynamic_slice_in_dim(head["q"], start, size, axis=0)
    scale = jax.lax.dynamic_slice_in_dim(head["s"], start, size, axis=0)
    y = jnp.einsum("...d,vd->...v", hidden.astype(jnp.bfloat16),
                   rows.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return y * scale.astype(jnp.float32)
