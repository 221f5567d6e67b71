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
    return isinstance(w, dict) and "q" in w and "s" in w


def matmul(x: jnp.ndarray, w: Union[jnp.ndarray, QTensor]) -> jnp.ndarray:
    """x @ w for plain or quantized weights. x: [..., in] -> [..., out]."""
    if not is_quantized(w):
        return x @ w
    # Dequant fused into the dot by XLA; reads stay int8 in HBM.
    y = x @ w["q"].astype(x.dtype)
    return y * w["s"].astype(y.dtype)


def quantize_decoder_layers(layers: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the big projection matrices of a stacked layer dict
    ([L, in, out] each); norms stay high precision."""
    out = dict(layers)
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        out[name] = quantize_weight(layers[name], axis=-2)
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
