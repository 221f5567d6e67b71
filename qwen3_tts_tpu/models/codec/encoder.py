"""Codec encoder: 24 kHz waveform -> [frames, 16] residual-VQ codes.

TPU-native counterpart of the reference's `AudioEncoder` ONNX session
(/root/reference/src/models/onnx.rs:82-122): input `[B, T]` float32 at 24 kHz,
output `[B, T // 2000, 16]` int32 codes.  Design: a strided causal conv stack
downsampling by prod(downsample_factors) == samples_per_frame, then a
16-stage residual vector quantizer over the 2048-entry codebooks.  Encoding
is offline (voice cloning), so no streaming state is carried.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...core.config import CodecEncoderConfig


def init_encoder_params(cfg: CodecEncoderConfig, key: jax.Array) -> Dict[str, Any]:
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 32))

    def rnd(shape, scale):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    chans = list(cfg.channels)
    params: Dict[str, Any] = {
        "in_conv": {"w": rnd((chans[0], 1, cfg.conv_kernel),
                             cfg.conv_kernel ** -0.5),
                    "b": jnp.zeros((chans[0],), dtype)},
        "stages": tuple(
            {"w": rnd((chans[min(i + 1, len(chans) - 1)], chans[i],
                       cfg.stage_kernel_mult * r),
                      (chans[i] * cfg.stage_kernel_mult * r) ** -0.5),
             "b": jnp.zeros((chans[min(i + 1, len(chans) - 1)],), dtype)}
            for i, r in enumerate(cfg.downsample_factors)),
        "out_proj": rnd((chans[-1], cfg.d_model), chans[-1] ** -0.5),
        "codebooks": rnd((cfg.n_codebooks, cfg.codebook_size, cfg.d_model), 1.0),
    }
    return params


def encode(cfg: CodecEncoderConfig, params, wav: jnp.ndarray) -> jnp.ndarray:
    """wav [B, T] float32 -> codes [B, T // prod(factors), 16] int32.
    Trailing samples that do not fill a frame are dropped (same framing as
    the reference: T // 2000 frames)."""
    spf = 1
    for r in cfg.downsample_factors:
        spf *= r
    b, t = wav.shape
    n_frames = t // spf
    x = wav[:, : n_frames * spf][:, None, :]               # [B, 1, T']

    x = _causal(x, params["in_conv"]["w"], params["in_conv"]["b"], stride=1)
    x = jax.nn.gelu(x)
    for p_stage, r in zip(params["stages"], cfg.downsample_factors):
        x = _causal(x, p_stage["w"], p_stage["b"], stride=r)
        x = jax.nn.gelu(x)
    z = jnp.einsum("bct,cd->btd", x.astype(jnp.float32),
                   params["out_proj"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)     # [B, N, D]
    return rvq_encode(params["codebooks"], z)


def rvq_encode(codebooks: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Residual VQ: codebooks [Q, K, D], z [B, N, D] -> codes [B, N, Q]."""
    def stage(residual, cb):
        # nearest neighbour: argmin |r - c|^2 = argmin |c|^2 - 2 r.c
        c2 = jnp.sum(cb.astype(jnp.float32) ** 2, axis=-1)          # [K]
        dots = jnp.einsum("bnd,kd->bnk", residual, cb.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        code = jnp.argmin(c2[None, None] - 2.0 * dots, axis=-1)     # [B, N]
        residual = residual - jnp.take(cb, code, axis=0)
        return residual, code.astype(jnp.int32)

    _, codes = jax.lax.scan(stage, z.astype(jnp.float32), codebooks)
    return jnp.transpose(codes, (1, 2, 0))                 # [B, N, Q]


def _causal(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            stride: int) -> jnp.ndarray:
    """Left-padded strided conv so frame n only sees samples <= n*stride."""
    k = w.shape[-1]
    pad = k - stride if k > stride else 0
    xx = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
    y = jax.lax.conv_general_dilated(
        xx.astype(w.dtype), w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (y + b[None, :, None].astype(jnp.float32)).astype(x.dtype)
