"""Speaker encoder: log-mel [frames, 128] -> 2048-d speaker embedding.

TPU-native counterpart of the reference's `SpeakerEncoder` ONNX session
(/root/reference/src/models/onnx.rs:125-163) with the mel front-end from
ops.mel (exact parameter parity with onnx.rs:167-320).  Architecture:
conv1d stack over time + attentive statistics pooling (ECAPA-style) +
linear head to the 2048-d embedding, L2-normalized.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...core.config import SpeakerEncoderConfig
from ...ops.mel import log_mel


def init_speaker_params(cfg: SpeakerEncoderConfig, key: jax.Array) -> Dict[str, Any]:
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 16))

    def rnd(shape, scale):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    d = cfg.d_model
    params = {
        "in_proj": rnd((cfg.n_mels, d), cfg.n_mels ** -0.5),
        "convs": tuple(
            {"w": rnd((d, d, 3), (3 * d) ** -0.5), "b": jnp.zeros((d,), dtype)}
            for _ in range(cfg.n_layers)),
        "head": rnd((2 * d, cfg.emb_dim), (2 * d) ** -0.5),
    }
    if cfg.pooling == "attentive":
        params["attn_w"] = rnd((d, d), d ** -0.5)
        params["attn_v"] = rnd((d,), d ** -0.5)
    elif cfg.pooling != "xvector":
        raise ValueError(f"unknown speaker pooling {cfg.pooling!r} "
                         "(expected 'attentive' or 'xvector')")
    return params


def speaker_embed_from_mel(cfg: SpeakerEncoderConfig, params,
                           mels: jnp.ndarray) -> jnp.ndarray:
    """mels [B, F, n_mels] -> [B, emb_dim] (L2-normalized)."""
    x = jnp.einsum("bfm,md->bfd", mels.astype(jnp.float32),
                   params["in_proj"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    x = jnp.swapaxes(x, 1, 2)                              # [B, D, F]
    for conv in params["convs"]:
        xx = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
        y = jax.lax.conv_general_dilated(
            xx, conv["w"].astype(jnp.float32), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        x = x + jax.nn.gelu(y + conv["b"][None, :, None].astype(jnp.float32))
    x = jnp.swapaxes(x, 1, 2)                              # [B, F, D]

    # Statistics pooling: attentive (ECAPA-style, learned frame weights) or
    # x-vector (uniform weights) — both reduce to weighted mean/std over
    # frames, so the selectable variant is just the weight source.
    if cfg.pooling == "attentive":
        scores = jnp.einsum(
            "bfd,d->bf", jnp.tanh(x @ params["attn_w"].astype(jnp.float32)),
            params["attn_v"].astype(jnp.float32))
        w = jax.nn.softmax(scores, axis=-1)[..., None]     # [B, F, 1]
    else:                                                  # "xvector"
        w = jnp.full(x.shape[:2] + (1,), 1.0 / x.shape[1], jnp.float32)
    mean = jnp.sum(w * x, axis=1)
    var = jnp.sum(w * (x - mean[:, None]) ** 2, axis=1)
    stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-6)], axis=-1)

    emb = stats @ params["head"].astype(jnp.float32)
    return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)


def speaker_embed(cfg: SpeakerEncoderConfig, params,
                  wav: jnp.ndarray) -> jnp.ndarray:
    """wav [B, T] (or [T]) float32 24 kHz -> [B, emb_dim]."""
    if wav.ndim == 1:
        wav = wav[None]
    mels = log_mel(wav, cfg.sample_rate, cfg.n_fft, cfg.hop_length,
                   cfg.n_mels, cfg.fmin, cfg.fmax)
    return speaker_embed_from_mel(cfg, params, mels)
