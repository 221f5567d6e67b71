"""Talker: Qwen3 decoder over 2048-d prompt embeddings -> codebook-0 logits.

Differences from a text LM, mirroring the reference's usage of llama.cpp
(engine.rs:126-133, 457-641):
  * input is raw embeddings (no token-embedding lookup);
  * positions are M-RoPE 4-tuples with T=H=W=pos and channel=0;
  * only the codec slice [0, 2160) of the LM head is ever sampled
    (engine.rs:555), so just that slice is materialized (`codec_head`) —
    on TPU this turns a 151936-row head matmul into a 2160-row one;
  * both the logits and the final hidden state of the sampled position are
    returned: the hidden state feeds the 2048->1024 projection into the
    predictor (engine.rs:565-568).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TalkerConfig
from ..ops.rope import inv_frequencies, mrope_cos_sin, section_ids
from . import transformer
from .transformer import KVCache


def init_talker_params(cfg: TalkerConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = transformer.init_decoder_params(cfg, k1)
    params["codec_head"] = (
        jax.random.normal(k2, (cfg.n_codec_logits, cfg.d_model), jnp.float32)
        * cfg.d_model ** -0.5
    ).astype(jnp.dtype(cfg.dtype))
    return params


def _rope_tables(cfg: TalkerConfig, pos4: jnp.ndarray):
    if sum(cfg.mrope_sections) != cfg.head_dim // 2:
        raise ValueError(
            f"mrope_sections {cfg.mrope_sections} must sum to head_dim/2 "
            f"= {cfg.head_dim // 2}")
    inv_freq = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    sec = jnp.asarray(section_ids(cfg.mrope_sections))
    return mrope_cos_sin(pos4, inv_freq, sec)


def talker_prefill(cfg: TalkerConfig, params, embeds: jnp.ndarray,
                   lengths: jnp.ndarray, cache: KVCache,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Prefill the padded prompt.

    embeds: [B, S_max, 2048]; lengths: [B] true lengths (<= S_max).
    Returns (codec_logits [B, V_codec], hidden [B, D] at each stream's last
    real token, cache advanced to write_idx = S_max with lengths recorded).
    """
    b, s_max, _ = embeds.shape
    pos = jnp.arange(s_max, dtype=jnp.int32)[None, :].repeat(b, 0)
    pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], axis=-1)
    cos, sin = _rope_tables(cfg, pos4)

    cache = cache.replace(lengths=lengths.astype(jnp.int32))
    hidden_all, cache = transformer.decoder_forward(
        cfg, params, embeds.astype(jnp.dtype(cfg.dtype)), cos, sin, cache,
        prompt_cap=s_max, a8=True)

    last = jnp.clip(lengths - 1, 0, s_max - 1)
    hidden = jnp.take_along_axis(hidden_all, last[:, None, None], axis=1)[:, 0]
    logits = _codec_logits(params, hidden)
    return logits, hidden, cache


def talker_decode_step(cfg: TalkerConfig, params, embed: jnp.ndarray,
                       pos: jnp.ndarray, cache: KVCache, prompt_cap: int,
                       uniform_cursor: bool = True,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """One autoregressive step on the feedback embedding.

    embed: [B, 2048]; pos: [B] logical positions (prompt length + step).
    Returns (codec_logits [B, V_codec], hidden [B, D], cache).
    """
    p = pos.astype(jnp.int32)[:, None]
    pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)  # [B, 1, 4]
    cos, sin = _rope_tables(cfg, pos4)
    hidden_all, cache = transformer.decoder_forward(
        cfg, params, embed[:, None, :].astype(jnp.dtype(cfg.dtype)),
        cos, sin, cache, prompt_cap=prompt_cap,
        uniform_cursor=uniform_cursor)
    hidden = hidden_all[:, 0]
    return _codec_logits(params, hidden), hidden, cache


def talker_verify_frames(cfg: TalkerConfig, params, embeds: jnp.ndarray,
                         pos: jnp.ndarray, cache: KVCache, prompt_cap: int,
                         uniform_cursor: bool = True,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Mid-decode multi-token forward: the speculative-decoding VERIFY step
    (DESIGN §12 prerequisite (a)).

    Consumes K drafted feedback embeddings in ONE forward — the 28-layer
    weight stream (the decode bottleneck, DESIGN §10) amortizes K-fold —
    and returns logits/hidden at EVERY drafted position.  Unlike prefill,
    the rows attend the full live prefix (prompt + generated history), so
    position j sees [0, cursor + j] exactly as j sequential decode steps
    would (full_prefix=True in transformer.decoder_forward).

    embeds: [B, K, 2048] drafted feedback embeds; pos: [B] logical position
    of the first draft.  Returns (codec_logits [B, K, Vc], hidden [B, K, D],
    cache with the K rows appended — the CALLER owns cursor rollback for
    rejected drafts, see runtime/spec.py).
    """
    b, k, _ = embeds.shape
    p = (pos.astype(jnp.int32)[:, None]
         + jnp.arange(k, dtype=jnp.int32)[None, :])          # [B, K]
    pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
    cos, sin = _rope_tables(cfg, pos4)
    hidden_all, cache = transformer.decoder_forward(
        cfg, params, embeds.astype(jnp.dtype(cfg.dtype)), cos, sin, cache,
        prompt_cap=prompt_cap, uniform_cursor=uniform_cursor,
        full_prefix=True)
    return _codec_logits(params, hidden_all), hidden_all, cache


def _codec_logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    from ..ops.quant import head_matmul
    return head_matmul(hidden, params["codec_head"])


def init_talker_cache(cfg: TalkerConfig, batch: int, capacity: int) -> KVCache:
    return transformer.init_kv_cache(cfg, batch, capacity, jnp.dtype(cfg.dtype))
