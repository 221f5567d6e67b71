"""On-device sampling: temperature / top-k / top-p over masked logits.

Replaces the reference's host-side sampler
(/root/reference/src/models/llama/mod.rs:666-775) with a fully jittable
implementation: one sort of the (small, 2160-wide) codec logit head, a
rank-based top-k mask, a nucleus (top-p) mask over the sorted cdf, and an
inverse-CDF draw from `jax.random` — all batched.  temperature/top_k/top_p are
traced scalars so changing them never triggers recompilation; temperature <= 0
selects greedy argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sample_logits(logits: jnp.ndarray, key: jax.Array, temperature,
                  top_k, top_p) -> jnp.ndarray:
    """Sample token ids from logits [..., V]. Returns int32 [...]."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temperature = jnp.asarray(temperature, jnp.float32)
    top_k = jnp.asarray(top_k, jnp.int32)
    top_p = jnp.asarray(top_p, jnp.float32)

    # Sort descending once; all filtering happens in sorted space.
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)

    ranks = jnp.arange(v, dtype=jnp.int32)
    keep_k = jnp.where(top_k > 0, ranks < top_k, True)

    temp = jnp.maximum(temperature, 1e-6)
    scaled = jnp.where(keep_k, (sorted_logits - sorted_logits[..., :1]) / temp, NEG_INF)
    probs = jax.nn.softmax(scaled, axis=-1)

    # Nucleus: keep the smallest prefix with cumulative prob >= top_p
    # (inclusive of the token that crosses the threshold, as the reference).
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_p
    keep_p = keep_p | (ranks == 0)  # always keep the top token
    final_logits = jnp.where(keep_p, scaled, NEG_INF)

    draw_sorted = jax.random.categorical(key, final_logits, axis=-1)
    sampled = jnp.take_along_axis(order, draw_sorted[..., None], axis=-1)[..., 0]
    sampled = sampled.astype(jnp.int32)

    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_with_allowlist(logits: jnp.ndarray, key: jax.Array, limit: int,
                          allow_tokens, temperature, top_k,
                          top_p) -> jnp.ndarray:
    """Sample from [0, limit) plus an explicit allowlist of extra token ids
    (parity with the reference's `sample_custom`, llama/mod.rs:780-904 —
    range-restricted sampling that also admits special tokens like EOS)."""
    v = logits.shape[-1]
    idx = jnp.arange(v, dtype=jnp.int32)
    allowed = idx < limit
    for tok in jnp.atleast_1d(jnp.asarray(allow_tokens, jnp.int32)):
        allowed = allowed | (idx == tok)
    masked = jnp.where(allowed, logits, NEG_INF)
    return sample_logits(masked, key, temperature, top_k, top_p)


def greedy_slice_argmax(logits: jnp.ndarray, start, size: int) -> jnp.ndarray:
    """argmax over a dynamic slice [start, start+size) of the last axis;
    returns indices relative to `start`.  Used for the predictor's
    per-codebook logit windows (engine.rs:587-595)."""
    window = jax.lax.dynamic_slice_in_dim(logits, start, size, axis=-1)
    return jnp.argmax(window, axis=-1).astype(jnp.int32)
