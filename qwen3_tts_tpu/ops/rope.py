"""Rotary position embeddings: standard RoPE and Qwen M-RoPE.

The talker uses M-RoPE with four position rows per token — temporal, height,
width, channel — where the reference feeds T=H=W=arange(seq) and channel=0
(/root/reference/src/tts/engine.rs:306-314, n_pos_per_embd=4 at
llama/mod.rs:456).  Frequencies are split into per-row sections (Qwen2-VL
convention: section sizes are in half-dims and sum to head_dim // 2); the
angle for frequency i uses the position row that owns section i.  With equal
T/H/W rows and an empty/zero channel section this reduces to standard RoPE,
which `rope_cos_sin` provides directly for the predictor.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def inv_frequencies(head_dim: int, theta: float) -> np.ndarray:
    """Standard RoPE inverse frequencies, shape [head_dim // 2] (f32)."""
    return (1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
            ).astype(np.float32)


def section_ids(sections: Sequence[int]) -> np.ndarray:
    """Map each of the head_dim//2 frequencies to its owning position row."""
    out = np.concatenate([np.full(s, i, np.int32) for i, s in enumerate(sections)])
    return out


def mrope_cos_sin(pos4: jnp.ndarray, inv_freq: jnp.ndarray,
                  sec_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for M-RoPE.

    pos4: int32 [..., 4] positions (temporal, height, width, channel).
    Returns (cos, sin), each [..., head_dim] with the half-table duplicated.
    """
    # Pick, per frequency, the position row that owns its section.
    pos = jnp.take_along_axis(pos4, sec_ids[(None,) * (pos4.ndim - 1)], axis=-1)
    angles = pos.astype(jnp.float32) * inv_freq  # [..., head_dim//2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1))


def rope_cos_sin(pos: jnp.ndarray, inv_freq: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard RoPE cos/sin: pos int32 [...] -> each [..., head_dim]."""
    angles = pos.astype(jnp.float32)[..., None] * inv_freq
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([sin, sin], axis=-1))


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding. x: [..., n_heads, head_dim]; cos/sin [..., head_dim]
    broadcast over the heads axis."""
    cos = cos[..., None, :].astype(jnp.float32)
    sin = sin[..., None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * cos + rotate_half(xf) * sin).astype(x.dtype)


def make_mrope_positions(start, length: int) -> np.ndarray:
    """Host helper mirroring engine.rs:306-314: [length, 4] with T=H=W=arange
    from `start` and channel row 0."""
    r = np.arange(start, start + length, dtype=np.int32)
    return np.stack([r, r, r, np.zeros_like(r)], axis=-1)
