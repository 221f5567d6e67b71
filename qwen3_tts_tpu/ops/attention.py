"""Grouped-query attention over a static-capacity KV cache.

Cache layout is [B, n_kv, capacity, head_dim] per layer (stacked to
[L, B, n_kv, C, Dh] by the models).  Prompts are right-padded to a static
capacity; per-stream validity is expressed through an attention mask rather
than dynamic shapes, which keeps everything jittable and MXU-friendly:

  slot c is attendable by the query at absolute slot q_slot iff
      c <= q_slot  (causal)
  and (c < length[b]          # real prompt tokens
       or c >= prompt_cap     # generated tokens
       or c == q_slot)        # self (keeps padded query rows finite)

Softmax runs in float32.  A Pallas flash-decode kernel (kernels/flash_decode)
replaces the XLA path for single-token decode on TPU when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def history_mask(lengths: jnp.ndarray, prompt_cap: int, start, s: int,
                 capacity: int) -> jnp.ndarray:
    """Build the [B, S, C] boolean mask described above.

    lengths: [B] int32 true prompt lengths; start: per-lane [B] (or scalar)
    absolute slot of the first query; s: number of queries (static);
    capacity: cache size (static).  The per-lane causal bound `c <= q[b]`
    is what isolates refilled lanes: their cursor restarts at prompt_cap,
    so a previous occupant's (higher-slot) decode history is invisible.
    """
    c = jnp.arange(capacity, dtype=jnp.int32)
    start = jnp.broadcast_to(jnp.asarray(start, jnp.int32),
                             lengths.shape)                              # [B]
    q = start[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]         # [B, S]
    causal = c[None, None, :] <= q[:, :, None]                           # [B, S, C]
    in_prompt = c[None, None, :] < lengths[:, None, None]                # [B, 1, C]
    generated = (c >= prompt_cap)[None, None, :]
    self_slot = c[None, None, :] == q[:, :, None]
    return causal & (in_prompt | generated | self_slot)


def gqa_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Grouped-query attention.

    q: [B, S, H, Dh]; k_cache/v_cache: [B, Hkv, C, Dh]; mask: [B, S, C].
    Returns [B, S, H, Dh] in q.dtype.
    """
    b, s, h, dh = q.shape
    hkv = k_cache.shape[1]
    g = h // hkv
    scale = dh ** -0.5

    qf = q.reshape(b, s, hkv, g, dh).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    # [B, Hkv, G, S, C]
    scores = jnp.einsum("bskgd,bkcd->bkgsc", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgsc,bkcd->bskgd", weights, vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, dh).astype(q.dtype)


def update_cache(cache: jnp.ndarray, new: jnp.ndarray, start) -> jnp.ndarray:
    """Write `new` [B, S, Hkv, Dh] into cache [B, Hkv, C, Dh] at per-lane
    slot `start` ([B] or scalar)."""
    new = jnp.swapaxes(new, 1, 2).astype(cache.dtype)  # [B, Hkv, S, Dh]
    start = jnp.asarray(start, jnp.int32)
    if start.ndim == 0:
        return jax.lax.dynamic_update_slice(cache, new, (0, 0, start, 0))
    return jax.vmap(
        lambda c, n, st: jax.lax.dynamic_update_slice(c, n, (0, st, 0))
    )(cache, new, start)
