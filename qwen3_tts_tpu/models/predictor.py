"""Predictor: expands each talker step into the 15 residual-VQ codes.

Implements the inner loop of engine.rs:564-611 as one fused, jittable
function: prefill on [projected_hidden; emb1024(code_0)] at positions [0, 1],
then a 15-iteration `lax.scan` where iteration q greedily argmaxes the logit
window [(q-1)*2048, q*2048) and feeds emb1024(code_q) back at position q + 1.
The KV cache is a fresh, tiny (17-slot) per-frame buffer — the reference
clears its predictor context every frame (engine.rs:575).

Everything stays on device: no hidden-state host bounce, and the per-frame
2048-d embedding sum for the talker feedback is accumulated in the same scan.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.config import PredictorConfig
from ..ops.rope import inv_frequencies, rope_cos_sin
from . import transformer


def init_predictor_params(cfg: PredictorConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = transformer.init_decoder_params(cfg, k1)
    params["lm_head"] = (
        jax.random.normal(k2, (cfg.vocab_size, cfg.d_model), jnp.float32)
        * cfg.d_model ** -0.5
    ).astype(jnp.dtype(cfg.dtype))
    return params


def _logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    from ..ops.quant import head_matmul
    return head_matmul(hidden, params["lm_head"])


def _window_logits(params, hidden: jnp.ndarray, start, size: int
                   ) -> jnp.ndarray:
    """Logits for one codebook's 2048-row window only: streams ~2 MB of
    head weights per step instead of the full ~31 MB vocabulary."""
    from ..ops.quant import head_matmul_slice
    return head_matmul_slice(hidden, params["lm_head"], start, size)


def predict_frame(cfg: PredictorConfig, params, h1024: jnp.ndarray,
                  code0: jnp.ndarray, codec_tables_1024: jnp.ndarray,
                  ) -> jnp.ndarray:
    """Predict residual codes for one frame.

    h1024: [B, 1024] projected talker hidden; code0: [B] int32;
    codec_tables_1024: [16, R, 1024] pre-projected codebook tables.
    Returns codes [B, 16] int32 (codebook 0 = code0, then 15 residuals).
    """
    b = h1024.shape[0]
    dtype = jnp.dtype(cfg.dtype)
    inv_freq = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    capacity = 2 + cfg.n_residual_codebooks  # 17: prefill pair + 15 steps

    cache = transformer.init_kv_cache(cfg, b, capacity, dtype)
    # The whole per-frame sequence is "generated": no prompt-padding slots.
    cache = cache.replace(lengths=jnp.zeros((b,), jnp.int32))

    emb0 = codec_tables_1024[0][code0]  # [B, 1024]
    x = jnp.stack([h1024, emb0], axis=1).astype(dtype)  # [B, 2, 1024]
    pos = jnp.arange(2, dtype=jnp.int32)[None, :].repeat(b, 0)
    cos, sin = rope_cos_sin(pos, inv_freq)
    hidden, cache = transformer.decoder_forward(cfg, params, x, cos, sin,
                                                cache, prompt_cap=0)
    # Only codebook 1's window is ever consumed from the prefill logits
    # (engine.rs:587-595 slices [(q-1)*2048, q*2048) with q=1 first).
    w_logits = _window_logits(params, hidden[:, -1], 0,
                              cfg.codebook_size)  # [B, 2048]

    def step(carry, q):
        w_logits, cache = carry
        code_q = jnp.argmax(w_logits, axis=-1).astype(jnp.int32)  # relative
        emb_q = codec_tables_1024[q][code_q].astype(dtype)  # [B, 1024]
        p = jnp.full((b, 1), q + 1, jnp.int32)
        cos, sin = rope_cos_sin(p, inv_freq)
        hidden, cache = transformer.decoder_forward(
            cfg, params, emb_q[:, None, :], cos, sin, cache, prompt_cap=0)
        w_logits = _window_logits(params, hidden[:, 0],
                                  q * cfg.codebook_size, cfg.codebook_size)
        return (w_logits, cache), code_q

    # Iterations 1..14 sample code_q then decode its embedding; the final
    # codebook only needs the argmax (the reference likewise skips the last
    # decode, engine.rs:602).
    n_res = cfg.n_residual_codebooks
    qs = jnp.arange(1, n_res, dtype=jnp.int32)
    (w_logits, _), residual_codes = jax.lax.scan(step, (w_logits, cache), qs)
    code_last = jnp.argmax(w_logits, axis=-1).astype(jnp.int32)  # [B]
    codes = jnp.concatenate([code0[:, None],
                             jnp.transpose(residual_codes, (1, 0)),
                             code_last[:, None]], axis=1)
    return codes.astype(jnp.int32)
