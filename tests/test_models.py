"""Talker/predictor model tests: shapes, KV-cache consistency, and the
prefill-vs-incremental equivalence that validates the whole cache design."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import PredictorConfig, TalkerConfig
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.models import transformer


@pytest.fixture(scope="module")
def talker():
    cfg = TalkerConfig.tiny()
    params = talker_lib.init_talker_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_talker_prefill_shapes(talker):
    cfg, params = talker
    b, s = 2, 12
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.d_model))
    lengths = jnp.asarray([12, 7])
    cache = talker_lib.init_talker_cache(cfg, b, s + 8)
    logits, hidden, cache = talker_lib.talker_prefill(
        cfg, params, embeds, lengths, cache)
    assert logits.shape == (b, cfg.n_codec_logits)
    assert hidden.shape == (b, cfg.d_model)
    assert np.array_equal(np.asarray(cache.write_idx), [s, s])
    assert np.isfinite(np.asarray(logits)).all()


def test_talker_padding_invariance(talker):
    """A stream's logits must not depend on padding beyond its length."""
    cfg, params = talker
    s = 10
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.d_model))
    pad_a = jnp.zeros((1, s - 6, cfg.d_model))
    pad_b = jax.random.normal(jax.random.PRNGKey(3), (1, s - 6, cfg.d_model))
    lengths = jnp.asarray([6])

    out = []
    for pad in (pad_a, pad_b):
        cache = talker_lib.init_talker_cache(cfg, 1, s + 4)
        logits, hidden, _ = talker_lib.talker_prefill(
            cfg, params, jnp.concatenate([emb, pad], 1), lengths, cache)
        out.append((np.asarray(logits), np.asarray(hidden)))
    np.testing.assert_allclose(out[0][0], out[1][0], atol=1e-5)
    np.testing.assert_allclose(out[0][1], out[1][1], atol=1e-5)


def test_talker_incremental_matches_prefill(talker):
    """Decoding token-by-token through the cache must reproduce the
    all-at-once prefill hidden states (core KV-cache correctness)."""
    cfg, params = talker
    s = 8
    embeds = jax.random.normal(jax.random.PRNGKey(4), (1, s, cfg.d_model))
    lengths = jnp.asarray([s])

    cache = talker_lib.init_talker_cache(cfg, 1, s + 4)
    logits_full, hidden_full, _ = talker_lib.talker_prefill(
        cfg, params, embeds, lengths, cache)

    # incremental: prefill the first s-1 tokens, then decode the last one.
    cache2 = talker_lib.init_talker_cache(cfg, 1, s + 4)
    _, _, cache2 = talker_lib.talker_prefill(
        cfg, params, embeds[:, :s - 1], jnp.asarray([s - 1]), cache2)
    logits_inc, hidden_inc, _ = talker_lib.talker_decode_step(
        cfg, params, embeds[:, s - 1], jnp.asarray([s - 1]), cache2,
        prompt_cap=s - 1)
    np.testing.assert_allclose(np.asarray(hidden_inc), np.asarray(hidden_full),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_inc), np.asarray(logits_full),
                               atol=2e-3)


def test_predictor_frame(talker):
    cfg = PredictorConfig.tiny()
    params = predictor_lib.init_predictor_params(cfg, jax.random.PRNGKey(5))
    b = 3
    tables = jax.random.normal(jax.random.PRNGKey(6), (16, 64, cfg.d_model))
    h = jax.random.normal(jax.random.PRNGKey(7), (b, cfg.d_model))
    code0 = jnp.asarray([1, 5, 63])
    codes = predictor_lib.predict_frame(cfg, params, h, code0, tables)
    assert codes.shape == (b, 16)
    assert np.array_equal(np.asarray(codes[:, 0]), np.asarray(code0))
    assert (np.asarray(codes[:, 1:]) >= 0).all()
    assert (np.asarray(codes[:, 1:]) < cfg.codebook_size).all()


def test_predictor_deterministic():
    cfg = PredictorConfig.tiny()
    params = predictor_lib.init_predictor_params(cfg, jax.random.PRNGKey(5))
    tables = jax.random.normal(jax.random.PRNGKey(6), (16, 64, cfg.d_model))
    h = jax.random.normal(jax.random.PRNGKey(8), (1, cfg.d_model))
    code0 = jnp.asarray([0])
    a = predictor_lib.predict_frame(cfg, params, h, code0, tables)
    b = predictor_lib.predict_frame(cfg, params, h, code0, tables)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_generated_slot_prefill_attends_own_rows():
    """Prefill with prompt_cap=0 — the predictor's per-frame layout, where
    every row is a generated slot, not prompt — must attend causally over
    the rows it writes.  Regression: the prefill attention window was once
    clamped to prompt_cap alone, zeroing the predictor's self-attention
    (caught by the fused-predictor parity test; pinned here directly)."""
    from qwen3_tts_tpu.ops.rope import inv_frequencies, rope_cos_sin

    cfg = PredictorConfig.tiny()
    params = transformer.init_decoder_params(cfg, jax.random.PRNGKey(9))
    inv = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    b, s, cap = 2, 2, 17
    x = jax.random.normal(jax.random.PRNGKey(10), (b, s, cfg.d_model)) * 0.3
    pos = jnp.arange(s, dtype=jnp.int32)[None, :].repeat(b, 0)
    cos, sin = rope_cos_sin(pos, inv)

    cache = transformer.init_kv_cache(cfg, b, cap, jnp.float32)
    cache = cache.replace(lengths=jnp.zeros((b,), jnp.int32))
    h_pre, _ = transformer.decoder_forward(cfg, params, x, cos, sin, cache,
                                           prompt_cap=0)

    # Reference: feed the two rows one at a time (s=1 decode steps).
    cache2 = transformer.init_kv_cache(cfg, b, cap, jnp.float32)
    cache2 = cache2.replace(lengths=jnp.zeros((b,), jnp.int32))
    h_steps = []
    for t in range(s):
        c, sn = rope_cos_sin(pos[:, t:t + 1], inv)
        h_t, cache2 = transformer.decoder_forward(
            cfg, params, x[:, t:t + 1], c, sn, cache2, prompt_cap=0)
        h_steps.append(h_t[:, 0])
    np.testing.assert_allclose(np.asarray(h_pre[:, -1]),
                               np.asarray(h_steps[-1]), atol=2e-4)
    # The second row's hidden must actually depend on the first row:
    x_swap = x.at[:, 0].set(x[:, 0] * -1.0)
    h_swap, _ = transformer.decoder_forward(
        cfg, params, x_swap, cos, sin,
        cache.replace(k=jnp.zeros_like(cache.k),
                      v=jnp.zeros_like(cache.v),
                      write_idx=jnp.zeros_like(cache.write_idx)),
        prompt_cap=0)
    assert np.abs(np.asarray(h_swap[:, -1]) -
                  np.asarray(h_pre[:, -1])).max() > 1e-4


def _fwd_with_carry(monkeypatch_env, cfg, params, x, cos, sin, cache,
                    prompt_cap, uniform_cursor=True):
    import os
    old = os.environ.get("QTTS_CARRY_KV")
    os.environ["QTTS_CARRY_KV"] = monkeypatch_env
    try:
        return transformer.decoder_forward(
            cfg, params, x, cos, sin, cache, prompt_cap=prompt_cap,
            uniform_cursor=uniform_cursor, a8=False)
    finally:
        if old is None:
            os.environ.pop("QTTS_CARRY_KV", None)
        else:
            os.environ["QTTS_CARRY_KV"] = old


def test_prefill_carry_parity(talker):
    """Carry-KV prefill (stacked cache through the scan carry) must match
    the xs/ys layer scan to fp32 rounding noise (same ops and order; XLA
    may fuse the two plumbings differently, so exact bit-equality is not
    guaranteed — observed max |diff| ~2e-6)."""
    cfg, params = talker
    from qwen3_tts_tpu.models.talker import _rope_tables
    b, s = 3, 10
    x = (jax.random.normal(jax.random.PRNGKey(20), (b, s, cfg.d_model))
         * 0.3).astype(jnp.dtype(cfg.dtype))
    pos = jnp.arange(s, dtype=jnp.int32)[None, :].repeat(b, 0)
    pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], axis=-1)
    cos, sin = _rope_tables(cfg, pos4)
    lengths = jnp.asarray([10, 6, 3], jnp.int32)

    outs = {}
    for env in ("0", "1"):
        cache = talker_lib.init_talker_cache(cfg, b, s + 16)
        cache = cache.replace(lengths=lengths)
        outs[env] = _fwd_with_carry(env, cfg, params, x, cos, sin, cache,
                                    prompt_cap=s)
    h0, c0 = outs["0"]
    h1, c1 = outs["1"]
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1.k, np.float32),
                               np.asarray(c0.k, np.float32), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1.v, np.float32),
                               np.asarray(c0.v, np.float32), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c1.write_idx),
                                  np.asarray(c0.write_idx))


def test_prefill_carry_parity_per_lane_cursor(talker):
    """Per-lane-cursor multi-row prefill (uniform_cursor=False): the carry
    path's scatter write must match the xs/ys path's vmapped
    dynamic_update_slice for in-bounds cursors."""
    cfg, params = talker
    from qwen3_tts_tpu.models.talker import _rope_tables
    b, s, cap = 2, 4, 24
    x = (jax.random.normal(jax.random.PRNGKey(21), (b, s, cfg.d_model))
         * 0.3).astype(jnp.dtype(cfg.dtype))
    starts = jnp.asarray([2, 5], jnp.int32)
    pos = starts[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], axis=-1)
    cos, sin = _rope_tables(cfg, pos4)

    outs = {}
    for env in ("0", "1"):
        cache = talker_lib.init_talker_cache(cfg, b, cap)
        cache = cache.replace(lengths=starts + s, write_idx=starts)
        outs[env] = _fwd_with_carry(env, cfg, params, x, cos, sin, cache,
                                    prompt_cap=s + 8, uniform_cursor=False)
    h0, c0 = outs["0"]
    h1, c1 = outs["1"]
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1.k, np.float32),
                               np.asarray(c0.k, np.float32), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1.v, np.float32),
                               np.asarray(c0.v, np.float32), atol=2e-5)
