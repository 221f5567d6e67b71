"""Unit tests for core ops: rmsnorm, rope/mrope, sampling, mel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.ops import attention, mel, norms, rope, sampling


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(norms.rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    expect = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_mrope_equals_rope_when_rows_equal():
    """T=H=W=pos and channel=0 with an empty channel section collapses to
    standard RoPE (the reference's position scheme, engine.rs:306-314)."""
    head_dim = 32
    inv = jnp.asarray(rope.inv_frequencies(head_dim, 10_000.0))
    sec = jnp.asarray(rope.section_ids((6, 5, 5, 0)))
    pos = jnp.arange(7, dtype=jnp.int32)
    pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], -1)
    cos_m, sin_m = rope.mrope_cos_sin(pos4, inv, sec)
    cos_s, sin_s = rope.rope_cos_sin(pos, inv)
    np.testing.assert_allclose(np.asarray(cos_m), np.asarray(cos_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_m), np.asarray(sin_s), atol=1e-6)


def test_mrope_channel_section_uses_channel_row():
    head_dim = 8
    inv = jnp.asarray(rope.inv_frequencies(head_dim, 10_000.0))
    sec = jnp.asarray(rope.section_ids((2, 1, 0, 1)))
    pos4 = jnp.asarray([[5, 5, 5, 0]], jnp.int32)
    cos, _ = rope.mrope_cos_sin(pos4, inv, sec)
    # last section (channel row, pos 0) must have cos == 1
    np.testing.assert_allclose(np.asarray(cos[0, 3]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cos[0, 7]), 1.0, atol=1e-6)


def test_rope_rotation_preserves_norm():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 4, 16)).astype(np.float32)
    inv = jnp.asarray(rope.inv_frequencies(16, 10_000.0))
    cos, sin = rope.rope_cos_sin(jnp.arange(3)[None].repeat(2, 0), inv)
    y = np.asarray(rope.apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-4)


def test_sampling_greedy():
    logits = jnp.asarray([[0.1, 3.0, -1.0, 2.0]])
    tok = sampling.sample_logits(logits, jax.random.PRNGKey(0),
                                 temperature=0.0, top_k=0, top_p=1.0)
    assert int(tok[0]) == 1


def test_sampling_top_k_restricts_support():
    logits = jnp.asarray([[5.0, 4.0, -10.0, -10.0, -10.0]])
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    toks = [int(sampling.sample_logits(logits, k, 1.0, 2, 1.0)[0])
            for k in keys[:50]]
    assert set(toks) <= {0, 1}
    assert len(set(toks)) == 2  # both top-2 get sampled at temp 1


def test_sampling_top_p_keeps_head():
    # p=0.5 with a dominant head must only ever return the head token.
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    for i in range(20):
        tok = sampling.sample_logits(logits, jax.random.PRNGKey(i),
                                     1.0, 0, 0.5)
        assert int(tok[0]) == 0


def test_sampling_seeded_deterministic():
    logits = jax.random.normal(jax.random.PRNGKey(3), (2, 100))
    a = sampling.sample_logits(logits, jax.random.PRNGKey(7), 0.8, 40, 0.9)
    b = sampling.sample_logits(logits, jax.random.PRNGKey(7), 0.8, 40, 0.9)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mel_matches_scalar_reference():
    """jnp STFT/mel path vs a direct numpy transliteration of the reference
    algorithm (onnx.rs:167-320)."""
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(24000 // 4) * 0.3).astype(np.float32)

    got = np.asarray(mel.log_mel(jnp.asarray(audio)))

    # scalar reference
    N_FFT, HOP, N_MELS = 1024, 256, 128
    pad = (N_FFT - HOP) // 2
    padded = np.concatenate([audio[1:pad + 1][::-1], audio,
                             audio[-pad - 1:-1][::-1]])
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    fb = mel.mel_filterbank()
    n_frames = (len(padded) - N_FFT) // HOP + 1
    expect = np.zeros((n_frames, N_MELS), np.float32)
    for f in range(n_frames):
        seg = padded[f * HOP:f * HOP + N_FFT] * window
        spec = np.fft.rfft(seg)
        mag = np.sqrt(np.abs(spec) ** 2 + 1e-9)
        expect[f] = np.log(np.maximum(fb @ mag, 1e-5))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


def test_history_mask_semantics():
    lengths = jnp.asarray([3, 5])
    m = np.asarray(attention.history_mask(lengths, prompt_cap=6, start=6,
                                          s=1, capacity=10))
    # stream 0: prompt slots 0..2 valid, 3..5 invalid, slot 6 (self) valid
    assert m[0, 0, :3].all() and not m[0, 0, 3:6].any() and m[0, 0, 6]
    # stream 1: prompt slots 0..4 valid
    assert m[1, 0, :5].all() and not m[1, 0, 5] and m[1, 0, 6]
    # future slots invalid
    assert not m[:, 0, 7:].any()


def test_sample_with_allowlist():
    # limit=3 plus allowlist {7}: only {0,1,2,7} can ever be drawn
    logits = jnp.asarray([[0., 1., 2., 9., 9., 9., 9., 3.]])
    seen = set()
    for i in range(30):
        tok = sampling.sample_with_allowlist(
            logits, jax.random.PRNGKey(i), limit=3, allow_tokens=[7],
            temperature=1.0, top_k=0, top_p=1.0)
        seen.add(int(tok[0]))
    assert seen <= {0, 1, 2, 7}
    assert 7 in seen  # the high-logit allowed token dominates
    # greedy picks the allowlisted argmax over the big-but-forbidden ones
    g = sampling.sample_with_allowlist(
        logits, jax.random.PRNGKey(0), 3, [7], 0.0, 0, 1.0)
    assert int(g[0]) == 7


def test_mrope_section_layout_matches_llama_cpp():
    """llama.cpp's GGML mrope assigns frequency i (i < n_dims/2) to position
    row 0/1/2/3 by CONTIGUOUS section blocks [s0 | s1 | s2 | s3] (not
    interleaved like HF Qwen2-VL).  With distinct rows the angle for
    frequency i must therefore use row_of_block(i)."""
    head_dim = 16                          # n_dims/2 = 8
    sections = (3, 2, 2, 1)
    inv = np.asarray(rope.inv_frequencies(head_dim, 10_000.0))
    sec = jnp.asarray(rope.section_ids(sections))
    t, h, w, e = 11, 5, 7, 2
    pos4 = jnp.asarray([[t, h, w, e]], jnp.int32)
    cos, sin = rope.mrope_cos_sin(pos4, jnp.asarray(inv), sec)
    rows = [t] * 3 + [h] * 2 + [w] * 2 + [e] * 1
    want_angles = np.asarray(rows, np.float32) * inv
    np.testing.assert_allclose(np.asarray(cos[0, :8]),
                               np.cos(want_angles), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0, :8]),
                               np.sin(want_angles), atol=1e-6)
