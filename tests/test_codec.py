"""Codec model tests.  The crucial property is streaming correctness:
decoding chunk-by-chunk with carried state must equal decoding everything at
once (the reference validates this implicitly through its ONNX state
plumbing, onnx.rs:342-458; here it is an exact invariant by construction)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import (CodecDecoderConfig, CodecEncoderConfig,
                                       SpeakerEncoderConfig)
from qwen3_tts_tpu.models.codec import decoder as dec
from qwen3_tts_tpu.models.codec import encoder as enc
from qwen3_tts_tpu.models.codec import speaker as spk


@pytest.fixture(scope="module")
def decoder():
    cfg = CodecDecoderConfig.tiny()
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_decoder_shapes(decoder):
    cfg, params = decoder
    codes = jax.random.randint(jax.random.PRNGKey(1), (2, 5, 16), 0,
                               cfg.codebook_size)
    wav = dec.decode_full(cfg, params, codes)
    assert wav.shape == (2, 5 * cfg.samples_per_frame)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.abs(np.asarray(wav)) <= 1.0).all()


def test_decoder_streaming_equals_full(decoder):
    """Chunked decode (sizes 4,4,2) must be bit-comparable to one-shot."""
    cfg, params = decoder
    n = 10
    codes = jax.random.randint(jax.random.PRNGKey(2), (1, n, 16), 0,
                               cfg.codebook_size)
    full = np.asarray(dec.decode_full(cfg, params, codes))

    state = dec.init_decoder_state(cfg, params, batch=1)
    parts = []
    for lo, hi in ((0, 4), (4, 8), (8, 10)):
        wav, state = dec.decode_chunk(cfg, params, codes[:, lo:hi], state)
        parts.append(np.asarray(wav))
    streamed = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_decoder_streaming_exceeding_window(decoder):
    """Streaming past the attention window stays consistent chunk-to-chunk:
    two different chunkings agree."""
    cfg, params = decoder
    n = cfg.attn_window + 6
    codes = jax.random.randint(jax.random.PRNGKey(3), (1, n, 16), 0,
                               cfg.codebook_size)

    def run(sizes):
        state = dec.init_decoder_state(cfg, params, batch=1)
        parts, off = [], 0
        for s in sizes:
            wav, state = dec.decode_chunk(cfg, params, codes[:, off:off + s],
                                          state)
            parts.append(np.asarray(wav))
            off += s
        return np.concatenate(parts, axis=1)

    a = run([2] * (n // 2))
    b = run([1] * n)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_decoder_causality(decoder):
    """Changing a later frame's codes must not change earlier samples."""
    cfg, params = decoder
    codes = jax.random.randint(jax.random.PRNGKey(4), (1, 6, 16), 0,
                               cfg.codebook_size)
    codes2 = codes.at[0, 5].set((codes[0, 5] + 7) % cfg.codebook_size)
    a = np.asarray(dec.decode_full(cfg, params, codes))
    b = np.asarray(dec.decode_full(cfg, params, codes2))
    spf = cfg.samples_per_frame
    np.testing.assert_allclose(a[:, : 5 * spf], b[:, : 5 * spf], atol=1e-6)
    assert not np.allclose(a[:, 5 * spf:], b[:, 5 * spf:])


def test_encoder_shapes_and_range():
    cfg = CodecEncoderConfig.tiny()
    params = enc.init_encoder_params(cfg, jax.random.PRNGKey(5))
    spf = 1
    for r in cfg.downsample_factors:
        spf *= r
    wav = jax.random.normal(jax.random.PRNGKey(6), (2, spf * 7 + 3)) * 0.2
    codes = enc.encode(cfg, params, wav)
    assert codes.shape == (2, 7, cfg.n_codebooks)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < cfg.codebook_size).all()


def test_rvq_reduces_residual():
    rng = jax.random.PRNGKey(7)
    codebooks = jax.random.normal(rng, (4, 32, 8))
    z = jax.random.normal(jax.random.PRNGKey(8), (1, 5, 8))
    codes = enc.rvq_encode(codebooks, z)
    # reconstruct and check the quantization error is below the raw norm
    recon = jnp.zeros_like(z)
    for q in range(4):
        recon = recon + jnp.take(codebooks[q], codes[:, :, q], axis=0)
    err = float(jnp.linalg.norm(z - recon))
    base = float(jnp.linalg.norm(z))
    assert err < base


def test_speaker_embedding():
    cfg = SpeakerEncoderConfig.tiny()
    params = spk.init_speaker_params(cfg, jax.random.PRNGKey(9))
    wav = jax.random.normal(jax.random.PRNGKey(10), (24000 // 2,)) * 0.1
    emb = spk.speaker_embed(cfg, params, wav)
    assert emb.shape == (1, cfg.emb_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb)), 1.0, atol=1e-3)


@pytest.mark.slow
def test_production_size_decoder_window_invariance():
    """Round-1 gap: window-boundary behavior was only ever tested on the
    tiny config.  Run the PRODUCTION-size decoder (d_model 1024, 8 layers,
    attn_window 128) past its window and assert two different chunkings
    agree (VERDICT r1 item 8)."""
    import dataclasses
    # full size; f32 so chunking-logic errors aren't masked by (or mistaken
    # for) bf16 accumulation noise — the window math is dtype-independent
    cfg = dataclasses.replace(CodecDecoderConfig(), dtype="float32")
    assert cfg.attn_window == 128
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
    n = cfg.attn_window + 12          # 140 frames, crosses the window
    codes = jax.random.randint(jax.random.PRNGKey(4), (1, n, 16), 0,
                               cfg.codebook_size)

    def run(sizes):
        state = dec.init_decoder_state(cfg, params, batch=1)
        parts, off = [], 0
        for s in sizes:
            wav, state = dec.decode_chunk(cfg, params, codes[:, off:off + s],
                                          state)
            parts.append(np.asarray(wav))
            off += s
        return np.concatenate(parts, axis=1)

    a = run([4] * (n // 4))                       # engine chunk schedule
    b = run([7] * (n // 7))                       # misaligned chunking
    assert a.shape == (1, n * cfg.samples_per_frame)
    assert np.isfinite(a).all()
    # any window-boundary seam would be O(1); f32 chunk-invariance is exact
    np.testing.assert_allclose(a, b, atol=1e-4)
