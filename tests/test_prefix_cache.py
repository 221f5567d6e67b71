"""Prompt-prefix KV reuse (engine._start_state / prefill_with_prefix).

A clone voice's prompt prefix (instruct + control + speaker + ref codes +
ref text) is identical across requests; generate_long re-prefilled it per
sentence in round 1.  These tests prove the continued prefill is
numerically identical to a full prefill and that the engine path stays
deterministic with the cache on."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import SamplerConfig


def _clone_voice(n_frames=20, seed=0):
    from qwen3_tts_tpu.io.voice_file import VoiceFile
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 8, size=n_frames * 16)
    return VoiceFile.new("ref transcript", codes,
                         rng.standard_normal(2048).astype(np.float32) * 0.02)


def test_prefix_continue_matches_full_prefill(tiny_engine):
    """start_with_prefix(prefix KV, suffix) must reproduce the full
    prefill's logits/hidden/pos exactly (same masks, same positions)."""
    eng = tiny_engine
    voice = _clone_voice()
    plan = eng._build_voice_prompt("task text here", voice, None)
    assert plan.prefix_len > 0
    assert plan.prefix_len + plan.suffix_plan().length == plan.length

    bucket = eng._bucket(plan.length)
    embeds, lengths = eng.prompt_to_device(plan, bucket)
    key = jax.random.PRNGKey(3)
    full = eng.generator.start(embeds, lengths, key)

    p_cap = ((plan.prefix_len + 63) // 64) * 64
    p_cap = min(p_cap, bucket)
    prefix_k = full.cache.k[:, :, :, :p_cap]
    prefix_v = full.cache.v[:, :, :, :p_cap]
    suffix = plan.suffix_plan()
    s_cap = ((suffix.length + 31) // 32) * 32
    total_bucket = eng._bucket(max(plan.length, p_cap,
                                   plan.prefix_len + s_cap))
    embeds_s, lens_s = eng.prompt_to_device(suffix, s_cap)
    cont = eng.generator.start_with_prefix(
        prefix_k, prefix_v, plan.prefix_len, embeds_s,
        jnp.asarray(lens_s), key, total_bucket=total_bucket)

    np.testing.assert_allclose(np.asarray(cont.logits),
                               np.asarray(full.logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cont.hidden),
                               np.asarray(full.hidden),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(cont.pos),
                                  np.asarray(full.pos))
    # suffix KV landed at the right slots: compare against the full cache
    lo, hi = plan.prefix_len, plan.length
    np.testing.assert_allclose(
        np.asarray(cont.cache.k[:, :, :, lo:hi], np.float32),
        np.asarray(full.cache.k[:, :, :, lo:hi], np.float32),
        rtol=2e-3, atol=2e-3)


def test_engine_prefix_cache_deterministic(tiny_engine, monkeypatch):
    """Same text + voice twice: the second run hits the prefix cache and
    must produce byte-identical audio (seeded)."""
    monkeypatch.setattr(type(tiny_engine), "PREFIX_CACHE_MIN_ROWS", 8)
    eng = tiny_engine
    eng.set_max_steps(6)
    eng._prefix_kv.clear()
    voice = _clone_voice(n_frames=12, seed=1)

    eng.set_sampler_config(SamplerConfig(seed=77))
    a = eng.generate_with_voice("cachetest", voice)
    assert len(eng._prefix_kv) == 1          # miss populated the cache
    eng.set_sampler_config(SamplerConfig(seed=77))
    b = eng.generate_with_voice("cachetest", voice)
    assert len(eng._prefix_kv) == 1          # hit, no new entry
    np.testing.assert_array_equal(a.samples, b.samples)

    # different task text, same voice: still a hit, still works
    eng.set_sampler_config(SamplerConfig(seed=78))
    c = eng.generate_with_voice("more", voice)
    assert np.isfinite(c.samples).all()
    assert len(eng._prefix_kv) == 1


def test_engine_prefix_cache_lru_and_isolation(tiny_engine, monkeypatch):
    """Different voices get different entries (no cross-voice reuse) and
    the LRU cap bounds memory."""
    monkeypatch.setattr(type(tiny_engine), "PREFIX_CACHE_MIN_ROWS", 8)
    eng = tiny_engine
    eng.set_max_steps(4)
    eng._prefix_kv.clear()
    eng._prefix_kv_max = 2
    eng.set_sampler_config(SamplerConfig(seed=5))
    outs = []
    voices = [_clone_voice(n_frames=12, seed=s) for s in range(3)]
    for v in voices:
        outs.append(eng.generate_with_voice("hello", v))
    assert len(eng._prefix_kv) == 2          # LRU evicted the first
    # regenerating with voice 0 (evicted) still deterministic vs cached run
    eng.set_sampler_config(SamplerConfig(seed=5))
    again = eng.generate_with_voice("hello", voices[0])
    np.testing.assert_array_equal(again.samples, outs[0].samples)


def test_prefix_cache_off_by_env(tiny_engine, monkeypatch):
    monkeypatch.setattr(type(tiny_engine), "PREFIX_CACHE_MIN_ROWS", 8)
    monkeypatch.setenv("QTTS_PREFIX_CACHE", "0")
    eng = tiny_engine
    eng.set_max_steps(4)
    eng._prefix_kv.clear()
    eng.set_sampler_config(SamplerConfig(seed=9))
    audio = eng.generate_with_voice("no cache", _clone_voice(seed=3))
    assert np.isfinite(audio.samples).all()
    assert len(eng._prefix_kv) == 0


def test_stale_suffix_rows_invisible(tiny_engine, monkeypatch):
    """The harvested prefix block [prefix_len, p_cap) contains the FIRST
    request's suffix K/V; a later, different-text request must not see it.
    On CPU the full and continue paths are bit-identical, so compare the
    cached run against a cache-off run of the same request."""
    monkeypatch.setattr(type(tiny_engine), "PREFIX_CACHE_MIN_ROWS", 8)
    eng = tiny_engine
    eng.set_max_steps(5)
    eng._prefix_kv.clear()
    voice = _clone_voice(n_frames=10, seed=9)

    # populate the cache with a LONGER suffix
    eng.set_sampler_config(SamplerConfig(seed=33))
    eng.generate_with_voice("abcdefgh", voice)  # dev tokenizer: 1 id/char
    # short suffix through the cache
    eng.set_sampler_config(SamplerConfig(seed=44))
    cached = eng.generate_with_voice("hi", voice)

    # ground truth: same request, cache disabled
    monkeypatch.setenv("QTTS_PREFIX_CACHE", "0")
    eng.set_sampler_config(SamplerConfig(seed=44))
    plain = eng.generate_with_voice("hi", voice)
    np.testing.assert_array_equal(cached.samples, plain.samples)


def test_prefix_near_cap_falls_back(tiny_engine, monkeypatch):
    """When prefix_len + suffix bucket would exceed max_prompt_len, the
    engine must fall back to the full-prefill path instead of letting
    suffix pad rows spill into the decode region."""
    monkeypatch.setattr(type(tiny_engine), "PREFIX_CACHE_MIN_ROWS", 8)
    eng = tiny_engine
    eng.set_max_steps(3)
    eng._prefix_kv.clear()
    # prefix ~52 rows + suffix cap 32 > tiny cap 64 -> fallback
    voice = _clone_voice(n_frames=26, seed=4)
    eng.set_sampler_config(SamplerConfig(seed=2))
    audio = eng.generate_with_voice("ok", voice)
    assert np.isfinite(audio.samples).all()
    assert len(eng._prefix_kv) == 0          # fallback did not populate
