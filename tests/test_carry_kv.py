"""Carry-KV decode path (models/transformer._decode_step_carry): the stacked
KV cache rides the layer-scan carry with one-slot appends, eliminating the
per-layer full-capacity cache copies of the xs/ys scan.  Numerics must be
IDENTICAL to the legacy path in both cursor modes, and the stacked flash
kernel must match the per-layer kernel in interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import TalkerConfig
from qwen3_tts_tpu.models import transformer
from qwen3_tts_tpu.ops.rope import inv_frequencies, rope_cos_sin


@pytest.fixture(scope="module")
def setup():
    cfg = TalkerConfig(d_model=64, n_layers=3, n_heads=4, n_kv_heads=2,
                       head_dim=16, d_ff=96, mrope_sections=(3, 3, 2, 0),
                       dtype="float32", flash_decode=False)
    params = transformer.init_decoder_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _cache(cfg, b, cap, lengths, cursor):
    cache = transformer.init_kv_cache(cfg, b, cap, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(7), cache.k.shape) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(8), cache.v.shape) * 0.3
    return cache.replace(
        k=k, v=v, lengths=jnp.asarray(lengths, jnp.int32),
        write_idx=jnp.asarray(cursor, jnp.int32))


def _rope(cfg, pos, b):
    inv = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    p = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1, 1), (b, 1))
    return rope_cos_sin(p, inv)


@pytest.mark.parametrize("uniform", [True, False])
def test_carry_matches_legacy_decode(setup, monkeypatch, uniform):
    cfg, params = setup
    b, cap, pcap = 2, 40, 16
    lengths = [10, 16]
    cursor = [20, 20] if uniform else [20, 24]
    x = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.d_model)) * 0.3
    cos, sin = _rope(cfg, [20, 20] if uniform else [20, 24], b)

    monkeypatch.setenv("QTTS_CARRY_KV", "0")
    h_ref, c_ref = transformer.decoder_forward(
        cfg, params, x, cos, sin, _cache(cfg, b, cap, lengths, cursor),
        prompt_cap=pcap, uniform_cursor=uniform)

    monkeypatch.setenv("QTTS_CARRY_KV", "1")
    h_new, c_new = transformer.decoder_forward(
        cfg, params, x, cos, sin, _cache(cfg, b, cap, lengths, cursor),
        prompt_cap=pcap, uniform_cursor=uniform)

    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_new.k), np.asarray(c_ref.k),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_new.v), np.asarray(c_ref.v),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c_new.write_idx),
                                  np.asarray(c_ref.write_idx))


def test_carry_multi_step_chain(setup, monkeypatch):
    """Three chained decode steps agree between the paths (the carried
    cache from step t must be readable at t+1)."""
    cfg, params = setup
    b, cap, pcap = 1, 40, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (b, 1, cfg.d_model)) * 0.3

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("QTTS_CARRY_KV", flag)
        cache = _cache(cfg, b, cap, [12], [pcap])
        hs = []
        xx = x
        for t in range(3):
            cos, sin = _rope(cfg, [pcap + t], b)
            h, cache = transformer.decoder_forward(
                cfg, params, xx, cos, sin, cache, prompt_cap=pcap)
            hs.append(np.asarray(h))
            xx = h  # feed hidden back as next input
        outs[flag] = np.concatenate(hs)
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=1e-6, atol=1e-6)


def test_stacked_flash_matches_per_layer_kernel():
    """flash_gqa_decode_stacked(l) == flash_gqa_decode on cache[l]
    (interpret mode; dh=128 per Mosaic lane rules)."""
    from qwen3_tts_tpu.kernels.flash_decode import (CHUNK, flash_gqa_decode,
                                                    flash_gqa_decode_stacked)
    L, B, HKV, G, DH = 3, 2, 2, 2, 128
    CAP = CHUNK  # aligned capacity
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, HKV * G, DH), jnp.float32) * 0.3
    k_all = jax.random.normal(k2, (L, B, HKV, CAP, DH), jnp.float32) * 0.3
    v_all = jax.random.normal(k3, (L, B, HKV, CAP, DH), jnp.float32) * 0.3
    lengths = jnp.asarray([60, 100], jnp.int32)
    write = jnp.asarray([140, 150], jnp.int32)
    pcap = 128
    for l in range(L):
        want = flash_gqa_decode(q, k_all[l], v_all[l], lengths, write,
                                pcap, interpret=True)
        got = flash_gqa_decode_stacked(q, k_all, v_all, lengths, write,
                                       jnp.int32(l), pcap, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6, err_msg=f"l={l}")


def test_stacked_flash_rejects_misaligned_capacity():
    from qwen3_tts_tpu.kernels.flash_decode import flash_gqa_decode_stacked
    q = jnp.zeros((1, 4, 128))
    k = jnp.zeros((2, 1, 2, 100, 128))
    with pytest.raises(ValueError):
        flash_gqa_decode_stacked(q, k, k, jnp.asarray([5]), 50,
                                 jnp.int32(0), 32)
