"""Pallas flash-decode kernel vs the XLA attention path (interpreter mode on
CPU; the compiled kernel runs on TPU in bench/production)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.kernels.flash_decode import flash_gqa_decode
from qwen3_tts_tpu.ops.attention import gqa_attend, history_mask


@pytest.mark.parametrize("b,hq,hkv,dh,cap,prompt_cap", [
    (1, 4, 2, 64, 640, 96),
    (2, 8, 4, 128, 1024, 512),
])
def test_flash_matches_xla(b, hq, hkv, dh, cap, prompt_cap):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, cap, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, cap, dh)), jnp.float32)
    lengths = jnp.asarray(rng.integers(4, prompt_cap, b), jnp.int32)
    write_idx = jnp.asarray(prompt_cap + 13, jnp.int32)

    got = flash_gqa_decode(q, k, v, lengths, write_idx, prompt_cap,
                           interpret=True)

    mask = history_mask(lengths, prompt_cap, write_idx, 1, cap)
    expect = gqa_attend(q[:, None].reshape(b, 1, hq, dh), k, v, mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-3, atol=2e-3)


def test_flash_ignores_dead_slots():
    """Garbage beyond write_idx and between length..prompt_cap must not leak."""
    b, hq, hkv, dh, cap, prompt_cap = 1, 2, 1, 64, 512, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, cap, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, cap, dh)), jnp.float32)
    lengths = jnp.asarray([40], jnp.int32)
    write_idx = jnp.asarray(prompt_cap + 2, jnp.int32)

    base = flash_gqa_decode(q, k, v, lengths, write_idx, prompt_cap,
                            interpret=True)
    # poison dead regions
    k2 = k.at[:, :, 40:prompt_cap].set(1e3)
    k2 = k2.at[:, :, prompt_cap + 3:].set(-1e3)
    v2 = v.at[:, :, 40:prompt_cap].set(1e3)
    poisoned = flash_gqa_decode(q, k2, v2, lengths, write_idx, prompt_cap,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(poisoned),
                               rtol=1e-5, atol=1e-5)


def test_flash_append_matches_xla_per_lane_cursors():
    """flash_gqa_decode_append: attention over per-lane prefixes + in-kernel
    cache append must equal manual append + masked XLA attention."""
    from qwen3_tts_tpu.kernels.flash_decode import flash_gqa_decode_append

    L, b, hq, hkv, dh, cap, prompt_cap = 3, 4, 8, 4, 128, 1024, 512
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, hq, dh)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((L, b, hkv, cap, dh)) * 0.3,
                        jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((L, b, hkv, cap, dh)) * 0.3,
                        jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, dh)) * 0.3, jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, dh)) * 0.3, jnp.float32)
    lengths = jnp.asarray(rng.integers(4, prompt_cap, b), jnp.int32)
    # ragged per-lane cursors (post-refill state)
    write_vec = jnp.asarray([prompt_cap, prompt_cap + 7, prompt_cap + 130,
                             cap - 1], jnp.int32)
    layer = jnp.int32(1)

    got_attn, got_k, got_v = flash_gqa_decode_append(
        q, k_all, v_all, k_new, v_new, lengths, write_vec, layer,
        prompt_cap, interpret=True)

    # reference: manual append + per-lane masked attention
    bi = np.arange(b)
    k_ref = np.array(k_all)
    v_ref = np.array(v_all)
    k_ref[1, bi, :, np.asarray(write_vec)] = np.asarray(k_new)
    v_ref[1, bi, :, np.asarray(write_vec)] = np.asarray(v_new)
    np.testing.assert_allclose(np.asarray(got_k), k_ref, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(got_v), v_ref, rtol=0, atol=0)

    mask = history_mask(lengths, prompt_cap, write_vec, 1, cap)
    expect = gqa_attend(q.reshape(b, 1, hq, dh),
                        jnp.asarray(k_ref[1]), jnp.asarray(v_ref[1]),
                        mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(expect),
                               rtol=2e-3, atol=2e-3)


def test_flash_append_ignores_stale_self_slot():
    """The slot being written may hold a previous occupant's garbage; the
    kernel must attend the NEW row, not the stale cache contents."""
    from qwen3_tts_tpu.kernels.flash_decode import flash_gqa_decode_append

    L, b, hq, hkv, dh, cap, prompt_cap = 1, 1, 2, 1, 128, 512, 128
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, hq, dh)), jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((L, b, hkv, cap, dh)) * 0.3,
                        jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((L, b, hkv, cap, dh)) * 0.3,
                        jnp.float32)
    # poison the about-to-be-written slot
    wv = prompt_cap + 5
    k_poison = k_all.at[0, :, :, wv].set(1e3)
    v_poison = v_all.at[0, :, :, wv].set(1e3)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, dh)) * 0.3, jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, dh)) * 0.3, jnp.float32)
    lengths = jnp.asarray([64], jnp.int32)
    write_vec = jnp.asarray([wv], jnp.int32)

    a1, k1, v1 = flash_gqa_decode_append(
        q, k_all, v_all, k_new, v_new, lengths, write_vec, jnp.int32(0),
        prompt_cap, interpret=True)
    a2, k2, v2 = flash_gqa_decode_append(
        q, k_poison, v_poison, k_new, v_new, lengths, write_vec,
        jnp.int32(0), prompt_cap, interpret=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=0)
