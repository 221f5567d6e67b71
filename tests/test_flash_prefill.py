"""Interpret-mode parity of the flash prefill-attention kernel vs the XLA
reference (ops.attention.gqa_attend + history_mask), over the mask cases
the engine actually produces: fresh prefill, padded short lanes, suffix
prefill at a nonzero cursor, and the generated-slot region."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.kernels.flash_prefill import (QTILE,
                                                 flash_gqa_prefill_stacked,
                                                 supported)
from qwen3_tts_tpu.ops.attention import gqa_attend, history_mask


def _ref(q, k_all, v_all, lengths, start, layer, prompt_cap, window):
    k_win = k_all[layer, :, :, :window]
    v_win = v_all[layer, :, :, :window]
    mask = history_mask(lengths, prompt_cap, start, q.shape[1], window)
    return gqa_attend(q, k_win, v_win, mask)


def _setup(b, s, h, hkv, dh, layers, cap, key):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32) * 0.3
    k_all = jax.random.normal(ks[1], (layers, b, hkv, cap, dh),
                              jnp.float32) * 0.3
    v_all = jax.random.normal(ks[2], (layers, b, hkv, cap, dh),
                              jnp.float32) * 0.3
    return (q.astype(jnp.bfloat16),
            k_all.astype(jnp.bfloat16), v_all.astype(jnp.bfloat16))


@pytest.mark.parametrize("case", ["fresh", "padded", "suffix", "generated"])
def test_flash_prefill_matches_xla(case):
    b, s, h, hkv, dh = 2, 2 * QTILE, 4, 2, 128
    cap = 4 * QTILE
    q, k_all, v_all = _setup(b, s, h, hkv, dh, 3, cap, jax.random.PRNGKey(0))
    layer = jnp.int32(1)

    if case == "fresh":
        lengths = jnp.asarray([s, s], jnp.int32)
        start, prompt_cap, window = jnp.int32(0), s, s
    elif case == "padded":
        lengths = jnp.asarray([s, QTILE // 2], jnp.int32)  # lane 1 short
        start, prompt_cap, window = jnp.int32(0), s, s
    elif case == "suffix":
        # continue at cursor QTILE after a prefix; window covers both
        lengths = jnp.asarray([QTILE + s, QTILE + s // 2], jnp.int32)
        start, prompt_cap, window = jnp.int32(QTILE), 3 * QTILE, 3 * QTILE
    else:  # generated-slot region visible (prompt_cap < window)
        lengths = jnp.asarray([QTILE, QTILE // 2], jnp.int32)
        start, prompt_cap, window = jnp.int32(QTILE), QTILE, 3 * QTILE

    assert supported(s, window, h, hkv, dh)
    got = flash_gqa_prefill_stacked(q, k_all, v_all, lengths, start, layer,
                                    prompt_cap, window, interpret=True)
    want = _ref(q, k_all, v_all, lengths, start, int(layer), prompt_cap,
                window)
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    # bf16 PV weights vs fp32: ~1e-2 relative on O(1) outputs
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_flash_prefill_per_lane_start():
    b, s, h, hkv, dh = 2, QTILE, 4, 2, 128
    cap = 4 * QTILE
    q, k_all, v_all = _setup(b, s, h, hkv, dh, 2, cap, jax.random.PRNGKey(1))
    start = jnp.asarray([0, QTILE], jnp.int32)
    lengths = jnp.asarray([s, QTILE + s], jnp.int32)
    window, prompt_cap = 2 * QTILE, 2 * QTILE
    got = flash_gqa_prefill_stacked(q, k_all, v_all, lengths, start,
                                    jnp.int32(0), prompt_cap, window,
                                    interpret=True)
    want = _ref(q, k_all, v_all, lengths, start, 0, prompt_cap, window)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_supported_gate():
    assert not supported(2, 17, 4, 2, 64)      # predictor per-frame shapes
    assert not supported(QTILE, 0, 4, 2, 128)
    assert not supported(QTILE + 8, QTILE, 4, 2, 128)
    assert supported(4096 // QTILE * QTILE, 4096, 16, 8, 128)
    assert not supported(QTILE, 640, 16, 8, 128)  # 640 % 512 != 0
