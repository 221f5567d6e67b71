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
