"""Fused talker-step Pallas kernel vs the XLA decode path (interpret mode).

Validates the whole-step megakernel (kernels/talker_step.py): streamed
weights, chunked flash attention over the live cache prefix with per-lane
lengths, current-token append, cache write-back via input/output aliasing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import TalkerConfig
from qwen3_tts_tpu.models import transformer
from qwen3_tts_tpu.ops import quant as Q
from qwen3_tts_tpu.ops.rope import inv_frequencies, mrope_cos_sin, section_ids
from qwen3_tts_tpu.kernels.talker_step import talker_step_fused, supported

PCAP = 512            # prompt region == one KV chunk
CAP = 1024


@pytest.fixture(scope="module")
def setup():
    cfg = TalkerConfig(d_model=256, n_layers=2, n_heads=2, n_kv_heads=1,
                       head_dim=128, d_ff=256,
                       mrope_sections=(24, 20, 20, 0), dtype="bfloat16")
    params = transformer.init_decoder_params(cfg, jax.random.PRNGKey(0))
    params["layers"] = Q.quantize_decoder_layers(params["layers"])
    return cfg, params


def _cache_with_history(cfg, b, lengths, decoded, key):
    """A cache whose prompt slots [0, lengths[i]) and decode slots
    [PCAP, PCAP + decoded) hold random history; cursor at PCAP + decoded."""
    cache = transformer.init_kv_cache(cfg, b, CAP, jnp.bfloat16)
    k = jax.random.normal(key, cache.k.shape, jnp.float32) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 1), cache.v.shape,
                          jnp.float32) * 0.3
    return cache.replace(
        k=k.astype(jnp.bfloat16), v=v.astype(jnp.bfloat16),
        lengths=jnp.asarray(lengths, jnp.int32),
        write_idx=jnp.full((b,), PCAP + decoded, jnp.int32))


def _rope(cfg, pos, b):
    inv = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    sec = jnp.asarray(section_ids(cfg.mrope_sections))
    p = jnp.full((b, 1), pos, jnp.int32)
    pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
    return mrope_cos_sin(pos4, inv, sec)


def test_supported_gate():
    cfg = TalkerConfig()
    assert supported(cfg, 1)
    assert supported(cfg, 16)                     # batched fused-column mode
    assert supported(cfg, 32)
    assert supported(cfg, 48)                     # r5: 48/64/96-lane serving
    assert supported(cfg, 96)
    assert not supported(cfg, 6)                  # not a whole 8-lane group
    assert supported(cfg, 40)                     # any whole-8 group <= 96
    assert not supported(cfg, 104)                # beyond the VMEM budget
    assert not supported(TalkerConfig.tiny(), 1)  # head_dim 16


def test_fused_mode_resolution(monkeypatch):
    """QTTS_FUSED_TALKER resolution: unset defaults to w4a8 only where the
    kernel can run (TPU backends); explicit values pass through; 0 opts
    out.  On the CPU test backend the default must resolve to None."""
    from qwen3_tts_tpu.kernels.talker_step import fused_mode
    monkeypatch.delenv("QTTS_FUSED_TALKER", raising=False)
    assert fused_mode() is None          # cpu backend in tests
    monkeypatch.setenv("QTTS_FUSED_TALKER", "0")
    assert fused_mode() is None
    monkeypatch.setenv("QTTS_FUSED_TALKER", "")
    assert fused_mode() is None
    for explicit in ("bf16", "w8a8", "w4a8"):
        monkeypatch.setenv("QTTS_FUSED_TALKER", explicit)
        assert fused_mode() == explicit  # honored even off-TPU (tests use
    monkeypatch.setenv("QTTS_FUSED_TALKER", "1")     # interpret mode)
    assert fused_mode() == "int8"


@pytest.mark.parametrize("decoded", [0, 3])
def test_kernel_matches_xla_step(setup, decoded):
    cfg, params = setup
    b = 2
    lengths = [200, 512]     # lane 1 fills the whole prompt chunk
    cache = _cache_with_history(cfg, b, lengths, decoded,
                                jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (b, 1, cfg.d_model),
                          jnp.float32) * 0.3
    pos = PCAP + decoded
    cos, sin = _rope(cfg, pos, b)

    # XLA reference path (flash off on CPU automatically)
    hidden_ref, cache_ref = transformer.decoder_forward(
        cfg, params, x.astype(jnp.bfloat16), cos, sin, cache,
        prompt_cap=PCAP)

    hidden1, k_new, v_new = talker_step_fused(
        cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
        interpret=True)
    from qwen3_tts_tpu.ops.norms import rms_norm
    hidden = rms_norm(hidden1[:, None, :], params["final_norm"], cfg.rms_eps)

    np.testing.assert_allclose(
        np.asarray(hidden, np.float32), np.asarray(hidden_ref, np.float32),
        rtol=0.05, atol=0.05)

    # the written slot matches the XLA path's
    np.testing.assert_allclose(
        np.asarray(k_new[:, :, :, pos, :], np.float32),
        np.asarray(cache_ref.k[:, :, :, pos, :], np.float32),
        rtol=0.03, atol=0.03)
    np.testing.assert_allclose(
        np.asarray(v_new[:, :, :, pos, :], np.float32),
        np.asarray(cache_ref.v[:, :, :, pos, :], np.float32),
        rtol=0.03, atol=0.03)
    # untouched slots are preserved bit-for-bit (aliased in-place update)
    mask = np.ones(CAP, bool)
    mask[pos] = False
    np.testing.assert_array_equal(
        np.asarray(k_new[:, :, :, mask, :]),
        np.asarray(cache.k[:, :, :, mask, :]))


def test_kernel_two_consecutive_steps(setup):
    """Step t writes its k/v; step t+1 must attend to it (chained caches)."""
    cfg, params = setup
    b = 1
    cache = _cache_with_history(cfg, b, [128], 0, jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (b, 1, cfg.d_model),
                          jnp.float32) * 0.3

    # XLA path, two steps
    c_ref = cache
    h_ref = None
    for t in range(2):
        cos, sin = _rope(cfg, PCAP + t, b)
        h_ref, c_ref = transformer.decoder_forward(
            cfg, params, x.astype(jnp.bfloat16), cos, sin, c_ref,
            prompt_cap=PCAP)

    k, v = cache.k, cache.v
    for t in range(2):
        cos, sin = _rope(cfg, PCAP + t, b)
        h1, k, v = talker_step_fused(
            cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
            k, v, cache.lengths, jnp.int32(PCAP + t), PCAP, interpret=True)
    from qwen3_tts_tpu.ops.norms import rms_norm
    h = rms_norm(h1[:, None, :], params["final_norm"], cfg.rms_eps)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("mode,tol", [("bf16", 0.06), ("w8a8", 0.12),
                                      ("w4a8", 0.35)])
def test_kernel_weight_modes_match_xla(setup, mode, tol):
    """bf16 (pre-dequantized), w8a8 (int8 activation x int8 weight MXU
    dots) and w4a8 (half-split packed int4 weights, llama.cpp Q4-class)
    modes track the XLA path within their quantization budgets.
    w8a8's per-row activation quant is the same math class as the
    reference's llama.cpp Q8_0 (ggml quantizes activations to int8 too)."""
    cfg, params = setup
    b = 2
    cache = _cache_with_history(cfg, b, [200, 512], 0, jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (b, 1, cfg.d_model),
                          jnp.float32) * 0.3
    cos, sin = _rope(cfg, PCAP, b)
    hidden_ref, _ = transformer.decoder_forward(
        cfg, params, x.astype(jnp.bfloat16), cos, sin, cache,
        prompt_cap=PCAP)

    hidden1, _, _ = talker_step_fused(
        cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(PCAP), PCAP,
        interpret=True, weights=mode)
    from qwen3_tts_tpu.ops.norms import rms_norm
    hidden = rms_norm(hidden1[:, None, :], params["final_norm"], cfg.rms_eps)
    ref = np.asarray(hidden_ref, np.float32)
    got = np.asarray(hidden, np.float32)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < tol, f"{mode}: rel err {err}"


@pytest.mark.parametrize("mode", ["int8", "w8a8", "w4a8"])
def test_kernel_lps_matches_lps1(setup, mode):
    """layers-per-grid-step > 1 (fori_loop inside the body) must reproduce
    the one-layer-per-step schedule exactly — same ops, same single-slot
    DMA chaining, only the grid/loop boundary moves."""
    cfg, params = setup
    b = 2
    lengths = [200, 512]
    cache = _cache_with_history(cfg, b, lengths, 3, jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (b, cfg.d_model),
                          jnp.float32) * 0.3
    pos = PCAP + 3
    cos, sin = _rope(cfg, pos, b)

    outs = {}
    for lps in (1, 2):
        outs[lps] = talker_step_fused(
            cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
            cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
            interpret=True, weights=mode, lps=lps)
    for a, ref in zip(outs[2], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(ref))


def test_kernel_lps_four_layers():
    """lps=2 over 4 layers (grid=2): the fori boundary falls mid-stack and
    the weight-DMA chaining crosses it."""
    cfg = TalkerConfig(d_model=256, n_layers=4, n_heads=2, n_kv_heads=1,
                       head_dim=128, d_ff=256,
                       mrope_sections=(24, 20, 20, 0), dtype="bfloat16")
    params = transformer.init_decoder_params(cfg, jax.random.PRNGKey(1))
    params["layers"] = Q.quantize_decoder_layers(params["layers"])
    b = 2
    cache = _cache_with_history(cfg, b, [128, 512], 2, jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (b, cfg.d_model),
                          jnp.float32) * 0.3
    pos = PCAP + 2
    cos, sin = _rope(cfg, pos, b)
    ref = talker_step_fused(
        cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
        interpret=True, weights="w4a8", lps=1)
    got = talker_step_fused(
        cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
        interpret=True, weights="w4a8", lps=2)
    for a, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
    # invalid lps falls back to 1 (identical to ref)
    fb = talker_step_fused(
        cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
        interpret=True, weights="w4a8", lps=3)
    np.testing.assert_array_equal(np.asarray(fb[0]), np.asarray(ref[0]))


def test_kernel_sfold_matches_blocked_scales(setup):
    """Scale-fold (grouped scales streamed by manual DMA chained with the
    weight stream, QTTS_TALKER_SFOLD) is a DMA-schedule change only —
    bit-exact vs the auto-pipelined blocked-scale form, at lps 1 and 2."""
    cfg, params = setup
    b = 2
    cache = _cache_with_history(cfg, b, [200, 512], 2, jax.random.PRNGKey(21))
    x = jax.random.normal(jax.random.PRNGKey(22), (b, cfg.d_model),
                          jnp.float32) * 0.3
    pos = PCAP + 2
    cos, sin = _rope(cfg, pos, b)
    for lps in (1, 2):
        ref = talker_step_fused(
            cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
            cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
            interpret=True, weights="w4a8", lps=lps, sfold=False)
        got = talker_step_fused(
            cfg, params, x.astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
            cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
            interpret=True, weights="w4a8", lps=lps, sfold=True)
        for a, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


@pytest.mark.parametrize("b,decoded", [(8, 0), (8, 3), (16, 2), (48, 2)])
def test_kernel_batched_matches_xla(setup, b, decoded):
    """Batched fused-column mode (B >= 8): one masked dot per chunk over
    all lanes' columns must reproduce the XLA decode path per lane, with
    mixed prompt lengths and live decode history.  b=48 exercises the
    r5 B > 32 branch (ck=64 fused columns + lps clamp)."""
    cfg, params = setup
    lengths = [(64 * (i + 1)) % 512 or 512 for i in range(b)]
    cache = _cache_with_history(cfg, b, lengths, decoded,
                                jax.random.PRNGKey(31))
    x = jax.random.normal(jax.random.PRNGKey(32), (b, 1, cfg.d_model),
                          jnp.float32) * 0.3
    pos = PCAP + decoded
    cos, sin = _rope(cfg, pos, b)

    hidden_ref, cache_ref = transformer.decoder_forward(
        cfg, params, x.astype(jnp.bfloat16), cos, sin, cache,
        prompt_cap=PCAP)

    hidden1, k_new, v_new = talker_step_fused(
        cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, jnp.int32(pos), PCAP,
        interpret=True)
    from qwen3_tts_tpu.ops.norms import rms_norm
    hidden = rms_norm(hidden1[:, None, :], params["final_norm"], cfg.rms_eps)
    np.testing.assert_allclose(
        np.asarray(hidden, np.float32), np.asarray(hidden_ref, np.float32),
        rtol=0.05, atol=0.05)
    # per-lane cache append matches; untouched slots preserved bit-for-bit
    np.testing.assert_allclose(
        np.asarray(k_new[:, :, :, pos, :], np.float32),
        np.asarray(cache_ref.k[:, :, :, pos, :], np.float32),
        rtol=0.03, atol=0.03)
    mask = np.ones(CAP, bool)
    mask[pos] = False
    np.testing.assert_array_equal(
        np.asarray(k_new[:, :, :, mask, :]),
        np.asarray(cache.k[:, :, :, mask, :]))
    np.testing.assert_array_equal(
        np.asarray(v_new[:, :, :, mask, :]),
        np.asarray(cache.v[:, :, :, mask, :]))


@pytest.mark.parametrize("b", [2, 8])
def test_kernel_perlane_cursors_match_xla(setup, b):
    """Per-lane cursor mode (continuous batching): each lane attends to its
    OWN decode prefix [PCAP, start[b]) and appends at its own slot; the XLA
    carry path with uniform_cursor=False is the exact reference.  Covers
    both the unrolled (b=2) and fused-column batched (b=8) flash loops."""
    cfg, params = setup
    lengths = [(96 * (i + 1)) % 512 or 512 for i in range(b)]
    decoded = [(3 * i) % 6 for i in range(b)]        # ragged cursors
    cache = _cache_with_history(cfg, b, lengths, 0, jax.random.PRNGKey(51))
    starts = jnp.asarray([PCAP + d for d in decoded], jnp.int32)
    cache = cache.replace(write_idx=starts)
    x = jax.random.normal(jax.random.PRNGKey(52), (b, 1, cfg.d_model),
                          jnp.float32) * 0.3
    # per-lane rope at each lane's own position
    inv = jnp.asarray(inv_frequencies(cfg.head_dim, cfg.rope_theta))
    sec = jnp.asarray(section_ids(cfg.mrope_sections))
    p = starts[:, None]
    pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
    cos, sin = mrope_cos_sin(pos4, inv, sec)

    hidden_ref, cache_ref = transformer.decoder_forward(
        cfg, params, x.astype(jnp.bfloat16), cos, sin, cache,
        prompt_cap=PCAP, uniform_cursor=False)

    hidden1, k_new, v_new = talker_step_fused(
        cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0], sin[:, 0],
        cache.k, cache.v, cache.lengths, starts, PCAP,
        interpret=True)
    from qwen3_tts_tpu.ops.norms import rms_norm
    hidden = rms_norm(hidden1[:, None, :], params["final_norm"], cfg.rms_eps)
    np.testing.assert_allclose(
        np.asarray(hidden, np.float32), np.asarray(hidden_ref, np.float32),
        rtol=0.05, atol=0.05)
    # each lane's append lands at its OWN cursor; everything else preserved
    for i in range(b):
        s = PCAP + decoded[i]
        np.testing.assert_allclose(
            np.asarray(k_new[:, i, :, s, :], np.float32),
            np.asarray(cache_ref.k[:, i, :, s, :], np.float32),
            rtol=0.03, atol=0.03)
        np.testing.assert_allclose(
            np.asarray(v_new[:, i, :, s, :], np.float32),
            np.asarray(cache_ref.v[:, i, :, s, :], np.float32),
            rtol=0.03, atol=0.03)
        mask = np.ones(CAP, bool)
        mask[s] = False
        np.testing.assert_array_equal(
            np.asarray(k_new[:, i, :, mask, :]),
            np.asarray(cache.k[:, i, :, mask, :]))
        np.testing.assert_array_equal(
            np.asarray(v_new[:, i, :, mask, :]),
            np.asarray(cache.v[:, i, :, mask, :]))


def test_append_kv_lanes_inplace():
    """The standalone per-lane append kernel: written slots hold the new
    rows, every other slot of every lane is preserved bit-for-bit."""
    from qwen3_tts_tpu.kernels.flash_decode import append_kv_lanes
    L, B, HKV, C, DH = 2, 4, 1, 64, 128
    key = jax.random.PRNGKey(7)
    k = jax.random.normal(key, (L, B, HKV, C, DH)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1),
                          (L, B, HKV, C, DH)).astype(jnp.bfloat16)
    kt = jax.random.normal(jax.random.fold_in(key, 2),
                           (L, B, HKV, DH)).astype(jnp.bfloat16)
    vt = jax.random.normal(jax.random.fold_in(key, 3),
                           (L, B, HKV, DH)).astype(jnp.bfloat16)
    starts = jnp.asarray([0, 7, 8, 63], jnp.int32)   # window edges
    k2, v2 = append_kv_lanes(k, v, kt, vt, starts, interpret=True)
    for i, s in enumerate([0, 7, 8, 63]):
        np.testing.assert_array_equal(np.asarray(k2[:, i, :, s, :]),
                                      np.asarray(kt[:, i]))
        np.testing.assert_array_equal(np.asarray(v2[:, i, :, s, :]),
                                      np.asarray(vt[:, i]))
        mask = np.ones(C, bool)
        mask[s] = False
        np.testing.assert_array_equal(np.asarray(k2[:, i, :, mask, :]),
                                      np.asarray(k[:, i, :, mask, :]))
        np.testing.assert_array_equal(np.asarray(v2[:, i, :, mask, :]),
                                      np.asarray(v[:, i, :, mask, :]))


def test_kernel_batched_lanes_match_single(setup):
    """8 identical lanes through the batched kernel == the 1-lane kernel:
    the fused-column masking must keep lanes fully isolated."""
    cfg, params = setup
    b = 8
    cache1 = _cache_with_history(cfg, 1, [200], 2, jax.random.PRNGKey(41))
    kb = jnp.broadcast_to(cache1.k, cache1.k.shape[:1] + (b,)
                          + cache1.k.shape[2:])
    vb = jnp.broadcast_to(cache1.v, cache1.v.shape[:1] + (b,)
                          + cache1.v.shape[2:])
    lengths_b = jnp.full((b,), 200, jnp.int32)
    x1 = jax.random.normal(jax.random.PRNGKey(42), (1, cfg.d_model),
                           jnp.float32) * 0.3
    xb = jnp.broadcast_to(x1, (b, cfg.d_model))
    pos = PCAP + 2
    cos1, sin1 = _rope(cfg, pos, 1)
    cosb, sinb = _rope(cfg, pos, b)

    h1, k1, v1 = talker_step_fused(
        cfg, params, x1.astype(jnp.bfloat16), cos1[:, 0], sin1[:, 0],
        cache1.k, cache1.v, cache1.lengths, jnp.int32(pos), PCAP,
        interpret=True, weights="w4a8")
    hb, kbn, vbn = talker_step_fused(
        cfg, params, xb.astype(jnp.bfloat16), cosb[:, 0], sinb[:, 0],
        kb, vb, lengths_b, jnp.int32(pos), PCAP,
        interpret=True, weights="w4a8")
    # every batched lane agrees with every other lane...
    for i in range(1, b):
        np.testing.assert_array_equal(np.asarray(hb[i]), np.asarray(hb[0]))
        np.testing.assert_array_equal(np.asarray(kbn[:, i]),
                                      np.asarray(kbn[:, 0]))
    # ...and tracks the single-lane kernel within attention-dtype noise
    # (batched scores use bf16 MXU inputs; the 1-lane loop dots f32)
    np.testing.assert_allclose(np.asarray(hb[0], np.float32),
                               np.asarray(h1[0], np.float32),
                               rtol=0.05, atol=0.05)
