"""Chunk megakernel (kernels/chunk_step.py) vs per-frame references, in
Pallas interpret mode.

Comparison policy: the kernel and any re-derived reference are two
SEPARATELY COMPILED XLA programs, so f32 fusion rounding differs at the
last ulp and cascades through 16 predictor tokens x layers — debugging
taps showed every structural quantity (rms, qkv, rope, attention context,
residuals, weight/scale loads) matching EXACTLY while a near-tie greedy
argmax over ~2048 flat random logits can still flip.  Tests therefore
assert (a) exact equality on the bit-stable pieces (frame-0 code path,
untouched cache slots, sampler math), (b) tolerance-bounded logits
everywhere, and (c) argmax equality only where the reference's top-2 gap
exceeds the observed fusion-rounding band.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import PredictorConfig, TalkerConfig
from qwen3_tts_tpu.models import transformer
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.kernels import chunk_step as cs
from qwen3_tts_tpu.kernels.talker_step import prep_layer_weights
from qwen3_tts_tpu.ops.rope import inv_frequencies, mrope_cos_sin, section_ids

PCAP = 512
CAP = 1024
START = PCAP + 5          # ragged mid-chunk cursor
LOGIT_TOL = 0.35          # fusion-rounding band observed in taps (~0.09 max)
GAP = 0.25                # argmax asserted only above this top-2 gap


@pytest.fixture(scope="module")
def setup():
    tcfg = TalkerConfig(d_model=256, n_layers=2, n_heads=2, n_kv_heads=1,
                        head_dim=128, d_ff=256,
                        mrope_sections=(24, 20, 20, 0), dtype="bfloat16")
    pcfg = PredictorConfig(d_model=256, n_layers=2, n_heads=4, n_kv_heads=2,
                           head_dim=64, d_ff=256, dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tparams = transformer.init_decoder_params(tcfg, k1)
    tparams["codec_head"] = (
        jax.random.normal(jax.random.fold_in(k1, 7),
                          (tcfg.n_codec_logits, tcfg.d_model),
                          jnp.float32) * 0.05).astype(jnp.bfloat16)
    pparams = predictor_lib.init_predictor_params(pcfg, k2)

    rng = np.random.default_rng(3)
    pack = {
        "proj_w": jnp.asarray(rng.standard_normal(
            (pcfg.d_model, tcfg.d_model)) * 0.05, jnp.float32),
        "proj_b": jnp.asarray(rng.standard_normal(pcfg.d_model) * 0.01,
                              jnp.float32),
        "tts_pad": jnp.asarray(rng.standard_normal(tcfg.d_model) * 0.02,
                               jnp.float32),
        "codec_tables": jnp.asarray(rng.standard_normal(
            (16, 2160, tcfg.d_model)) * 0.02, jnp.float32),
        "codec_tables_1024": jnp.asarray(rng.standard_normal(
            (16, 2048, pcfg.d_model)) * 0.02, jnp.float32),
    }
    pred_w = cs.prep_predictor_w4(pcfg, pparams)
    extras = cs.prep_chunk_extras(tcfg, pcfg, tparams, pparams, pack)
    layer_w = prep_layer_weights(tcfg, tparams, weights="w4a8")
    tp = dict(tparams)
    tp["fused_w4a8"] = layer_w
    return tcfg, pcfg, tp, tparams, pparams, pred_w, extras, k3


def _cache_with_history(tcfg, b, length, key):
    cache = transformer.init_kv_cache(tcfg, b, CAP, jnp.bfloat16)
    k = jax.random.normal(key, cache.k.shape, jnp.float32) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 1), cache.v.shape,
                          jnp.float32) * 0.3
    return cache.replace(
        k=k.astype(jnp.bfloat16), v=v.astype(jnp.bfloat16),
        lengths=jnp.full((b,), length, jnp.int32),
        write_idx=jnp.full((b,), START, jnp.int32))


def _run_kernel(setup, logits, hidden, k_c, v_c, lengths, start, n_frames,
                temp=0.0, u=None):
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    B = hidden.shape[0]
    if u is None:
        u = jnp.zeros((n_frames, B), jnp.float32)
    sv = jnp.asarray([[temp, 40.0, 0.9, 0.0]], jnp.float32)
    return cs.gen_chunk_fused(
        tcfg, pcfg, tp, pred_w, extras, logits, hidden, k_c, v_c,
        lengths, jnp.int32(start), jnp.full((B,), start, jnp.int32),
        u, sv, n_frames=n_frames, prompt_cap=PCAP, interpret=True)


def _gap_codes_equal(ref_logits_tokens, codes_a, codes_b):
    """Assert per-token argmax equality wherever the top-2 gap is clear."""
    checked = 0
    for t, rl in enumerate(ref_logits_tokens):
        rl = np.asarray(rl)[0]
        top2 = np.sort(rl)[-2:]
        if top2[1] - top2[0] > GAP:
            assert int(codes_a[t]) == int(codes_b[t]), \
                (t, int(codes_a[t]), int(codes_b[t]), top2)
            checked += 1
    return checked


def test_supported_gate(setup):
    tcfg, pcfg, *_ = setup
    assert cs.supported(tcfg, pcfg, 1, 4)
    assert not cs.supported(tcfg, pcfg, 2, 4)      # no odd small batches
    assert not cs.supported(tcfg, pcfg, 1, 9)
    assert cs.supported(tcfg, pcfg, 8, 8)
    assert cs.supported(tcfg, pcfg, 16, 8)
    # b=24/32 fit VMEM only at the serving chunk shape (<= 4 frames)
    assert cs.supported(tcfg, pcfg, 24, 4)
    assert cs.supported(tcfg, pcfg, 32, 4)
    assert not cs.supported(tcfg, pcfg, 32, 8)
    assert not cs.supported(tcfg, pcfg, 48, 4)     # talker kernel ceiling


def test_sampler_greedy_and_distribution():
    rng = np.random.default_rng(0)
    lg = rng.standard_normal((2, cs.VP)).astype(np.float32) * 2.0
    lg[:, cs.V_CODEC:] = cs.NEG_INF
    lgj = jnp.asarray(lg)
    out = cs._sample_inkernel(lgj, jnp.zeros((2, 1)), 0.0, 40, 0.9)
    np.testing.assert_array_equal(np.asarray(out)[:, 0],
                                  np.asarray(jnp.argmax(lgj, axis=-1)))
    # sampled mode: support membership + empirical dist vs the sorted
    # reference semantics of ops.sampling.sample_logits
    temp, k, p = 0.7, 40, 0.9
    order = np.argsort(-lg[0])
    keepk = np.arange(cs.VP) < k
    pr = np.exp((lg[0][order] - lg[0][order][0]) / temp) * keepk
    pr /= pr.sum()
    cum = np.cumsum(pr)
    keepp = (cum - pr) < p
    support = set(order[keepk & keepp].tolist())
    fin = np.where(keepk & keepp, pr, 0)
    fin /= fin.sum()
    probs_ref = np.zeros(cs.VP)
    probs_ref[order] = fin
    n = 4000
    us = jnp.asarray(rng.random((n, 1)), jnp.float32)
    outs = np.asarray(cs._sample_inkernel(
        jnp.broadcast_to(lgj[:1], (n, cs.VP)), us, temp, k, p))[:, 0]
    assert all(int(o) in support for o in outs)
    emp = np.bincount(outs, minlength=cs.VP) / n
    assert np.abs(emp - probs_ref).max() < 0.05


def test_predictor_phase_matches_spec(setup):
    """F=1 kernel vs the plain-array spec fn on the SAME state: per-token
    logits within the fusion band, argmax equal where the gap is clear,
    code_0 exact (pure argmax of the input logits)."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    cache0 = _cache_with_history(tcfg, 1, 100, key)
    logits0 = jax.random.normal(jax.random.fold_in(key, 2),
                                (1, tcfg.n_codec_logits), jnp.float32)
    hidden0 = jax.random.normal(jax.random.fold_in(key, 3),
                                (1, tcfg.d_model), jnp.float32) * 0.3

    codes_k, *_ = _run_kernel(setup, logits0, hidden0, cache0.k, cache0.v,
                              cache0.lengths, START, 1)
    plog = np.asarray(cs.gen_chunk_fused.last_plog[0])

    c0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    assert int(codes_k[0, 0, 0]) == int(c0[0])
    h1024 = (hidden0.astype(jnp.float32) @ extras["proj_w"]
             + extras["proj_b"][0])
    px0 = jnp.zeros((8, pcfg.d_model),
                    jnp.bfloat16).at[:1].set(h1024.astype(jnp.bfloat16))
    taps = []
    pc = cs.reference_predict_frame_w4(
        pcfg, pred_w, extras["pfn"], extras["phead_q"], extras["phead_s"],
        extras["ctab_pred"], px0, c0, taps=taps)[:1]

    for t in range(1, cs.N_TOKENS):
        np.testing.assert_allclose(plog[t, 0], np.asarray(taps[t - 1])[0],
                                   atol=LOGIT_TOL, rtol=0.05)
    checked = _gap_codes_equal(taps, np.asarray(codes_k)[0, 0, 1:],
                               np.asarray(pc)[0, 1:])
    assert checked >= 4       # the seed must actually exercise the compare


def test_chunk_greedy_chain(setup):
    """F=3 chunk: determinism, range/finiteness invariants, frame-0 parity
    vs the spec fn, untouched-cache bit-identity."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    F, B = 3, 1
    cache0 = _cache_with_history(tcfg, B, 100, key)
    logits0 = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, tcfg.n_codec_logits), jnp.float32)
    hidden0 = jax.random.normal(jax.random.fold_in(key, 3),
                                (B, tcfg.d_model), jnp.float32) * 0.3

    codes_k, logits_k, hidden_k, k_k, v_k = _run_kernel(
        setup, logits0, hidden0, cache0.k, cache0.v, cache0.lengths,
        START, F)
    codes_k2, _, _, _, _ = _run_kernel(
        setup, logits0, hidden0, cache0.k, cache0.v, cache0.lengths,
        START, F)
    np.testing.assert_array_equal(np.asarray(codes_k), np.asarray(codes_k2))

    c0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    h1024 = (hidden0.astype(jnp.float32) @ extras["proj_w"]
             + extras["proj_b"][0])
    px0 = jnp.zeros((8, pcfg.d_model),
                    jnp.bfloat16).at[:1].set(h1024.astype(jnp.bfloat16))
    taps = []
    pc = cs.reference_predict_frame_w4(
        pcfg, pred_w, extras["pfn"], extras["phead_q"], extras["phead_s"],
        extras["ctab_pred"], px0, c0, taps=taps)[:1]
    _gap_codes_equal(taps, np.asarray(codes_k)[0, 0, 1:],
                     np.asarray(pc)[0, 1:])
    assert int(codes_k[0, 0, 0]) == int(c0[0])

    ck = np.asarray(codes_k)
    assert (ck[:, :, 0] < cs.V_CODEC).all() and (ck >= 0).all()
    assert (ck[:, :, 1:] < 2048).all()
    assert np.isfinite(np.asarray(logits_k)[:, :cs.V_CODEC]).all()
    assert np.isfinite(np.asarray(hidden_k)).all()
    np.testing.assert_array_equal(
        np.asarray(k_k[:, :, :, :START], np.float32),
        np.asarray(cache0.k[:, :, :, :START], np.float32))
    assert np.abs(np.asarray(k_k[:, :, :, START:START + F],
                             np.float32)).sum() > 0


def test_chunk_matches_framewise_resync(setup):
    """F=2 chunk vs two F=1 chunks with state threading: frames must agree
    within the fusion band (the F=2 path attends chunk-local tokens from
    VMEM; the resync path reads them from the HBM cache)."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    B = 1
    cache0 = _cache_with_history(tcfg, B, 100, key)
    logits0 = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, tcfg.n_codec_logits), jnp.float32)
    hidden0 = jax.random.normal(jax.random.fold_in(key, 3),
                                (B, tcfg.d_model), jnp.float32) * 0.3

    c2, lg2, hd2, k2, v2 = _run_kernel(
        setup, logits0, hidden0, cache0.k, cache0.v, cache0.lengths,
        START, 2)

    ca, lga, hda, ka, va = _run_kernel(
        setup, logits0, hidden0, cache0.k, cache0.v, cache0.lengths,
        START, 1)
    cb, lgb, hdb, kb, vb = _run_kernel(
        setup, lga, hda, ka, va, cache0.lengths, START + 1, 1)

    np.testing.assert_array_equal(np.asarray(c2)[:, 0], np.asarray(ca)[:, 0])
    same = (np.asarray(c2)[0, 1] == np.asarray(cb)[0, 0]).mean()
    assert same >= 0.8, (np.asarray(c2)[0, 1], np.asarray(cb)[0, 0])
    np.testing.assert_allclose(np.asarray(lg2)[:, :cs.V_CODEC],
                               np.asarray(lgb)[:, :cs.V_CODEC],
                               atol=LOGIT_TOL, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(k2[:, :, :, START:START + 2], np.float32),
        np.asarray(kb[:, :, :, START:START + 2], np.float32),
        atol=0.05, rtol=0.05)


def test_chunk_batched_lane_isolation(setup):
    """Batched fused-column mode (B=8): lanes 0-3 duplicate lanes 4-7, so
    every output of lane i must EXACTLY equal lane i+4 (same path, same
    rounding) — the fused-column masking must keep lanes fully isolated.
    Frame-0 code_0 is the argmax of the input logits per lane (exact)."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    B, F = 8, 2
    c4 = _cache_with_history(tcfg, 4, 100, key)
    tile = lambda a: jnp.concatenate([a, a], axis=1)     # [L, 4,...] -> 8
    k8, v8 = tile(c4.k), tile(c4.v)
    lengths8 = jnp.concatenate([c4.lengths, c4.lengths])
    lg4 = jax.random.normal(jax.random.fold_in(key, 12),
                            (4, tcfg.n_codec_logits), jnp.float32)
    hd4 = jax.random.normal(jax.random.fold_in(key, 13),
                            (4, tcfg.d_model), jnp.float32) * 0.3
    lg8 = jnp.concatenate([lg4, lg4])
    hd8 = jnp.concatenate([hd4, hd4])

    codes, lg_out, hd_out, k_out, v_out = _run_kernel(
        setup, lg8, hd8, k8, v8, lengths8, START, F)
    cn = np.asarray(codes)
    for i in range(4):
        np.testing.assert_array_equal(cn[i], cn[i + 4])
        np.testing.assert_array_equal(np.asarray(lg_out)[i],
                                      np.asarray(lg_out)[i + 4])
        np.testing.assert_array_equal(np.asarray(k_out[:, i]),
                                      np.asarray(k_out[:, i + 4]))
    c0 = np.asarray(jnp.argmax(lg8, axis=-1))
    np.testing.assert_array_equal(cn[:, 0, 0], c0)
    # untouched cache slots preserved bit-for-bit; appended slots written
    np.testing.assert_array_equal(
        np.asarray(k_out[:, :, :, :START], np.float32),
        np.asarray(k8[:, :, :, :START], np.float32))
    assert np.abs(np.asarray(k_out[:, :, :, START:START + F],
                             np.float32)).sum() > 0


def test_chunk_batched_b32_lane_isolation(setup):
    """b=32 (the serving batch the r5 extension adds): lanes 0-15 duplicate
    lanes 16-31 — every output of lane i must EXACTLY equal lane i+16
    through the fused-column masked dots, the lps=2 clamp, and the shared
    (non-inloop) feedback-gather path.  F=2 (b>=24 is gated to the <=4
    serving chunk shape)."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    F = 2
    c16 = _cache_with_history(tcfg, 16, 100, key)
    tile = lambda a: jnp.concatenate([a, a], axis=1)     # [L, 16,..] -> 32
    k32, v32 = tile(c16.k), tile(c16.v)
    lengths32 = jnp.concatenate([c16.lengths, c16.lengths])
    lg16 = jax.random.normal(jax.random.fold_in(key, 32),
                             (16, tcfg.n_codec_logits), jnp.float32)
    hd16 = jax.random.normal(jax.random.fold_in(key, 33),
                             (16, tcfg.d_model), jnp.float32) * 0.3
    lg32 = jnp.concatenate([lg16, lg16])
    hd32 = jnp.concatenate([hd16, hd16])

    codes, lg_out, hd_out, k_out, v_out = _run_kernel(
        setup, lg32, hd32, k32, v32, lengths32, START, F)
    cn = np.asarray(codes)
    lgn = np.asarray(lg_out)
    kn = np.asarray(k_out)
    for i in range(16):
        np.testing.assert_array_equal(cn[i], cn[i + 16])
        np.testing.assert_array_equal(lgn[i], lgn[i + 16])
        np.testing.assert_array_equal(kn[:, i], kn[:, i + 16])
    c0 = np.asarray(jnp.argmax(lg32, axis=-1))
    np.testing.assert_array_equal(cn[:, 0, 0], c0)
    np.testing.assert_array_equal(
        np.asarray(k_out[:, :, :, :START], np.float32),
        np.asarray(k32[:, :, :, :START], np.float32))
    assert np.abs(np.asarray(k_out[:, :, :, START:START + F],
                             np.float32)).sum() > 0


def test_chunk_batched_matches_single(setup):
    """B=8 identical lanes vs the B=1 kernel, ONE frame: the batched flash
    loop dots bf16 q/k (the unrolled loop dots f32), so the post-talker
    logits/hidden agree within the fusion band.  F is pinned to 1 — any
    longer and a near-tie argmax flip in the next frame's 16 codes swaps
    the feedback embedding entirely (different token, legitimately
    different outputs; the lane-isolation test above covers multi-frame
    behavior exactly because both sides share one precision path)."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    F = 1
    c1 = _cache_with_history(tcfg, 1, 100, key)
    lg1 = jax.random.normal(jax.random.fold_in(key, 22),
                            (1, tcfg.n_codec_logits), jnp.float32)
    hd1 = jax.random.normal(jax.random.fold_in(key, 23),
                            (1, tcfg.d_model), jnp.float32) * 0.3
    bc = lambda a: jnp.broadcast_to(a, (a.shape[0], 8) + a.shape[2:])
    k8 = jnp.asarray(bc(c1.k))
    v8 = jnp.asarray(bc(c1.v))
    lg8 = jnp.broadcast_to(lg1, (8,) + lg1.shape[1:])
    hd8 = jnp.broadcast_to(hd1, (8,) + hd1.shape[1:])
    lengths8 = jnp.full((8,), 100, jnp.int32)

    c_1, lgo_1, hdo_1, _, _ = _run_kernel(
        setup, lg1, hd1, c1.k, c1.v, c1.lengths, START, F)
    c_8, lgo_8, hdo_8, _, _ = _run_kernel(
        setup, lg8, hd8, k8, v8, lengths8, START, F)
    # frame 0: the whole expand phase is talker-attention-free -> exact
    np.testing.assert_array_equal(np.asarray(c_8)[0, 0],
                                  np.asarray(c_1)[0, 0])
    np.testing.assert_allclose(np.asarray(lgo_8)[0, :cs.V_CODEC],
                               np.asarray(lgo_1)[0, :cs.V_CODEC],
                               atol=LOGIT_TOL, rtol=0.05)
    np.testing.assert_allclose(np.asarray(hdo_8)[0], np.asarray(hdo_1)[0],
                               atol=0.25, rtol=0.05)


def test_chunk_kernel_sampled_support(setup):
    """temp > 0: frame-0 code_0 must come from the top-k/top-p support set
    of the input logits for any u."""
    tcfg, pcfg, tp, tparams, pparams, pred_w, extras, key = setup
    B = 1
    cache0 = _cache_with_history(tcfg, B, 64, key)
    logits0 = jax.random.normal(jax.random.fold_in(key, 5),
                                (B, tcfg.n_codec_logits), jnp.float32) * 2
    hidden0 = jax.random.normal(jax.random.fold_in(key, 6),
                                (B, tcfg.d_model), jnp.float32) * 0.3

    temp, top_k, top_p = 0.7, 40, 0.9
    lgn = np.asarray(logits0[0])
    order = np.argsort(-lgn)
    keepk = np.arange(len(lgn)) < top_k
    pr = np.exp((lgn[order] - lgn[order][0]) / temp) * keepk
    pr = pr / pr.sum()
    cum = np.cumsum(pr)
    keepp = (cum - pr) < top_p
    support = set(order[keepk & keepp].tolist())

    for uval in (0.001, 0.35, 0.77, 0.999):
        u = jnp.full((1, B), uval, jnp.float32)
        codes_k, *_ = _run_kernel(setup, logits0, hidden0, cache0.k,
                                  cache0.v, cache0.lengths, START, 1,
                                  temp=temp, u=u)
        assert int(codes_k[0, 0, 0]) in support
