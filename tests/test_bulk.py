"""Bulk one-dispatch generation (runtime.generate._gen_bulk): equality with
the host chunk loop, exact frame budgets, EOS early-exit, and the engine's
non-streaming path matching the streaming path sample-for-sample."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.io.assets import Assets
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.models.codec import decoder as codec_decoder
from qwen3_tts_tpu.runtime import generate as gen


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig.tiny()
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tp = talker_lib.init_talker_params(cfg.talker, k1)
    pp = predictor_lib.init_predictor_params(cfg.predictor, k2)
    assets = Assets.random_init(k3, text_rows=512, codec_rows=4096)
    dp = codec_decoder.init_decoder_params(cfg.codec_decoder, k4)
    return cfg, tp, pp, assets.pack(), dp


def _start(cfg, tp, b=2, s=8):
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, s, 2048)) * 0.02
    lengths = jnp.full((b,), s, jnp.int32)
    return gen.prefill(cfg, tp, embeds, lengths, jax.random.PRNGKey(2))


def _sampler():
    return gen.SamplerParams(temperature=jnp.float32(0.7),
                             top_k=jnp.int32(40), top_p=jnp.float32(0.9))


@pytest.mark.slow        # compile-heavy: full tier only (quick <= 8 min)
def test_bulk_matches_host_loop(setup):
    """codes/valid/wav from the one-dispatch program == the host chunk loop
    (same chunk size, same PRNG threading)."""
    cfg, tp, pp, pack, dp = setup
    chunk = cfg.runtime.frames_per_chunk
    max_frames = 12
    sampler = _sampler()

    # host loop
    state = _start(cfg, tp)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=2)
    codes_h, valid_h, wav_h = [], [], []
    steps = 0
    while steps < max_frames:
        n = min(chunk, max_frames - steps)
        state, dec, codes, valid, wav = gen.gen_frames_with_audio(
            cfg, tp, pp, pack, dp, state, dec, sampler, n_frames=n,
            prompt_cap=8)
        codes_h.append(np.asarray(codes))
        valid_h.append(np.asarray(valid))
        wav_h.append(np.asarray(wav))
        steps += n
    codes_h = np.concatenate(codes_h, axis=1)
    valid_h = np.concatenate(valid_h, axis=1)
    wav_h = np.concatenate(wav_h, axis=1)

    # bulk
    state_b = _start(cfg, tp)
    dec_b = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=2)
    state_b, dec_b, codes_b, valid_b, wav_b, done, _ = gen._gen_bulk(
        cfg, tp, pp, pack, dp, state_b, dec_b, sampler,
        max_frames=max_frames, chunk=chunk, prompt_cap=8)

    assert np.array_equal(np.asarray(valid_b), valid_h)
    assert np.array_equal(np.asarray(codes_b), codes_h)
    np.testing.assert_allclose(np.asarray(wav_b), wav_h, rtol=1e-5, atol=1e-5)
    assert int(done) == max_frames  # no EOS in tiny random weights run? may
    # early-exit if EOS sampled — then the host loop saw the same EOS and
    # both stopped producing valid frames; the assert above already covers it


def test_bulk_budget_not_divisible_by_chunk(setup):
    """max_frames that isn't a chunk multiple: columns past the budget are
    invalid even though a whole final chunk is computed."""
    cfg, tp, pp, pack, dp = setup
    chunk = cfg.runtime.frames_per_chunk
    max_frames = chunk + 1
    state = _start(cfg, tp, b=1)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=1)
    state, dec, codes, valid, wav, done, saw_eos = gen._gen_bulk(
        cfg, tp, pp, pack, dp, state, dec, _sampler(),
        max_frames=max_frames, chunk=chunk, prompt_cap=8)
    v = np.asarray(valid)
    assert v.shape[1] == 2 * chunk              # rounded-up buffer
    assert not v[:, max_frames:].any()          # budget exact
    assert np.asarray(wav).shape[1] == 2 * chunk * \
        cfg.codec_decoder.samples_per_frame


def test_bulk_early_exit_on_eos(setup, monkeypatch):
    """All lanes EOS on the first frame -> the while_loop stops after one
    chunk (frames_done == chunk, all frames invalid)."""
    cfg, tp, pp, pack, dp = setup

    def rigged(logits, key, t, k, p):
        return jnp.full((logits.shape[0],), P.EOS, jnp.int32)

    monkeypatch.setattr(gen, "sample_logits", rigged)
    chunk = cfg.runtime.frames_per_chunk
    state = _start(cfg, tp)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=2)
    state, dec, codes, valid, wav, done, saw_eos = gen._gen_bulk(
        cfg, tp, pp, pack, dp, state, dec, _sampler(),
        max_frames=4 * chunk, chunk=chunk, prompt_cap=8)
    assert int(done) == chunk
    assert not np.asarray(valid).any()
    assert np.asarray(state.done).all()
    assert np.asarray(saw_eos).all()    # done via EOS, not budget


def test_bulk_saw_eos_at_exact_budget(setup, monkeypatch):
    """EOS sampled on the frame right after a lane's last budgeted frame:
    frames == budget AND the lane truly hit EOS — saw_eos must be True
    (the old `frames < budget` inference reported False here)."""
    cfg, tp, pp, pack, dp = setup
    chunk = cfg.runtime.frames_per_chunk
    budget = 3

    # gen_frames threads the PRNG deterministically: frame i samples with
    # the i-th split of the initial key, so we can rig the sampler to fire
    # EOS at exactly frame `budget` by matching the key value.
    key = jax.random.PRNGKey(2)          # _start's prefill key
    for _ in range(budget):
        key, sub = jax.random.split(key)
    _, eos_key = jax.random.split(key)   # frame index `budget`'s key

    monkeypatch.setattr(gen, "sample_logits",
                        lambda logits, k, t, tk, tp_:
                        jnp.where(jnp.all(jax.random.key_data(k) ==
                                          jax.random.key_data(eos_key)),
                                  jnp.int32(P.EOS), jnp.int32(0))
                        * jnp.ones((logits.shape[0],), jnp.int32))
    state = _start(cfg, tp, b=1)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=1)
    state, dec, codes, valid, wav, done, saw_eos = gen._gen_bulk(
        cfg, tp, pp, pack, dp, state, dec, _sampler(),
        jnp.asarray([budget], jnp.int32),
        max_frames=2 * chunk, chunk=chunk, prompt_cap=8)
    v = np.asarray(valid)
    assert v[0].sum() == budget          # exactly the budget produced audio
    assert bool(np.asarray(saw_eos)[0])  # and the lane really hit EOS


def test_bulk_codes_only_matches_fused(setup):
    """codec_params=None returns the same codes/valid and no wav."""
    cfg, tp, pp, pack, dp = setup
    chunk = cfg.runtime.frames_per_chunk
    s1 = _start(cfg, tp)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=2)
    _, _, codes_f, valid_f, wav, _, _ = gen._gen_bulk(
        cfg, tp, pp, pack, dp, s1, dec, _sampler(),
        max_frames=8, chunk=chunk, prompt_cap=8)
    s2 = _start(cfg, tp)
    _, _, codes_c, valid_c, wav_c, _, _ = gen._gen_bulk(
        cfg, tp, pp, pack, None, s2, jnp.zeros(()), _sampler(),
        max_frames=8, chunk=chunk, prompt_cap=8)
    assert wav_c is None
    assert np.array_equal(np.asarray(codes_f), np.asarray(codes_c))
    assert np.array_equal(np.asarray(valid_f), np.asarray(valid_c))


def test_bulk_per_lane_budgets(setup):
    """Heterogeneous per-lane budgets: each lane's valid frames stop at its
    own budget; the loop exits once every lane is done."""
    cfg, tp, pp, pack, dp = setup
    chunk = cfg.runtime.frames_per_chunk
    state = _start(cfg, tp, b=2)
    dec = codec_decoder.init_decoder_state(cfg.codec_decoder, dp, batch=2)
    budgets = jnp.asarray([3, 9], jnp.int32)
    state, dec, codes, valid, wav, done, saw_eos = gen._gen_bulk(
        cfg, tp, pp, pack, dp, state, dec, _sampler(), budgets,
        max_frames=12, chunk=chunk, prompt_cap=8)
    v = np.asarray(valid)
    assert v[0].sum() <= 3 and not v[0, 3:].any()
    assert v[1].sum() <= 9 and not v[1, 9:].any()
    # with no EOS sampled, exactly the budget is valid and saw_eos is False
    # (done came from the budget, not EOS)
    if v[0].sum() == 3 and v[1].sum() == 9:
        assert int(done) == 12  # 3 chunks: lane 1 needs frames through 9
        assert not np.asarray(saw_eos).any()
    assert np.asarray(state.done).all()


@pytest.mark.slow        # compile-heavy: full tier only (quick <= 8 min)
def test_wave_bulk_matches_chunked_loop(tiny_engine, monkeypatch):
    """BatchSynthesizer through the bulk program == the chunked wave loop,
    including per-request max_frames budgets and eos flags."""
    from qwen3_tts_tpu.core.config import SamplerConfig
    from qwen3_tts_tpu.serve.batch import BatchRequest, BatchSynthesizer
    eng = tiny_engine
    eng.set_max_steps(8)
    voice = eng.get_speaker("vivian")
    synth = BatchSynthesizer(eng, batch_size=2)
    reqs = [BatchRequest("first request", voice, max_frames=3),
            BatchRequest("second longer request", voice)]

    old = eng.get_sampler_config()
    try:
        eng.set_sampler_config(SamplerConfig(seed=21))
        monkeypatch.setenv("QTTS_BULK", "1")
        r_bulk = synth.synthesize(reqs)
        eng.set_sampler_config(SamplerConfig(seed=21))
        monkeypatch.setenv("QTTS_BULK", "0")
        r_loop = synth.synthesize(reqs)
    finally:
        eng.set_sampler_config(old)
    for a, b in zip(r_bulk, r_loop):
        assert a.frames == b.frames
        assert a.eos == b.eos
        np.testing.assert_allclose(a.audio.samples, b.audio.samples,
                                   rtol=1e-5, atol=1e-5)
    assert r_bulk[0].frames <= 3


def test_engine_bulk_matches_streaming(tiny_engine, monkeypatch):
    """engine.generate_with_voice (bulk) == concatenated generate_stream
    (host loop) with the same seed."""
    from qwen3_tts_tpu.core.config import SamplerConfig
    eng = tiny_engine
    voice = eng.get_speaker("vivian")
    old = eng.get_sampler_config()
    try:
        eng.set_sampler_config(SamplerConfig(temperature=0.7, top_k=40,
                                             top_p=0.9, seed=1234))
        monkeypatch.setenv("QTTS_BULK", "1")
        a_bulk = eng.generate_with_voice("hello world", voice)
        stream = np.concatenate(
            list(eng.generate_stream("hello world", voice))
            or [np.zeros(0, np.float32)])
        monkeypatch.setenv("QTTS_BULK", "0")
        a_loop = eng.generate_with_voice("hello world", voice)
    finally:
        eng.set_sampler_config(old)
    np.testing.assert_allclose(a_bulk.samples, a_loop.samples,
                               rtol=1e-5, atol=1e-5)
    # streaming emits a small first chunk (first_chunk_frames) but the math
    # is per-frame sequential: same samples
    np.testing.assert_allclose(a_bulk.samples, stream, rtol=1e-5, atol=1e-5)
