"""End-to-end engine tests on the tiny config: text -> waveform, streaming,
determinism with seeds, voice cloning path, speaker resolution."""

import numpy as np
import pytest

from qwen3_tts_tpu.core.config import SamplerConfig
from qwen3_tts_tpu.io.audio import AudioSample


def test_generate_with_voice(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(8)
    eng.set_sampler_config(SamplerConfig(temperature=0.7, top_k=40,
                                         top_p=0.9, seed=42))
    voice = eng.get_speaker("vivian")
    audio = eng.generate_with_voice("hello world", voice)
    spf = eng.config.codec_decoder.samples_per_frame
    assert audio.sample_rate == 24000
    assert audio.channels == 1
    assert len(audio.samples) % spf == 0
    assert len(audio.samples) <= 8 * spf
    assert np.isfinite(audio.samples).all()
    m = eng.last_metrics
    assert m is not None and m.prefill_ms > 0 and m.total_ms > 0
    # the bulk (non-streaming) path reports no TTFT — it has no
    # first-chunk moment (streaming paths fill it in)
    assert m.ttft_ms is None


def test_seeded_generation_deterministic(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(6)
    voice = eng.get_speaker("vivian")
    eng.set_sampler_config(SamplerConfig(seed=123))
    a = eng.generate_with_voice("abc", voice)
    eng.set_sampler_config(SamplerConfig(seed=123))
    b = eng.generate_with_voice("abc", voice)
    np.testing.assert_array_equal(a.samples, b.samples)


def test_streaming_matches_batch(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(8)
    voice = eng.get_speaker("vivian")
    eng.set_sampler_config(SamplerConfig(seed=7))
    full = eng.generate_with_voice("stream me", voice)
    eng.set_sampler_config(SamplerConfig(seed=7))
    chunks = list(eng.generate_stream("stream me", voice))
    streamed = (np.concatenate(chunks) if chunks
                else np.zeros(0, np.float32))
    # codes are identical (same seed, same per-frame math); wav agrees to
    # the codec's chunk-invariance tolerance (test_codec.py: 1e-5) — the
    # bulk path decodes 4-frame chunks while streaming decodes 2,4,...
    np.testing.assert_allclose(streamed, full.samples, atol=1e-5)
    # streaming granularity: every chunk except the last is <= 4 frames
    spf = eng.config.codec_decoder.samples_per_frame
    for c in chunks:
        assert len(c) % spf == 0
        assert len(c) <= eng.config.runtime.frames_per_chunk * spf


def test_stream_batch(tiny_engine):
    """Batched streaming: per-lane chunks concatenate to each lane's own
    complete waveform; lanes are isolated (lane 0's audio matches what a
    single-stream run of the same wave produces at the same bucket)."""
    eng = tiny_engine
    eng.set_max_steps(8)
    voice = eng.get_speaker("vivian")
    eng.set_sampler_config(SamplerConfig(seed=11))
    spf = eng.config.codec_decoder.samples_per_frame
    waves = list(eng.stream_batch(["one two", "three"], voice))
    assert waves, "no chunks yielded"
    b = 2
    per_lane = [np.concatenate([w[i] for w in waves]) for i in range(b)]
    for lane in per_lane:
        assert len(lane) % spf == 0
        assert len(lane) <= 8 * spf
        assert np.isfinite(lane).all()
    for w in waves:
        assert len(w) == b
    # determinism: same seed -> same audio
    eng.set_sampler_config(SamplerConfig(seed=11))
    waves2 = list(eng.stream_batch(["one two", "three"], voice))
    per_lane2 = [np.concatenate([w[i] for w in waves2]) for i in range(b)]
    for x, y in zip(per_lane, per_lane2):
        np.testing.assert_array_equal(x, y)


def test_stream_batch_schedule_gate(tiny_engine, monkeypatch):
    """The wave-start batch gate (Generator._fused_start_ok) is a pure
    scheduling choice: the single-program fused start and the two-program
    start+chunk schedule must produce bit-identical audio for the same
    seed."""
    eng = tiny_engine
    eng.set_max_steps(8)
    voice = eng.get_speaker("vivian")

    def run():
        eng.set_sampler_config(SamplerConfig(seed=13))
        waves = list(eng.stream_batch(["alpha beta", "gamma"], voice))
        return [np.concatenate([w[i] for w in waves]) for i in range(2)]

    monkeypatch.setenv("QTTS_FUSED_START_MAX_B", "99")   # force fused
    fused = run()
    monkeypatch.setenv("QTTS_FUSED_START_MAX_B", "0")    # force two-program
    split = run()
    for x, y in zip(fused, split):
        np.testing.assert_array_equal(x, y)


def test_speaker_fallback(tiny_engine):
    eng = tiny_engine
    assert eng.get_speaker("vivian").name == "vivian"
    assert eng.get_speaker("not-a-speaker").name == "vivian"  # fallback


def test_create_voice_file_and_clone(tiny_engine, tmp_path):
    eng = tiny_engine
    rng = np.random.default_rng(0)
    wav_path = tmp_path / "ref.wav"
    spf_enc = 1
    for r in eng.config.codec_encoder.downsample_factors:
        spf_enc *= r
    samples = (rng.standard_normal(spf_enc * 5) * 0.2).astype(np.float32)
    AudioSample(samples=samples, sample_rate=24000).save_wav(wav_path)

    vf = eng.create_voice_file(wav_path, "reference text")
    assert vf.ref_text == "reference text"
    assert len(vf.audio_codes) == 5 * 16
    assert len(vf.speaker_embedding) == 2048

    eng.set_max_steps(4)
    eng.set_sampler_config(SamplerConfig(seed=1))
    audio = eng.generate_with_voice("cloned text", vf)
    assert np.isfinite(audio.samples).all()


def test_generate_with_cache_sidecar(tiny_engine, tmp_path):
    eng = tiny_engine
    rng = np.random.default_rng(1)
    wav_path = tmp_path / "r2.wav"
    spf_enc = 1
    for r in eng.config.codec_encoder.downsample_factors:
        spf_enc *= r
    AudioSample(samples=(rng.standard_normal(spf_enc * 3) * 0.2
                         ).astype(np.float32), sample_rate=24000
                ).save_wav(wav_path)
    eng.set_max_steps(4)
    audio = eng.generate("text", wav_path, "ref text")
    assert np.isfinite(audio.samples).all()
    assert wav_path.with_suffix(".cache").exists()  # sidecar written
    # second call goes through the cache
    audio2 = eng.generate("text", wav_path, "ref text")
    assert np.isfinite(audio2.samples).all()


def test_max_steps_budget(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(3)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, seed=0))
    voice = eng.get_speaker("vivian")
    audio = eng.generate_with_voice("budget", voice)
    spf = eng.config.codec_decoder.samples_per_frame
    assert len(audio.samples) <= 3 * spf


def test_split_sentences():
    from qwen3_tts_tpu.engine import split_sentences
    text = "First sentence. Second one! Third? " + "x" * 150
    pieces = split_sentences(text, max_chars=120)
    assert pieces[0] == "First sentence."
    assert pieces[1] == "Second one!"
    assert pieces[2] == "Third?"
    assert all(len(p) <= 120 for p in pieces)
    assert "".join(pieces).replace(" ", "") == text.replace(" ", "")


def test_generate_long(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(4)
    from qwen3_tts_tpu.core.config import SamplerConfig as SC
    eng.set_sampler_config(SC(seed=2))
    voice = eng.get_speaker("vivian")
    audio = eng.generate_long("One. Two. Three.", voice)
    assert audio.sample_rate == 24000
    assert np.isfinite(audio.samples).all()


def test_warmup(tiny_engine):
    tiny_engine.warmup(buckets=(32,), batch_sizes=(1,))  # compiles; no error


def test_prompt_longer_than_bucket_raises(tiny_engine):
    """Prompts beyond max_prompt_len fail loudly — silent tail-truncation
    dropped the task text + activation marker (round-1 ADVICE medium)."""
    from qwen3_tts_tpu import PromptTooLongError
    eng = tiny_engine
    eng.set_max_steps(2)
    from qwen3_tts_tpu.core.config import SamplerConfig as SC
    eng.set_sampler_config(SC(seed=1))
    voice = eng.get_speaker("vivian")
    long_text = "x" * (eng.config.runtime.max_prompt_len * 2)
    with pytest.raises(PromptTooLongError, match="generate_long"):
        eng.generate_with_voice(long_text, voice)
    # generate_long is the documented path for long plain text
    audio = eng.generate_long("One. Two. Three.", voice)
    assert np.isfinite(audio.samples).all()


def test_long_clone_reference_fits_or_raises(tiny_engine):
    """A multi-hundred-frame clone reference (~30 s of ref audio, like the
    reference's 4096-ctx sizing, engine.rs:133) must either fit the bucket
    or raise PromptTooLongError — never silently truncate."""
    from qwen3_tts_tpu import PromptTooLongError
    from qwen3_tts_tpu.io.voice_file import VoiceFile
    eng = tiny_engine
    eng.set_max_steps(2)
    rng = np.random.default_rng(1)
    # 360 frames x 16 codes — way past the tiny 64-row bucket
    codes = rng.integers(0, 8, size=360 * 16)
    vf = VoiceFile.new("reference transcript", codes,
                       rng.standard_normal(2048).astype(np.float32) * 0.02)
    with pytest.raises(PromptTooLongError, match="capacity"):
        eng.generate_with_voice("clone me", vf)
    # the production config holds the reference's full 4096 rows
    from qwen3_tts_tpu.core.config import RuntimeConfig
    assert RuntimeConfig().max_prompt_len == 4096


def test_malformed_speaker_embedding_is_coerced(tiny_engine):
    from qwen3_tts_tpu.io.voice_file import VoiceFile
    from qwen3_tts_tpu.core.config import SamplerConfig as SC
    eng = tiny_engine
    eng.set_max_steps(2)
    eng.set_sampler_config(SC(seed=0))
    bad = VoiceFile.new("", [], np.ones(100, np.float32))  # wrong width
    audio = eng.generate_with_voice("short", bad)
    assert np.isfinite(audio.samples).all()


def test_stream_long(tiny_engine):
    from qwen3_tts_tpu.core.config import SamplerConfig as SC
    eng = tiny_engine
    eng.set_max_steps(3)
    eng.set_sampler_config(SC(seed=9))
    voice = eng.get_speaker("vivian")
    chunks = list(eng.stream_long("One. Two.", voice))
    spf = eng.config.codec_decoder.samples_per_frame
    for c in chunks:
        assert len(c) % spf == 0


def test_decode_codes(tiny_engine):
    codes = np.arange(48) % 8
    audio = tiny_engine.decode_codes(codes)
    spf = tiny_engine.config.codec_decoder.samples_per_frame
    assert len(audio.samples) == 3 * spf
    assert np.isfinite(audio.samples).all()


def test_set_max_steps_above_compiled_budget(tiny_engine):
    """Raising max_steps past runtime.max_steps rebuilds the Generator; the
    rebuilt one must keep codec_params so audio synthesis still works
    (round-1 regression: CLI --max-steps 1024 crashed every later synth)."""
    from qwen3_tts_tpu.core.config import SamplerConfig as SC
    eng = tiny_engine
    old_budget = eng.config.runtime.max_steps
    eng.set_max_steps(old_budget + 8)
    assert eng.config.runtime.max_steps == old_budget + 8
    assert eng.generator.codec_params is not None
    eng.set_sampler_config(SC(seed=11))
    voice = eng.get_speaker("vivian")
    audio = eng.generate_with_voice("rebuild me", voice)
    spf = eng.config.codec_decoder.samples_per_frame
    assert len(audio.samples) % spf == 0
    assert np.isfinite(audio.samples).all()
    # streaming path too (uses chunk_with_audio directly)
    chunks = list(eng.generate_stream("and stream", voice))
    for c in chunks:
        assert np.isfinite(c).all()


def test_dev_mode_is_loud(tmp_path, monkeypatch, tiny_cfg):
    """Random-weight fallback must warn loudly, and QTTS_REQUIRE_WEIGHTS=1
    must make it a hard error (round-1: silent noise synthesis)."""
    import logging
    from qwen3_tts_tpu.engine import TtsEngine

    caplog_records = []
    handler = logging.Handler()
    handler.emit = lambda rec: caplog_records.append(rec.getMessage())
    from qwen3_tts_tpu.utils.logging import get_logger
    lg = get_logger()
    lg.addHandler(handler)
    try:
        eng = TtsEngine(model_dir=tmp_path, config=tiny_cfg)
    finally:
        lg.removeHandler(handler)
    assert set(eng.dev_mode_components) >= {
        "assets", "talker", "predictor", "codec_decoder"}
    assert any("DEV MODE" in m for m in caplog_records)

    monkeypatch.setenv("QTTS_REQUIRE_WEIGHTS", "1")
    with pytest.raises(RuntimeError, match="DEV MODE"):
        TtsEngine(model_dir=tmp_path, config=tiny_cfg)
