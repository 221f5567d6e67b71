"""IO round-trips: WAV, VoiceFile JSON (spk_emb alias), TTSC cache."""

import json

import numpy as np

from qwen3_tts_tpu.io.audio import AudioSample, load_reference_wav
from qwen3_tts_tpu.io.cache import load_cache, save_cache
from qwen3_tts_tpu.io.voice_file import VoiceFile


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(2400) * 0.3).clip(-1, 1).astype(np.float32)
    path = tmp_path / "a.wav"
    AudioSample(samples=samples, sample_rate=24000, channels=1).save_wav(path)
    back = AudioSample.load_wav(path)
    assert back.sample_rate == 24000
    assert back.channels == 1
    np.testing.assert_allclose(back.samples, samples, atol=1.0 / 16000)
    assert abs(back.duration() - 0.1) < 1e-6


def test_load_reference_wav_rejects_wrong_rate(tmp_path):
    path = tmp_path / "b.wav"
    AudioSample(samples=np.zeros(100, np.float32), sample_rate=16000).save_wav(path)
    try:
        load_reference_wav(path)
        assert False, "expected rate error"
    except ValueError as e:
        assert "24000" in str(e)


def test_voice_file_roundtrip(tmp_path):
    vf = VoiceFile.new("hello", np.arange(32), np.linspace(-1, 1, 2048))
    vf.with_metadata(name="test", gender="f", age="adult", description="d")
    path = tmp_path / "v.json"
    vf.save(path)
    back = VoiceFile.load(path)
    assert back.ref_text == "hello"
    assert back.name == "test"
    assert back.audio_codes == list(range(32))
    assert back.codes_array.shape == (2, 16)
    np.testing.assert_allclose(back.embedding_array, vf.embedding_array)


def test_voice_file_spk_emb_alias(tmp_path):
    """Preset speaker JSONs use `spk_emb` + `spk_id` (speakers/vivian.json)."""
    path = tmp_path / "p.json"
    with open(path, "w") as f:
        json.dump({"name": "v", "spk_id": 3065,
                   "spk_emb": [0.5] * 8, "description": "x"}, f)
    vf = VoiceFile.load(path)
    assert vf.spk_id == 3065
    assert vf.speaker_embedding == [0.5] * 8
    assert vf.audio_codes == []


def test_cache_roundtrip(tmp_path):
    codes = np.arange(48, dtype=np.int64)
    emb = np.linspace(0, 1, 2048).astype(np.float32)
    path = tmp_path / "r.cache"
    save_cache(path, codes, emb)
    c, e = load_cache(path)
    np.testing.assert_array_equal(c, codes)
    np.testing.assert_allclose(e, emb)
    # header magic
    assert path.read_bytes()[:4] == b"TTSC"


def test_stereo_wav_mono_fold(tmp_path):
    import wave
    left = np.linspace(-0.5, 0.5, 200).astype(np.float32)
    right = np.zeros(200, np.float32)
    inter = np.empty(400, np.float32)
    inter[0::2], inter[1::2] = left, right
    path = tmp_path / "st.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(np.clip(np.rint(inter * 32767), -32768, 32767)
                      .astype(np.int16).tobytes())
    mono = load_reference_wav(path)
    assert mono.shape == (200,)
    np.testing.assert_allclose(mono, left, atol=1e-3)


def test_engine_config_from_dict_and_file(tmp_path):
    """Structured config (json/toml) round-trips through EngineConfig —
    the reference hardcodes these values (engine.rs:133-136); here they
    are data."""
    import json
    import pytest
    from qwen3_tts_tpu.core.config import EngineConfig

    cfg = EngineConfig.from_dict(
        {"runtime": {"max_steps": 99, "frames_per_chunk": 8},
         "lang_id": 2056})
    assert cfg.runtime.max_steps == 99
    assert cfg.runtime.frames_per_chunk == 8
    assert cfg.lang_id == 2056
    assert cfg.talker.n_layers == EngineConfig().talker.n_layers  # default

    with pytest.raises(ValueError, match="unknown"):
        EngineConfig.from_dict({"runtime": {"not_a_field": 1}})
    with pytest.raises(ValueError, match="unknown"):
        EngineConfig.from_dict({"nope": {}})

    path = tmp_path / "cfg.json"
    path.write_text(json.dumps({"runtime": {"max_steps": 7}}))
    assert EngineConfig.from_file(path).runtime.max_steps == 7

    toml = tmp_path / "cfg.toml"
    toml.write_text("[talker]\nn_layers = 3\n")
    assert EngineConfig.from_file(toml).talker.n_layers == 3

    # full round trip
    d = EngineConfig.tiny().to_dict()
    assert EngineConfig.from_dict(d) == EngineConfig.tiny()
