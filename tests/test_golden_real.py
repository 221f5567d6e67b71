"""Golden-output harness against the PUBLISHED checkpoints (SURVEY §4).

Activated only when real model files are present (QTTS_MODEL_DIR env var or
./models with the published layout) — the build environment has no network,
so these tests self-skip there and light up the moment checkpoints land.

Two record/verify layers, goldens checked in under tests/golden/:
  * decoder golden: a fixed code sequence through the real ONNX decoder
    (io.onnx_exec) -> waveform stats must match the recorded values;
  * engine golden: seeded end-to-end synthesis -> frame count + waveform
    stats must match.
Record mode: QTTS_RECORD_GOLDEN=1 writes/updates the goldens.
"""

import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"


def _model_dir():
    cand = os.environ.get("QTTS_MODEL_DIR", "models")
    d = Path(cand)
    if (d / "gguf" / "qwen3_tts_talker.gguf").exists():
        return d
    return None


def _record():
    return os.environ.get("QTTS_RECORD_GOLDEN") == "1"


def _stats(wav: np.ndarray) -> dict:
    wav = np.asarray(wav, np.float32)
    return {
        "n": int(wav.size),
        "rms": float(np.sqrt(np.mean(wav ** 2))) if wav.size else 0.0,
        "peak": float(np.abs(wav).max()) if wav.size else 0.0,
        "sha_headroom": hashlib.sha256(
            np.round(wav[:4000] * 1e4).astype(np.int32).tobytes()
        ).hexdigest()[:16],
    }


def _check_or_record(name: str, stats: dict, rtol=0.02):
    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.json"
    if _record() or not path.exists():
        path.write_text(json.dumps(stats, indent=1))
        if not _record():
            pytest.skip(f"golden {name} recorded on first run; re-run to "
                        "verify")
        return
    want = json.loads(path.read_text())
    assert stats["n"] == want["n"], (stats, want)
    assert stats["rms"] == pytest.approx(want["rms"], rel=rtol)
    assert stats["peak"] == pytest.approx(want["peak"], rel=rtol)


requires_real_models = pytest.mark.skipif(
    _model_dir() is None,
    reason="real checkpoints not present (set QTTS_MODEL_DIR)")


@requires_real_models
def test_real_decoder_golden():
    d = _model_dir()
    dec_path = d / "onnx" / "qwen3_tts_decoder.onnx"
    if not dec_path.exists():
        pytest.skip("decoder onnx missing")
    from qwen3_tts_tpu.models.codec.onnx_decoder import OnnxStreamingDecoder
    dec = OnnxStreamingDecoder.load(dec_path)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2048, size=(8, 16))
    wav, _ = dec.decode(codes, dec.create_state(), is_final=True)
    assert np.isfinite(wav).all()
    _check_or_record("real_decoder_8frames", _stats(wav))


@requires_real_models
def test_real_decoder_chunk_invariance():
    """The real graph's streaming contract: chunked == full."""
    d = _model_dir()
    dec_path = d / "onnx" / "qwen3_tts_decoder.onnx"
    if not dec_path.exists():
        pytest.skip("decoder onnx missing")
    from qwen3_tts_tpu.models.codec.onnx_decoder import OnnxStreamingDecoder
    dec = OnnxStreamingDecoder.load(dec_path)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2048, size=(8, 16))
    full, _ = dec.decode(codes, dec.create_state(), is_final=True)
    st = dec.create_state()
    parts = []
    for lo in range(0, 8, 4):
        w, st = dec.decode(codes[lo:lo + 4], st, is_final=(lo == 4))
        parts.append(w)
    streamed = np.concatenate(parts)
    assert streamed.size == full.size
    np.testing.assert_allclose(streamed, full, atol=1e-3)


@requires_real_models
def test_real_engine_golden_wav():
    from qwen3_tts_tpu.core.config import SamplerConfig
    from qwen3_tts_tpu.engine import TtsEngine
    eng = TtsEngine(model_dir=_model_dir())
    assert not eng.dev_mode_components, \
        f"real install still in dev mode: {eng.dev_mode_components}"
    eng.set_max_steps(64)
    eng.set_sampler_config(SamplerConfig(seed=42))
    audio = eng.generate_with_voice("Hello from the TPU rebuild.",
                                    eng.get_speaker("vivian"))
    assert audio.sample_rate == 24000
    assert len(audio.samples) > 0
    _check_or_record("real_engine_seed42", _stats(audio.samples))
