"""Int8 weight quantization: numerical error bounds and end-to-end flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.ops import quant


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    qw = quant.quantize_weight(w, axis=-2)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (128,)
    deq = qw["q"].astype(jnp.float32) * qw["s"]
    rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01  # per-channel int8: < 1% of channel max


def test_quant_matmul_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 256)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 64)) * 0.05, jnp.float32)
    exact = x @ w
    approx = quant.matmul(x, quant.quantize_weight(w))
    err = float(jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact))
    assert err < 0.01


def test_head_matmul_close():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.standard_normal((2, 128)) * 0.3, jnp.float32)
    head = jnp.asarray(rng.standard_normal((512, 128)) * 0.05, jnp.float32)
    exact = quant.head_matmul(h, head)
    approx = quant.head_matmul(h, quant.quantize_head(head))
    err = float(jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact))
    assert err < 0.02


def test_quantized_talker_runs():
    from qwen3_tts_tpu.core.config import TalkerConfig
    from qwen3_tts_tpu.models import talker as talker_lib

    cfg = TalkerConfig.tiny()
    params = talker_lib.init_talker_params(cfg, jax.random.PRNGKey(0))
    qparams = {
        "layers": quant.quantize_decoder_layers(params["layers"]),
        "final_norm": params["final_norm"],
        "codec_head": quant.quantize_head(params["codec_head"]),
    }
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.d_model)) * 0.1
    cache = talker_lib.init_talker_cache(cfg, 1, 10)
    logits, hidden, cache = talker_lib.talker_prefill(
        cfg, qparams, emb, jnp.asarray([6]), cache)
    assert np.isfinite(np.asarray(logits)).all()

    ref_logits, _, _ = talker_lib.talker_prefill(
        cfg, params, emb, jnp.asarray([6]),
        talker_lib.init_talker_cache(cfg, 1, 10))
    # quantization noise is small relative to the logit scale
    denom = float(jnp.std(ref_logits)) + 1e-9
    err = float(jnp.max(jnp.abs(logits - ref_logits))) / denom
    assert err < 0.35


def test_engine_int8_e2e(tmp_path, tiny_cfg):
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.io.voice_file import VoiceFile
    from qwen3_tts_tpu.core.config import SamplerConfig

    spk_dir = tmp_path / "preset_speakers"
    spk_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    vf = VoiceFile.new("", [], rng.standard_normal(2048).astype(np.float32) * 0.02)
    vf.name = "vivian"
    vf.save(spk_dir / "vivian.json")

    cfg = tiny_cfg.replace(int8_weights=True)
    eng = TtsEngine(model_dir=tmp_path, config=cfg)
    eng.set_max_steps(4)
    eng.set_sampler_config(SamplerConfig(seed=5))
    audio = eng.generate_with_voice("int8 path", eng.get_speaker("vivian"))
    assert np.isfinite(audio.samples).all()
