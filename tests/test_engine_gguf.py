"""Engine end-to-end from a synthesized GGUF model directory: exercises the
real model-loading path (assets GGUF reader, llama.cpp-layout weight import,
metadata-driven config, quant->int8 device weights) exactly as it runs with
the published checkpoints."""

import numpy as np
import pytest

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import (EngineConfig, PredictorConfig,
                                       SamplerConfig, TalkerConfig)
from qwen3_tts_tpu.io.gguf import write_gguf
from qwen3_tts_tpu.io.voice_file import VoiceFile


def _write_lm_gguf(path, cfg, vocab, seed):
    rng = np.random.default_rng(seed)
    d, f = cfg.d_model, cfg.d_ff
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    tensors = {}
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = np.ones(d, np.float32)
        tensors[p + "ffn_norm.weight"] = np.ones(d, np.float32)
        tensors[p + "attn_q.weight"] = rng.standard_normal((h * dh, d)).astype(np.float32) * 0.03
        tensors[p + "attn_k.weight"] = rng.standard_normal((hkv * dh, d)).astype(np.float32) * 0.03
        tensors[p + "attn_v.weight"] = rng.standard_normal((hkv * dh, d)).astype(np.float32) * 0.03
        tensors[p + "attn_output.weight"] = rng.standard_normal((d, h * dh)).astype(np.float32) * 0.03
        tensors[p + "attn_q_norm.weight"] = np.ones(dh, np.float32)
        tensors[p + "attn_k_norm.weight"] = np.ones(dh, np.float32)
        tensors[p + "ffn_gate.weight"] = rng.standard_normal((f, d)).astype(np.float32) * 0.03
        tensors[p + "ffn_up.weight"] = rng.standard_normal((f, d)).astype(np.float32) * 0.03
        tensors[p + "ffn_down.weight"] = rng.standard_normal((d, f)).astype(np.float32) * 0.03
    tensors["output_norm.weight"] = np.ones(d, np.float32)
    tensors["output.weight"] = rng.standard_normal((vocab, d)).astype(np.float32) * 0.03
    write_gguf(path, tensors, {
        "general.architecture": "qwen3",
        "qwen3.block_count": cfg.n_layers,
        "qwen3.attention.head_count": h,
        "qwen3.attention.head_count_kv": hkv,
        "qwen3.embedding_length": d,
        "qwen3.feed_forward_length": f,
        "qwen3.attention.key_length": dh,
        "qwen3.rope.freq_base": 1_000_000.0,
    })


@pytest.fixture(scope="module")
def gguf_model_dir(tmp_path_factory):
    """A complete tiny model dir in the published layout (gguf/ subdir)."""
    cfg = EngineConfig.tiny()
    root = tmp_path_factory.mktemp("gguf_model")
    gdir = root / "gguf"
    gdir.mkdir()
    rng = np.random.default_rng(0)

    # assets: real row counts are huge; tiny file keeps the real tensor names
    text_rows = P.EOS_TOKEN + 2  # covers all protocol text rows
    codec_rows = 3100            # covers PAD/BOS/CODEC_BOS/speaker ids
    write_gguf(gdir / "qwen3_assets.gguf", {
        "proj.weight": rng.standard_normal((1024, 2048)).astype(np.float32) * 0.02,
        "proj.bias": rng.standard_normal(1024).astype(np.float32) * 0.02,
        "text_embd": rng.standard_normal((text_rows, 2048)).astype(np.float16) * 0.02,
        **{f"codec_embd.{i}":
           rng.standard_normal((codec_rows, 2048)).astype(np.float16) * 0.02
           for i in range(16)},
    })
    _write_lm_gguf(gdir / "qwen3_tts_talker.gguf", cfg.talker,
                   vocab=4096, seed=1)
    _write_lm_gguf(gdir / "qwen3_tts_predictor.gguf", cfg.predictor,
                   vocab=cfg.predictor.vocab_size, seed=2)

    spk = root / "preset_speakers"
    spk.mkdir()
    vf = VoiceFile.new("", [], rng.standard_normal(2048).astype(np.float32) * 0.02)
    vf.name = "vivian"
    vf.save(spk / "vivian.json")
    return root, cfg


def test_engine_loads_gguf_and_generates(gguf_model_dir):
    from qwen3_tts_tpu.engine import TtsEngine
    root, cfg = gguf_model_dir
    eng = TtsEngine(model_dir=root, quant="none", config=cfg)
    assert not eng._random_weights
    assert eng.assets.text_rows == P.EOS_TOKEN + 2
    assert eng.assets.codec_rows == 3100
    # loaded config fields came from GGUF metadata
    assert eng.config.talker.rope_theta == pytest.approx(1_000_000.0)

    eng.set_max_steps(4)
    eng.set_sampler_config(SamplerConfig(seed=3))
    audio = eng.generate_with_voice("loaded from gguf",
                                    eng.get_speaker("vivian"))
    assert np.isfinite(audio.samples).all()


def test_engine_gguf_int8(gguf_model_dir):
    """quant != none triggers int8 device weights over the loaded tensors."""
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.ops.quant import is_quantized
    root, cfg = gguf_model_dir
    # same files; quant dirs map to gguf/ only for "none", so copy
    import shutil
    q8 = root / "gguf_q8_0"
    if not q8.exists():
        shutil.copytree(root / "gguf", q8)
    eng = TtsEngine(model_dir=root, quant="q8_0", config=cfg)
    assert is_quantized(eng.talker_params["layers"]["wqkv"])
    assert is_quantized(eng.predictor_params["lm_head"])
    eng.set_max_steps(3)
    eng.set_sampler_config(SamplerConfig(seed=1))
    audio = eng.generate_with_voice("int8 from gguf",
                                    eng.get_speaker("vivian"))
    assert np.isfinite(audio.samples).all()
