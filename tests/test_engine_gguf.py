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


def test_weight_cache_roundtrip(gguf_model_dir):
    """Second engine start restores the Orbax weight cache: identical
    converted params, no GGUF re-read; touching the GGUF invalidates it."""
    import os
    import jax
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.io import weights as weights_io
    root, cfg = gguf_model_dir

    # first start (any earlier test may have populated the cache; wipe)
    import shutil
    shutil.rmtree(root / "cache", ignore_errors=True)
    eng1 = TtsEngine(model_dir=root, quant="q8_0", config=cfg)
    assert (root / "cache" / "talker_q8_0" / "meta.json").exists()
    assert (root / "cache" / "predictor_q8_0" / "meta.json").exists()

    # second start must not parse the GGUF again
    calls = {"n": 0}
    orig = weights_io.read_gguf

    def spy(path, *a, **kw):
        calls["n"] += 1
        return orig(path, *a, **kw)

    weights_io.read_gguf = spy
    try:
        eng2 = TtsEngine(model_dir=root, quant="q8_0", config=cfg)
    finally:
        weights_io.read_gguf = orig
    # assets GGUF still reads (separate loader); talker/predictor must not
    assert calls["n"] == 0
    for a, b in zip(jax.tree_util.tree_leaves(eng1.talker_params),
                    jax.tree_util.tree_leaves(eng2.talker_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert eng2.config.talker == eng1.config.talker

    # invalidation: touch the talker GGUF -> cache miss -> GGUF re-read
    g = root / "gguf_q8_0" / "qwen3_tts_talker.gguf"
    os.utime(g, ns=(g.stat().st_atime_ns + 1_000_000_000,
                    g.stat().st_mtime_ns + 1_000_000_000))
    calls["n"] = 0
    weights_io.read_gguf = spy
    try:
        TtsEngine(model_dir=root, quant="q8_0", config=cfg)
    finally:
        weights_io.read_gguf = orig
    assert calls["n"] >= 1


def test_weight_cache_disabled_by_env(gguf_model_dir, monkeypatch):
    import shutil
    from qwen3_tts_tpu.engine import TtsEngine
    root, cfg = gguf_model_dir
    shutil.rmtree(root / "cache", ignore_errors=True)
    monkeypatch.setenv("QTTS_WEIGHT_CACHE", "0")
    TtsEngine(model_dir=root, quant="q8_0", config=cfg)
    assert not (root / "cache").exists()
