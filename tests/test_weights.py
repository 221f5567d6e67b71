"""GGUF -> model-params import: write a tiny llama.cpp-style checkpoint,
load it, and check config derivation, tensor mapping/transposes, and that the
loaded model runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import PredictorConfig, TalkerConfig
from qwen3_tts_tpu.io import weights as W
from qwen3_tts_tpu.io.gguf import write_gguf
from qwen3_tts_tpu.models import talker as talker_lib


def _fake_ckpt(path, cfg, vocab):
    rng = np.random.default_rng(0)
    d, f = cfg.d_model, cfg.d_ff
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    tensors = {}
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = np.ones(d, np.float32)
        tensors[p + "ffn_norm.weight"] = np.ones(d, np.float32)
        # llama.cpp convention: [out_features, in_features]
        tensors[p + "attn_q.weight"] = rng.standard_normal((h * dh, d)).astype(np.float32) * 0.05
        tensors[p + "attn_k.weight"] = rng.standard_normal((hkv * dh, d)).astype(np.float32) * 0.05
        tensors[p + "attn_v.weight"] = rng.standard_normal((hkv * dh, d)).astype(np.float32) * 0.05
        tensors[p + "attn_output.weight"] = rng.standard_normal((d, h * dh)).astype(np.float32) * 0.05
        tensors[p + "attn_q_norm.weight"] = np.ones(dh, np.float32)
        tensors[p + "attn_k_norm.weight"] = np.ones(dh, np.float32)
        tensors[p + "ffn_gate.weight"] = rng.standard_normal((f, d)).astype(np.float32) * 0.05
        tensors[p + "ffn_up.weight"] = rng.standard_normal((f, d)).astype(np.float32) * 0.05
        tensors[p + "ffn_down.weight"] = rng.standard_normal((d, f)).astype(np.float32) * 0.05
    tensors["output_norm.weight"] = np.ones(d, np.float32)
    tensors["output.weight"] = rng.standard_normal((vocab, d)).astype(np.float32) * 0.05
    meta = {
        "general.architecture": "qwen3",
        "qwen3.block_count": cfg.n_layers,
        "qwen3.attention.head_count": h,
        "qwen3.attention.head_count_kv": hkv,
        "qwen3.embedding_length": d,
        "qwen3.feed_forward_length": f,
        "qwen3.attention.key_length": dh,
        "qwen3.rope.freq_base": 77000.0,
        "qwen3.attention.layer_norm_rms_epsilon": 1e-5,
    }
    write_gguf(path, tensors, meta)
    return tensors


def test_talker_gguf_import(tmp_path):
    base = TalkerConfig.tiny()
    path = tmp_path / "talker.gguf"
    tensors = _fake_ckpt(path, base, vocab=4096)

    cfg, params = W.load_talker_gguf(path, base)
    assert cfg.rope_theta == pytest.approx(77000.0)
    assert cfg.rms_eps == pytest.approx(1e-5)
    assert cfg.n_layers == base.n_layers

    # mapping + transpose: the q slice of the fused wqkv must equal
    # attn_q.weight.T (fusion along the output-feature axis)
    h_dh = base.n_heads * base.head_dim
    kv_dh = base.n_kv_heads * base.head_dim
    wqkv = np.asarray(params["layers"]["wqkv"][0], np.float32)
    np.testing.assert_allclose(wqkv[:, :h_dh],
                               tensors["blk.0.attn_q.weight"].T, atol=1e-6)
    np.testing.assert_allclose(wqkv[:, h_dh:h_dh + kv_dh],
                               tensors["blk.0.attn_k.weight"].T, atol=1e-6)
    np.testing.assert_allclose(wqkv[:, h_dh + kv_dh:],
                               tensors["blk.0.attn_v.weight"].T, atol=1e-6)
    got_o = np.asarray(params["layers"]["wo"][1], np.float32)
    np.testing.assert_allclose(got_o, tensors["blk.1.attn_output.weight"].T,
                               atol=1e-6)
    # codec head is the sliced output matrix
    assert params["codec_head"].shape == (cfg.n_codec_logits, cfg.d_model)
    np.testing.assert_allclose(
        np.asarray(params["codec_head"], np.float32),
        tensors["output.weight"][: cfg.n_codec_logits], atol=1e-6)

    # loaded model runs
    emb = jnp.zeros((1, 4, cfg.d_model))
    cache = talker_lib.init_talker_cache(cfg, 1, 8)
    logits, hidden, _ = talker_lib.talker_prefill(
        cfg, params, emb, jnp.asarray([4]), cache)
    assert np.isfinite(np.asarray(logits)).all()


def test_predictor_gguf_import(tmp_path):
    base = PredictorConfig.tiny()
    path = tmp_path / "predictor.gguf"
    _fake_ckpt(path, base, vocab=base.vocab_size)
    cfg, params = W.load_predictor_gguf(path, base)
    assert params["lm_head"].shape == (base.vocab_size, cfg.d_model)
    assert cfg.d_model == base.d_model


def test_mrope_sections_from_gguf_metadata(tmp_path):
    """qwen3.rope.mrope_section metadata must override the config default
    (engine.rs:306-314 / llama.cpp qwen3.rope.mrope_section) — the sections
    are data, not a guess, whenever a real checkpoint provides them."""
    base = TalkerConfig.tiny()
    path = tmp_path / "talker_mrope.gguf"
    rng = np.random.default_rng(0)
    d, dh = base.d_model, base.head_dim
    tensors = {"token_embd.weight":
               rng.standard_normal((64, d)).astype(np.float32) * 0.05}
    meta = {
        "general.architecture": "qwen3",
        "qwen3.rope.mrope_section": [3, 3, 2],
    }
    write_gguf(path, tensors, meta)
    from qwen3_tts_tpu.io.gguf import read_gguf
    cfg = W.config_from_gguf(read_gguf(path), base)
    assert cfg.mrope_sections == (3, 3, 2, 0)   # zero-padded to 4 rows
