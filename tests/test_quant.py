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


def test_head_matmul_slice_equals_full():
    """head_matmul_slice must equal the corresponding columns of the full
    head matmul, quantized and not (predictor streams per-codebook windows
    instead of the whole vocabulary)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_tts_tpu.ops.quant import (head_matmul, head_matmul_slice,
                                         quantize_head)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    head = jnp.asarray(rng.standard_normal((80, 32)).astype(np.float32))
    full = np.asarray(head_matmul(h, head))
    for start, size in ((0, 16), (16, 16), (64, 16)):
        win = np.asarray(head_matmul_slice(h, head, start, size))
        np.testing.assert_allclose(win, full[:, start:start + size],
                                   rtol=1e-5, atol=1e-5)
    qhead = jax.jit(quantize_head)(head)
    fullq = np.asarray(head_matmul(h, qhead))
    for start, size in ((0, 16), (48, 32)):
        win = np.asarray(head_matmul_slice(h, qhead, start, size))
        np.testing.assert_allclose(win, fullq[:, start:start + size],
                                   rtol=1e-5, atol=1e-5)
    # jit + traced start (how the predictor scan calls it)
    f = jax.jit(lambda s: head_matmul_slice(h, qhead, s, 16))
    np.testing.assert_allclose(np.asarray(f(jnp.int32(16))),
                               fullq[:, 16:32], rtol=1e-5, atol=1e-5)


def test_int4_pack_roundtrip_and_matmul():
    """Grouped int4 (nibbles packed in int8 carriers): dequant roundtrip is
    within int4 quantization error, matmul matches the dequantized dense
    product, and it jits."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_tts_tpu.ops import quant as Q

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 48)).astype(np.float32) * 0.1
    qw = jax.jit(lambda w: Q.quantize_weight_int4(w, group=64))(
        jnp.asarray(w))
    assert qw["q4"].shape == (128, 48) and qw["q4"].dtype == jnp.int8
    assert qw["s"].shape == (4, 48)
    deq = np.asarray(Q._unpack_int4(qw, jnp.float32))
    # max error bounded by half a quantization step per group
    step = np.asarray(qw["s"]).repeat(64, axis=0)
    assert (np.abs(deq - w) <= 0.5 * step + 1e-6).all()

    x = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
    y = np.asarray(jax.jit(Q.matmul)(x, qw))
    np.testing.assert_allclose(y, np.asarray(x) @ deq, rtol=1e-4, atol=1e-4)

    # stacked-layer form used by the models ([L, in, out])
    wl = rng.standard_normal((2, 256, 32)).astype(np.float32) * 0.1
    ql = Q.quantize_weight_int4(jnp.asarray(wl), group=128)
    deq_l = np.asarray(Q._unpack_int4(ql, jnp.float32))
    # expected int4 noise on gaussian weights: step ~= 3sigma/7, mean |err|
    # ~= step/4 -> rel ~= 0.13; assert within the analytic envelope
    rel = np.abs(deq_l - wl).mean() / np.abs(wl).mean()
    assert rel < 0.16


def test_int4_decoder_layers_quantize_and_place():
    """quantize_decoder_layers_int4 output passes through mesh placement."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_tts_tpu.ops import quant as Q
    from qwen3_tts_tpu.parallel import mesh as mesh_lib

    rng = np.random.default_rng(1)
    layers = {
        "ln1": jnp.ones((2, 32)), "ln2": jnp.ones((2, 32)),
        "q_norm": jnp.ones((2, 8)), "k_norm": jnp.ones((2, 8)),
        "wqkv": jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32),
        "wo": jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32),
        "w_gate_up": jnp.asarray(rng.standard_normal((2, 32, 128)),
                                 jnp.float32),
        "w_down": jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32),
    }
    q = Q.quantize_decoder_layers_int4(layers, group=32)
    assert Q.is_int4(q["wqkv"]) and Q.is_quantized(q["wqkv"])
    mesh = mesh_lib.make_mesh(4, 2)
    placed = mesh_lib.place_params({"layers": q}, mesh,
                                   {"layers": mesh_lib.decoder_param_specs()})
    assert placed["layers"]["wqkv"]["q4"].shape == (2, 16, 64)
    assert placed["layers"]["wqkv"]["s"].shape == (2, 1, 64)


def test_matmul_a8_parity_and_fallback():
    """a8w8 prefill matmul: Q8_0-class agreement with the dequant path on
    quantized weights; exact `matmul` fallback for plain / int4 weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_tts_tpu.ops import quant as Q

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 48), jnp.float32) * 0.1
    qw = Q.quantize_weight(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 64), jnp.bfloat16)

    y_deq = np.asarray(Q.matmul(x, qw), np.float32)
    y_a8 = np.asarray(Q.matmul_a8(x, qw), np.float32)
    rel = np.abs(y_deq - y_a8).max() / (np.abs(y_deq).max() + 1e-9)
    assert rel < 0.03           # int8-activation rounding only

    # unquantized fallback is bit-identical to matmul
    np.testing.assert_array_equal(np.asarray(Q.matmul_a8(x, w)),
                                  np.asarray(Q.matmul(x, w)))
    q4 = Q.quantize_weight_int4(w, group=32)
    np.testing.assert_array_equal(np.asarray(Q.matmul_a8(x, q4)),
                                  np.asarray(Q.matmul(x, q4)))
