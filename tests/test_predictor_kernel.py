"""Fused predictor-frame Pallas kernel vs the XLA reference path.

Runs in Pallas interpret mode on CPU: the kernel's semantics (16-token
grid, carried VMEM KV, SMEM code feedback, aligned-window table DMA) are
validated code-for-code against models.predictor.predict_frame.

On real TPU hardware the kernel compiles and runs (verified on v5e) but
Mosaic's bf16 accumulation rounds differently from XLA, so greedy argmax
near-ties can flip and cascade through the embedding feedback — with
random weights agreement is partial.  It therefore stays an experimental
opt-in (see kernels/predictor_frame.py docstring) until real-checkpoint
logit margins are measured.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import PredictorConfig
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.ops import quant as Q
from qwen3_tts_tpu.kernels.predictor_frame import (predict_frame_fused,
                                                   supported)


@pytest.fixture(scope="module")
def setup():
    cfg = PredictorConfig(d_model=128, n_layers=2, n_heads=2, n_kv_heads=1,
                          head_dim=64, d_ff=256, dtype="bfloat16")
    params = predictor_lib.init_predictor_params(cfg, jax.random.PRNGKey(0))
    params = {"layers": Q.quantize_decoder_layers(params["layers"]),
              "final_norm": params["final_norm"],
              "lm_head": Q.quantize_head(params["lm_head"])}
    tables = jax.random.normal(jax.random.PRNGKey(1), (16, 2048, 128),
                               jnp.bfloat16) * 0.3
    return cfg, params, tables


def test_supported_gate():
    cfg = PredictorConfig()
    assert supported(cfg, 1)
    assert supported(cfg, 8)
    assert supported(cfg, 32)              # serving batches (r5)
    assert not supported(cfg, 33)          # beyond that, the XLA path
    tiny = PredictorConfig.tiny()          # head_dim 16 unsupported
    assert not supported(tiny, 1)


def test_fused_matches_xla_reference(setup):
    """Default mode (weights-resident when they fit VMEM, as here)."""
    cfg, params, tables = setup
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 128), jnp.float32)
    c0 = jnp.asarray([5, 99], jnp.int32)
    ref = np.asarray(predictor_lib.predict_frame(cfg, params, h, c0, tables))
    got = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                         interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert got[0, 0] == 5 and got[1, 0] == 99      # code0 passthrough


def test_fused_streaming_variant_matches(setup, monkeypatch):
    """QTTS_PREDICTOR_RESIDENT=0 forces the double-buffered weight stream;
    the two kernel modes must agree exactly."""
    cfg, params, tables = setup
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 128), jnp.float32)
    c0 = jnp.asarray([5, 99], jnp.int32)
    res = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                         interpret=True))
    monkeypatch.setenv("QTTS_PREDICTOR_RESIDENT", "0")
    stream = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                            interpret=True))
    np.testing.assert_array_equal(res, stream)


def test_fused_deterministic_and_in_range(setup):
    cfg, params, tables = setup
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 128), jnp.float32)
    c0 = jnp.asarray([7], jnp.int32)
    a = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                       interpret=True))
    b = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                       interpret=True))
    np.testing.assert_array_equal(a, b)
    assert (a[:, 1:] >= 0).all() and (a[:, 1:] < cfg.codebook_size).all()


def test_fused_batched_lane_isolation(setup):
    """Serving-batch mode (B = 16): per-lane isolation through the packed
    activations, SMEM codes and the per-lane embedding-window DMAs.

    Compares the B=16 launch against the SAME kernel run on each 8-lane
    half — exact equality required (per-lane rows never mix).  A direct
    codes comparison vs models.predictor would be flaky here: the kernel's
    segment-sum attention accumulates in a different order than the XLA
    einsum, and with random weights greedy argmax near-ties flip and
    cascade through the code feedback (observed at these inputs even for
    B=8, the long-covered batch).  Cross-implementation parity is owned by
    test_fused_matches_xla_reference on margin-stable inputs."""
    cfg, params, tables = setup
    b = 16
    h = jax.random.normal(jax.random.PRNGKey(6), (b, 128), jnp.float32)
    c0 = (jnp.arange(b, dtype=jnp.int32) * 131) % 2048
    big = np.asarray(predict_frame_fused(cfg, params, h, c0, tables,
                                         interpret=True))
    lo = np.asarray(predict_frame_fused(cfg, params, h[:8], c0[:8], tables,
                                        interpret=True))
    hi = np.asarray(predict_frame_fused(cfg, params, h[8:], c0[8:], tables,
                                        interpret=True))
    np.testing.assert_array_equal(big[:8], lo)
    np.testing.assert_array_equal(big[8:], hi)
