"""Parity of the explicit shard_map TP path (parallel/tp.py) vs the
single-device reference forward, on the 8-virtual-device CPU mesh
(4 data x 2 model) — the same program shape the multichip dryrun runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.parallel import mesh as mesh_lib
from qwen3_tts_tpu.parallel import tp


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(4, 2)
    cfg = EngineConfig.tiny()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    talker_params = talker_lib.init_talker_params(cfg.talker, k1)
    predictor_params = predictor_lib.init_predictor_params(cfg.predictor, k2)
    return mesh, cfg, talker_params, predictor_params


def test_tp_prefill_matches_reference(setup):
    mesh, cfg, talker_params, _ = setup
    b, s, cap = 4, 16, 32
    embeds = jax.random.normal(jax.random.PRNGKey(3),
                               (b, s, cfg.talker.d_model)) * 0.3
    lengths = jnp.asarray([16, 12, 9, 16], jnp.int32)

    cache = talker_lib.init_talker_cache(cfg.talker, b, cap)
    logits_ref, hidden_ref, cache_ref = talker_lib.talker_prefill(
        cfg.talker, talker_params, embeds, lengths, cache)

    sh_talker = mesh_lib.place_params(talker_params, mesh,
                                      mesh_lib.talker_param_specs())
    logits, hidden, k_all, v_all = tp_prefill_jit(cfg, mesh, sh_talker,
                                                  embeds, lengths, cap)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(hidden_ref),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(k_all), np.asarray(cache_ref.k),
                               atol=3e-4, rtol=3e-4)


def tp_prefill_jit(cfg, mesh, params, embeds, lengths, cap):
    import functools
    fn = jax.jit(functools.partial(tp.tp_talker_prefill, cfg, mesh),
                 static_argnames=("capacity",))
    return fn(params, embeds, lengths, capacity=cap)


def test_tp_step_matches_reference(setup):
    mesh, cfg, talker_params, _ = setup
    b, s, cap, pcap = 4, 16, 32, 16
    embeds = jax.random.normal(jax.random.PRNGKey(4),
                               (b, s, cfg.talker.d_model)) * 0.3
    lengths = jnp.full((b,), s, jnp.int32)

    cache = talker_lib.init_talker_cache(cfg.talker, b, cap)
    _, _, cache_ref = talker_lib.talker_prefill(
        cfg.talker, talker_params, embeds, lengths, cache)
    emb = jax.random.normal(jax.random.PRNGKey(5),
                            (b, cfg.talker.d_model)) * 0.3
    pos = lengths
    cache_ref = cache_ref.replace(
        write_idx=jnp.full((b,), pcap, jnp.int32))
    logits_ref, hidden_ref, _ = talker_lib.talker_decode_step(
        cfg.talker, talker_params, emb, pos, cache_ref, pcap)

    sh_talker = mesh_lib.place_params(talker_params, mesh,
                                      mesh_lib.talker_param_specs())
    _, _, k_all, v_all = tp_prefill_jit(cfg, mesh, sh_talker, embeds,
                                        lengths, cap)
    logits, hidden, _, _ = tp.tp_talker_step(
        cfg, mesh, sh_talker, emb, pos, k_all, v_all, lengths,
        jnp.int32(pcap), pcap)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(hidden_ref),
                               atol=3e-4, rtol=3e-4)


def test_tp_predictor_matches_reference(setup):
    mesh, cfg, _, predictor_params = setup
    b = 4
    h1024 = jax.random.normal(jax.random.PRNGKey(6),
                              (b, cfg.predictor.d_model)) * 0.3
    code0 = jnp.asarray([1, 5, 9, 3], jnp.int32)
    tables = jax.random.normal(
        jax.random.PRNGKey(7),
        (16, cfg.predictor.codebook_size, cfg.predictor.d_model)) * 0.3

    codes_ref = predictor_lib.predict_frame(cfg.predictor, predictor_params,
                                            h1024, code0, tables)
    sh_pred = mesh_lib.place_params(predictor_params, mesh,
                                    mesh_lib.predictor_param_specs())
    codes = tp.tp_predict_frame(cfg, mesh, sh_pred, h1024, code0, tables)
    # argmax chains can diverge on near-ties under fp reassociation;
    # require exact match on codebook 0 and >= 90% agreement overall.
    ref = np.asarray(codes_ref)
    got = np.asarray(codes)
    assert got.shape == ref.shape == (b, 16)
    np.testing.assert_array_equal(got[:, 0], ref[:, 0])
    agree = (got == ref).mean()
    assert agree >= 0.9, f"codes agreement {agree}"
