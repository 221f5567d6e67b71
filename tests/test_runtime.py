"""Generation-loop semantics: EOS masking, per-stream done isolation, and
frame validity — with a rigged sampler so EOS timing is deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.io.assets import Assets
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.runtime import generate as gen


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig.tiny()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = talker_lib.init_talker_params(cfg.talker, k1)
    pp = predictor_lib.init_predictor_params(cfg.predictor, k2)
    assets = Assets.random_init(k3, text_rows=512, codec_rows=4096)
    return cfg, tp, pp, assets.pack()


def _start(cfg, tp, b=2, s=8):
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, s, 2048)) * 0.02
    lengths = jnp.full((b,), s, jnp.int32)
    return gen.prefill(cfg, tp, embeds, lengths, jax.random.PRNGKey(2))


def test_eos_invalidates_frames(setup, monkeypatch):
    """A stream sampling EOS stops contributing valid frames immediately
    (the reference breaks before emitting the frame, engine.rs:558-561)."""
    cfg, tp, pp, pack = setup

    # lane 0 emits EOS at every step; lane 1 never does
    def rigged(logits, key, t, k, p):
        b = logits.shape[0]
        return jnp.where(jnp.arange(b) == 0, P.EOS, 7).astype(jnp.int32)

    monkeypatch.setattr(gen, "sample_logits", rigged)
    state = _start(cfg, tp)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                top_k=jnp.int32(40), top_p=jnp.float32(0.9))
    state, codes, valid = gen.gen_frames(cfg, tp, pp, pack, state, sampler,
                                         n_frames=3, prompt_cap=8)
    v = np.asarray(valid)
    assert not v[0].any()          # EOS on frame 0: nothing valid
    assert v[1].all()              # other lane unaffected
    assert np.asarray(state.done)[0] and not np.asarray(state.done)[1]
    # codes for the live lane carry the rigged code_0
    assert (np.asarray(codes)[1, :, 0] == 7).all()


@pytest.mark.slow        # compile-heavy: full tier only (quick <= 8 min)
def test_eos_mid_generation(setup, monkeypatch):
    cfg, tp, pp, pack = setup
    # EOS exactly when the stream position passes a threshold: use a counter
    # via the carried PRNG key is not possible inside trace; instead rig on
    # logits content: pos is threaded through state.pos -> use a closure over
    # a mutable list evaluated per trace? Simplest: n_frames=1 calls chained.
    calls = {"n": 0}

    def rigged(logits, key, t, k, p):
        b = logits.shape[0]
        code = P.EOS if calls["n"] >= 2 else 5
        calls["n"] += 1
        return jnp.full((b,), code, jnp.int32)

    monkeypatch.setattr(gen, "sample_logits", rigged)
    state = _start(cfg, tp, b=1)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.0),
                                top_k=jnp.int32(0), top_p=jnp.float32(1.0))
    valids = []
    for _ in range(4):  # one frame per call => rigged fn retraced each call?
        state, codes, valid = gen.gen_frames(
            cfg, tp, pp, pack, state, sampler, n_frames=1, prompt_cap=8)
        valids.append(bool(np.asarray(valid)[0, 0]))
    # frames 0,1 valid; frames 2,3 invalid (EOS at call 2, done is sticky)
    assert valids[:2] == [True, True]
    assert valids[2] is False
    assert valids[3] is False


def test_done_is_sticky(setup, monkeypatch):
    cfg, tp, pp, pack = setup
    seq = iter([P.EOS, 3, 3, 3, 3, 3, 3, 3])

    def rigged(logits, key, t, k, p):
        b = logits.shape[0]
        return jnp.full((b,), next(seq), jnp.int32)

    monkeypatch.setattr(gen, "sample_logits", rigged)
    state = _start(cfg, tp, b=1)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.0),
                                top_k=jnp.int32(0), top_p=jnp.float32(1.0))
    all_valid = []
    for _ in range(3):
        state, codes, valid = gen.gen_frames(
            cfg, tp, pp, pack, state, sampler, n_frames=1, prompt_cap=8)
        all_valid.append(bool(np.asarray(valid)[0, 0]))
    assert all_valid == [False, False, False]  # EOS at frame 0 sticks


def test_generation_under_debug_nans(setup):
    """SURVEY §5 race/sanity row: the full frame loop runs clean under
    jax_debug_nans (fails fast if any op produces NaN)."""
    import jax

    cfg, tp, pp, pack = setup
    jax.config.update("jax_debug_nans", True)
    try:
        state = _start(cfg, tp, b=1)
        sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                    top_k=jnp.int32(40),
                                    top_p=jnp.float32(0.9))
        state, codes, valid = gen.gen_frames(
            cfg, tp, pp, pack, state, sampler, n_frames=2, prompt_cap=8)
        assert np.isfinite(np.asarray(state.logits)).all()
    finally:
        jax.config.update("jax_debug_nans", False)
