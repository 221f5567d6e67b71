"""Speculative multi-frame decoding (runtime/spec.py) parity vs the
sequential gen_frames path — VERDICT r4 #8 / DESIGN §12.

All tests rig the sampler to a key-independent deterministic draw
(argmax with EOS masked) in BOTH modules, so sequential and speculative
paths are draw-identical and the parity statements are exact: whatever
the acceptance rate, every emitted frame must equal the sequential
path's frame at that position, and the carried state after any spec
call must continue generating the sequential stream.
"""

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
from qwen3_tts_tpu.runtime import spec


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig.tiny()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = talker_lib.init_talker_params(cfg.talker, k1)
    pp = predictor_lib.init_predictor_params(cfg.predictor, k2)
    assets = Assets.random_init(k3, text_rows=512, codec_rows=4096)
    return cfg, tp, pp, assets.pack()


SAMPLER = gen.SamplerParams(temperature=jnp.float32(0.0),
                            top_k=jnp.int32(0), top_p=jnp.float32(1.0))
CAP = 8
K = 4


def _greedy_no_eos(logits, key, t, k, p):
    """Deterministic, key-independent, never EOS — so parity cannot flake
    on a random-weight argmax happening to hit 2150."""
    masked = logits.at[..., P.EOS].set(-jnp.inf)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


@pytest.fixture()
def rigged(monkeypatch):
    monkeypatch.setattr(gen, "sample_logits", _greedy_no_eos)
    monkeypatch.setattr(spec, "sample_logits", _greedy_no_eos)


def _start(cfg, tp, b=2, s=CAP):
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, s, 2048)) * 0.02
    lengths = jnp.full((b,), s, jnp.int32)
    return gen.prefill(cfg, tp, embeds, lengths, jax.random.PRNGKey(2))


@pytest.fixture(scope="module")
def seq_run(setup):
    """Sequential reference: K frames from a fresh prefill, greedy-no-EOS.

    module-scoped: monkeypatch is per-test, so rig by hand here."""
    cfg, tp, pp, pack = setup
    orig = gen.sample_logits
    gen.sample_logits = _greedy_no_eos
    try:
        state0 = _start(cfg, tp)
        state, codes, valid = gen.gen_frames(cfg, tp, pp, pack, state0,
                                             SAMPLER, n_frames=K,
                                             prompt_cap=CAP)
    finally:
        gen.sample_logits = orig
    return state0, state, np.asarray(codes), np.asarray(valid)


def test_full_accept_parity(setup, seq_run, rigged):
    """Drafting the exact target frames accepts everything: n_emit == K,
    codes identical, and the carried state (logits/hidden/pos) equals the
    sequential path's — the 100%-acceptance pin from the module docstring."""
    cfg, tp, pp, pack = setup
    state0, state_seq, codes_seq, _ = seq_run

    draft = jnp.asarray(codes_seq)                      # [B, K, 16]
    st, codes, valid, n_emit = spec.gen_frames_spec(
        cfg, tp, pp, pack, state0, draft, SAMPLER, prompt_cap=CAP)

    assert (np.asarray(n_emit) == K).all()
    np.testing.assert_array_equal(np.asarray(codes), codes_seq)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(state_seq.pos))
    np.testing.assert_allclose(np.asarray(st.logits, np.float32),
                               np.asarray(state_seq.logits, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(st.hidden, np.float32),
                               np.asarray(state_seq.hidden, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_zero_accept_emits_target_frame(setup, seq_run, rigged):
    """A fully wrong draft still makes progress: n_emit == 1 and the one
    emitted frame is the TARGET's frame 0 (resample-on-first-reject)."""
    cfg, tp, pp, pack = setup
    state0, _, codes_seq, _ = seq_run

    draft = jnp.asarray(codes_seq) ^ 1                  # flip every code
    st, codes, valid, n_emit = spec.gen_frames_spec(
        cfg, tp, pp, pack, state0, draft, SAMPLER, prompt_cap=CAP)

    assert (np.asarray(n_emit) == 1).all()
    np.testing.assert_array_equal(np.asarray(codes)[:, 0], codes_seq[:, 0])
    v = np.asarray(valid)
    assert v[:, 0].all() and not v[:, 1:].any()
    np.testing.assert_array_equal(np.asarray(st.cache.write_idx),
                                  np.asarray(state0.cache.write_idx) + 1)


def test_partial_accept_prefix(setup, seq_run, rigged):
    """Draft frame 0 right, frames 1.. wrong: exactly the accepted prefix
    plus one corrected frame is emitted, all equal to the sequential run."""
    cfg, tp, pp, pack = setup
    state0, _, codes_seq, _ = seq_run

    draft = jnp.asarray(codes_seq).at[:, 1:].set(
        jnp.asarray(codes_seq[:, 1:]) ^ 1)
    st, codes, valid, n_emit = spec.gen_frames_spec(
        cfg, tp, pp, pack, state0, draft, SAMPLER, prompt_cap=CAP)

    assert (np.asarray(n_emit) == 2).all()
    np.testing.assert_array_equal(np.asarray(codes)[:, :2], codes_seq[:, :2])
    v = np.asarray(valid)
    assert v[:, :2].all() and not v[:, 2:].any()


def test_rollback_then_sequential_continues_stream(setup, seq_run, rigged):
    """After a 0%-acceptance call the rolled-back cache is clean: plain
    gen_frames from the returned state reproduces the sequential stream's
    remaining frames and final carried logits — i.e. the rejected drafts'
    KV rows are dead, not poisoning later attention."""
    cfg, tp, pp, pack = setup
    state0, state_seq, codes_seq, _ = seq_run

    draft = jnp.asarray(codes_seq) ^ 1
    st, codes, valid, n_emit = spec.gen_frames_spec(
        cfg, tp, pp, pack, state0, draft, SAMPLER, prompt_cap=CAP)
    st2, codes2, valid2 = gen.gen_frames(cfg, tp, pp, pack, st, SAMPLER,
                                         n_frames=K - 1, prompt_cap=CAP,
                                         uniform_cursor=False)

    np.testing.assert_array_equal(np.asarray(codes2), codes_seq[:, 1:])
    np.testing.assert_allclose(np.asarray(st2.logits, np.float32),
                               np.asarray(state_seq.logits, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(st2.pos),
                                  np.asarray(state_seq.pos))


def test_eos_in_emitted_prefix(setup, monkeypatch):
    """Lane 0's target samples EOS at position 0: its emitted frame is
    flagged invalid (gen_frames semantics: the EOS frame itself never
    plays) and done sticks; lane 1 is untouched."""
    cfg, tp, pp, pack = setup

    def rig(logits, key, t, k, p):
        b = logits.shape[0]
        masked = logits.at[..., P.EOS].set(-jnp.inf)
        alt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        return jnp.where(jnp.arange(b) == 0, P.EOS, alt)

    monkeypatch.setattr(spec, "sample_logits", rig)
    state0 = _start(cfg, tp)
    draft = jnp.zeros((2, K, 16), jnp.int32)
    st, codes, valid, n_emit = spec.gen_frames_spec(
        cfg, tp, pp, pack, state0, draft, SAMPLER, prompt_cap=CAP)

    v = np.asarray(valid)
    d = np.asarray(st.done)
    assert not v[0].any() and d[0]
    assert not d[1] and v[1, :np.asarray(n_emit)[1]].all()


def test_repeat_draft_shape():
    last = jnp.arange(32, dtype=jnp.int32).reshape(2, 16)
    d = spec.repeat_draft(last, 3)
    assert d.shape == (2, 3, 16)
    np.testing.assert_array_equal(np.asarray(d[:, 2]), np.asarray(last))


def test_draft_head_plumbing(setup):
    """Random-init MTP head produces well-formed complete frames in range
    (the drop-in contract for a trained head — DESIGN §12)."""
    cfg, tp, pp, pack = setup
    dp = spec.init_draft_params(cfg, jax.random.PRNGKey(7))
    hidden = jax.random.normal(jax.random.PRNGKey(8), (2, cfg.talker.d_model))
    last = jnp.ones((2, 16), jnp.int32)
    d = spec.draft_frames(cfg, dp, pack, hidden, last, K)
    assert d.shape == (2, K, 16)
    dn = np.asarray(d)
    assert (dn[:, :, 0] >= 0).all() and (dn[:, :, 0] < P.CODE_SAMPLING_LIMIT).all()
    assert (dn[:, :, 1:] >= 0).all() and (dn[:, :, 1:] < 2048).all()
