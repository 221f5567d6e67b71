"""Prompt-protocol tests: section layout, lengths, and embedding composition
golden-checked against a direct numpy reconstruction of the protocol
(prompt.rs:5-16, 28-277)."""

import numpy as np
import jax
import pytest

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.io.assets import Assets
from qwen3_tts_tpu.prompt import PromptBuilder
from qwen3_tts_tpu.utils.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def assets():
    return Assets.random_init(jax.random.PRNGKey(0), text_rows=4096,
                              codec_rows=4096)


@pytest.fixture(scope="module")
def tok():
    return Tokenizer()


def _np(a):
    return np.asarray(a)


def _text_row(assets, tid):
    return _np(assets.text_table)[tid % assets.text_rows]


def _codec_row(assets, q, code):
    return _np(assets.codec_tables)[q][code]


def test_core_prompt_length_and_sections(assets, tok):
    text = "hello"
    ids = tok.encode(text)
    pd = PromptBuilder.build_core(text, tok, assets, lang_id=2055,
                                  spk_id=None, spk_emb=np.zeros(2048),
                                  instruct=None)
    # [assistant 3] + [control 4] + [speaker 1] + [BOS_TOKEN+ids+EOS_TOKEN] + [activation 1]
    assert pd.embd.shape == (3 + 4 + 1 + (len(ids) + 2) + 1, 2048)
    e = _np(pd.embd)

    # assistant header rows are pure text rows
    np.testing.assert_allclose(e[0], _text_row(assets, P.IM_START), atol=1e-6)
    np.testing.assert_allclose(e[1], _text_row(assets, P.ASSISTANT), atol=1e-6)
    np.testing.assert_allclose(e[2], _text_row(assets, P.NEWLINE), atol=1e-6)

    marker = _text_row(assets, P.TEXT_AUDIO_MARKER)
    # control block: marker + codec0 rows THINK, THINK_BOS, lang, THINK_EOS
    for i, code in enumerate([P.THINK, P.THINK_BOS, 2055, P.THINK_EOS]):
        np.testing.assert_allclose(e[3 + i], marker + _codec_row(assets, 0, code),
                                   atol=1e-5)
    # speaker slot: marker + spk_emb (zeros here)
    np.testing.assert_allclose(e[7], marker, atol=1e-5)
    # task text: BOS_TOKEN + PAD
    pad0 = _codec_row(assets, 0, P.PAD)
    np.testing.assert_allclose(e[8], _text_row(assets, P.BOS_TOKEN) + pad0,
                               atol=1e-5)
    for i, tid in enumerate(ids):
        np.testing.assert_allclose(e[9 + i], _text_row(assets, tid) + pad0,
                                   atol=1e-5)
    np.testing.assert_allclose(e[9 + len(ids)],
                               _text_row(assets, P.EOS_TOKEN) + pad0, atol=1e-5)
    # activation: marker + codec BOS
    np.testing.assert_allclose(e[-1], marker + _codec_row(assets, 0, P.BOS),
                               atol=1e-5)


def test_nothink_control_block(assets, tok):
    pd = PromptBuilder.build_core("x", tok, assets, lang_id=None,
                                  spk_id=3065, spk_emb=None)
    marker = _text_row(assets, P.TEXT_AUDIO_MARKER)
    e = _np(pd.embd)
    for i, code in enumerate([P.NOTHINK, P.THINK_BOS, P.THINK_EOS]):
        np.testing.assert_allclose(e[3 + i], marker + _codec_row(assets, 0, code),
                                   atol=1e-5)
    # speaker-by-id slot
    np.testing.assert_allclose(e[6], marker + _codec_row(assets, 0, 3065),
                               atol=1e-5)


def test_instruct_block_prepended(assets, tok):
    pd_no = PromptBuilder.build_core("t", tok, assets, spk_id=1)
    pd = PromptBuilder.build_core("t", tok, assets, spk_id=1,
                                  instruct="Happy")
    n_ins = len(tok.encode("Happy"))
    assert pd.embd.shape[0] == pd_no.embd.shape[0] + 3 + n_ins + 2
    e = _np(pd.embd)
    np.testing.assert_allclose(e[0], _text_row(assets, P.IM_START), atol=1e-6)
    np.testing.assert_allclose(e[1], _text_row(assets, P.USER), atol=1e-6)
    np.testing.assert_allclose(e[3 + n_ins], _text_row(assets, P.IM_END),
                               atol=1e-6)


def test_clone_prompt_layout(assets, tok):
    ref_codes = np.arange(32) % 100          # 2 frames
    ref_ids = tok.encode("ref")
    emb = np.random.default_rng(0).standard_normal(2048).astype(np.float32)
    pd = PromptBuilder.build_clone_prompt(
        "target", tok, assets, ref_codes, ref_ids, emb, lang_id=2055)
    ids = tok.encode("target")
    # core(no-mid) + mid = [ref_ids+2] + [codec bos 1] + [frames 2] + [pad 1]
    core_len = 3 + 4 + 1 + (len(ids) + 2) + 1
    mid_len = (len(ref_ids) + 2) + 1 + 2 + 1
    assert pd.embd.shape[0] == core_len + mid_len

    e = _np(pd.embd)
    marker = _text_row(assets, P.TEXT_AUDIO_MARKER)
    pad0 = _codec_row(assets, 0, P.PAD)
    mid_start = 3 + 4 + 1
    # identity overlay first row: BOS_TOKEN + PAD
    np.testing.assert_allclose(e[mid_start],
                               _text_row(assets, P.BOS_TOKEN) + pad0, atol=1e-5)
    # codec-bos row
    row = mid_start + len(ref_ids) + 2
    np.testing.assert_allclose(e[row], marker + _codec_row(assets, 0, P.CODEC_BOS),
                               atol=1e-5)
    # first frame row: marker + sum of 16 codebook rows
    frame0 = ref_codes[:16]
    expect = marker + sum(_codec_row(assets, q, int(frame0[q]))
                          for q in range(16))
    np.testing.assert_allclose(e[row + 1], expect, atol=1e-4)
    # trailing pad row
    np.testing.assert_allclose(e[row + 3], marker + pad0, atol=1e-5)


def test_spk_emb_flows_through(assets, tok):
    emb = np.full(2048, 0.25, np.float32)
    pd = PromptBuilder.build_core("q", tok, assets, spk_emb=emb)
    assert pd.spk_emb.shape == (2048,)
    np.testing.assert_allclose(pd.spk_emb, emb)


def test_device_assemble_matches_numpy(assets, tok):
    """prompt.assemble (device path used by the engine) must equal the numpy
    materialization for both core and clone plans."""
    import jax.numpy as jnp
    from qwen3_tts_tpu.prompt import assemble

    emb = np.random.default_rng(1).standard_normal(2048).astype(np.float32)
    plans = [
        PromptBuilder.plan_core("hello world", tok, lang_id=2055,
                                spk_emb=emb),
        PromptBuilder.plan_clone("target", tok, np.arange(48) % 100,
                                 tok.encode("ref"), emb, lang_id=2055,
                                 instruct="Happy"),
    ]
    for plan in plans:
        ref = PromptBuilder._materialize(plan, assets).embd
        padded = plan.padded(plan.length + 5, max(1, plan.frames.shape[0]))
        dev = assemble(assets.text_table, assets.codec_tables,
                       jnp.asarray(padded.text_idx),
                       jnp.asarray(padded.codec_idx),
                       jnp.asarray(padded.frame_slot),
                       jnp.asarray(padded.spk_flag),
                       jnp.asarray(padded.frames),
                       jnp.asarray(padded.spk_emb),
                       jnp.int32(plan.length))
        dev = np.asarray(dev)
        np.testing.assert_allclose(dev[: plan.length], ref, atol=2e-5)
        assert (dev[plan.length:] == 0).all()
