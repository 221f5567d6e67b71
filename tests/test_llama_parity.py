"""Talker logit-parity harness vs llama.cpp (io/llama_parity.py).

The real comparison needs a talker GGUF + a llama.cpp dump produced by
scripts/dump_llama_logits.py; those tests self-skip without the files
(QTTS_TALKER_GGUF / QTTS_PARITY_INPUTS / QTTS_PARITY_DUMP env vars or the
default model-dir locations).  The harness ITSELF is proven offline by
round-tripping our own tiny talker through the dump schema: self-compare
must pass, a perturbed model must fail with the stats in the message.
"""

import os

import numpy as np
import pytest

from qwen3_tts_tpu.core.config import TalkerConfig
from qwen3_tts_tpu.io import llama_parity as lp


@pytest.fixture(scope="module")
def tiny_talker():
    import jax
    from qwen3_tts_tpu.models import talker as talker_lib
    cfg = TalkerConfig.tiny()
    params = talker_lib.init_talker_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_make_inputs_deterministic(tmp_path):
    a = lp.make_inputs(tmp_path / "a.npz", d_model=32, seed=5)
    b = lp.make_inputs(None, d_model=32, seed=5)
    np.testing.assert_array_equal(a["embeds"], b["embeds"])
    loaded = dict(np.load(tmp_path / "a.npz"))
    np.testing.assert_array_equal(loaded["step_embeds"], a["step_embeds"])


def test_harness_self_compare_passes(tiny_talker):
    cfg, params = tiny_talker
    inputs = lp.make_inputs(None, d_model=cfg.d_model, seed=1, rows=12,
                            steps=3)
    ours = lp.run_our_talker(cfg, params, inputs)
    stats = lp.compare_dumps(ours, ours)
    assert stats["prefill_logits_max_abs"] == 0.0
    assert stats["step_logits_top1_match"] == 1.0


def test_harness_catches_weight_corruption(tiny_talker):
    """A transposed/perturbed weight must show up as a large relative error
    — the failure mode this harness exists to catch."""
    import jax
    from qwen3_tts_tpu.models import talker as talker_lib
    cfg, params = tiny_talker
    inputs = lp.make_inputs(None, d_model=cfg.d_model, seed=2, rows=12,
                            steps=3)
    good = lp.run_our_talker(cfg, params, inputs)

    bad_params = jax.tree_util.tree_map(lambda x: x, params)
    bad_params["layers"] = dict(params["layers"])
    w = np.asarray(params["layers"]["wqkv"], np.float32)
    # shape-preserving import bug: rows permuted (what a wrong transpose
    # convention does to a square matrix)
    bad_params["layers"]["wqkv"] = w[:, ::-1, :].copy()
    bad = lp.run_our_talker(cfg, bad_params, inputs)
    stats = lp.compare_dumps(good, bad)
    assert stats["prefill_logits_rel"] > 0.2


def test_dump_script_importable():
    """The standalone ctypes dumper must at least parse and expose the same
    M-RoPE position layout the reference builds (engine.rs:305-314)."""
    import importlib.util
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "dump_llama_logits.py")
    spec = importlib.util.spec_from_file_location("dump_llama_logits", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pos = mod.qwen3_position(3, 4)
    np.testing.assert_array_equal(
        pos, np.array([3, 4, 5, 6, 3, 4, 5, 6, 3, 4, 5, 6, 0, 0, 0, 0],
                      np.int32))
    # struct mirrors carry the 1-byte bools the reference marks CRITICAL
    import ctypes
    assert mod.llama_model_params.vocab_only.size == 1
    assert mod.llama_context_params.embeddings.size == 1


REAL_GGUF = os.environ.get("QTTS_TALKER_GGUF", "models/gguf/qwen3_tts_talker.gguf")
REAL_INPUTS = os.environ.get("QTTS_PARITY_INPUTS", "models/parity_inputs.npz")
REAL_DUMP = os.environ.get("QTTS_PARITY_DUMP", "models/llama_dump.npz")


@pytest.mark.skipif(
    not (os.path.exists(REAL_GGUF) and os.path.exists(REAL_INPUTS)
         and os.path.exists(REAL_DUMP)),
    reason="real talker GGUF + llama.cpp dump not present "
           "(set QTTS_TALKER_GGUF/QTTS_PARITY_INPUTS/QTTS_PARITY_DUMP)")
def test_real_talker_parity_vs_llama_cpp():
    stats = lp.compare_talker(REAL_GGUF, REAL_INPUTS, REAL_DUMP)
    print("llama.cpp parity:", stats)
