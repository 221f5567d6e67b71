"""Test configuration: force CPU with 8 virtual devices so unit tests and
sharding tests run anywhere (no TPU needed), per SURVEY.md §4."""

import os

# Must happen before jax initializes a backend.  The environment here
# force-registers a TPU platform (JAX_PLATFORMS=axon via sitecustomize), so
# the env var must be overwritten, not defaulted, and the config updated
# post-import as well.
os.environ["JAX_PLATFORMS"] = "cpu"

# The quick tier (`pytest -m quick`) never touches the virtual mesh (its
# files are the single-device core-correctness subset), so it runs with ONE
# CPU device: 8 virtual devices cost measurable per-program backend overhead
# on the contended single-core CI box for zero coverage.  Full runs keep 8.
import sys

_argv = sys.argv
# Exact-match the marker expression: substring matching made
# `-m "not quick"` (or any expression containing the word) silently run
# with ONE device, which skips all 8-virtual-device mesh coverage.
_FAST_EXPRS = {"quick", "smoke"}
_quick_run = any(
    (a == "-m" and i + 1 < len(_argv) and _argv[i + 1].strip() in _FAST_EXPRS)
    or (a.startswith("-m") and len(a) > 2 and a[2:].strip() in _FAST_EXPRS)
    for i, a in enumerate(_argv))
_n_dev = 1 if _quick_run else 8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_n_dev}").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# CPU-fast CI tier (`pytest -m quick`): the core-correctness subset a
# reviewer can run in <= 8 minutes on one core.  Everything else (Pallas
# interpret-mode kernels, 8-virtual-device sharding, production-size codec
# shapes, native build) stays in the full tier; individual compile-heavy
# parity tests inside quick files carry @pytest.mark.slow to stay full-only.
_QUICK_FILES = {
    "test_prompt.py", "test_runtime.py", "test_codec.py", "test_ops.py",
    "test_gguf.py", "test_prefix_cache.py", "test_engine_e2e.py",
    "test_onnx_codec.py", "test_continuous.py", "test_bulk.py",
    "test_io.py", "test_api.py", "test_tokenizer_real.py",
    "test_models.py",
}

# Smallest reviewer tier (`pytest -m smoke`, <= 3 min on one core):
# protocol goldens, on-device sampling ops, GGUF/io round-trips, the real
# tokenizer path, and the tiny-engine end-to-end surface.
_SMOKE_FILES = {
    "test_prompt.py", "test_ops.py", "test_gguf.py", "test_io.py",
    "test_tokenizer_real.py", "test_engine_e2e.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.fspath.basename in _QUICK_FILES
                and item.get_closest_marker("slow") is None):
            item.add_marker(pytest.mark.quick)
            if item.fspath.basename in _SMOKE_FILES:
                item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def tiny_cfg():
    from qwen3_tts_tpu.core.config import EngineConfig
    return EngineConfig.tiny()


@pytest.fixture(scope="session")
def tiny_engine(tmp_path_factory, tiny_cfg):
    """A fully wired engine with tiny random weights and one tiny speaker."""
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.io.voice_file import VoiceFile

    model_dir = tmp_path_factory.mktemp("model")
    spk_dir = model_dir / "preset_speakers"
    spk_dir.mkdir()
    rng = np.random.default_rng(0)
    vf = VoiceFile.new("", [], rng.standard_normal(2048).astype(np.float32) * 0.02)
    vf.name = "vivian"
    vf.save(spk_dir / "vivian.json")
    return TtsEngine(model_dir=model_dir, config=tiny_cfg)
