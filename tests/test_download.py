"""Downloader manifest logic (no network)."""

from pathlib import Path

import pytest

from qwen3_tts_tpu.io import download as dl


def test_manifest_per_quant():
    assert "gguf/qwen3_tts_talker.gguf" in dl.manifest("none")
    assert "gguf_q8_0/qwen3_assets.gguf" in dl.manifest("q8_0")
    assert "gguf_q5_k_m/qwen3_tts_predictor.gguf" in dl.manifest("q5_k_m")
    assert "tokenizer/tokenizer.json" in dl.manifest("none")


def test_missing_files(tmp_path):
    missing = dl.missing_files(tmp_path, "none")
    assert len(missing) == 4
    # create one -> no longer missing
    (tmp_path / "tokenizer").mkdir()
    (tmp_path / "tokenizer" / "tokenizer.json").write_text("{}")
    assert len(dl.missing_files(tmp_path, "none")) == 3


def test_check_and_download_raises_without_hub(tmp_path, monkeypatch):
    import builtins
    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name == "huggingface_hub":
            raise ImportError("gated")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    with pytest.raises(RuntimeError, match="huggingface_hub"):
        dl.check_and_download(tmp_path, "none")
