"""Downloader manifest logic + mirror fallback + fetch loop (no network:
HTTP is faked via monkeypatched urllib handlers)."""

import io
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from qwen3_tts_tpu.io import download as dl


def test_manifest_per_quant():
    assert "gguf/qwen3_tts_talker.gguf" in dl.manifest("none")
    assert "gguf_q8_0/qwen3_assets.gguf" in dl.manifest("q8_0")
    assert "gguf_q5_k_m/qwen3_tts_predictor.gguf" in dl.manifest("q5_k_m")
    assert "tokenizer/tokenizer.json" in dl.manifest("none")
    # parity with download.rs:66-69 — the decoder ONNX is a required file
    assert "onnx/qwen3_tts_decoder.onnx" in dl.manifest("none")
    # engine.rs:107-121 — encoders are optional, not in the hard manifest
    assert "onnx/qwen3_tts_codec_encoder.onnx" in dl.OPTIONAL_FILES
    assert "onnx/qwen3_tts_speaker_encoder.onnx" in dl.OPTIONAL_FILES


def test_missing_files(tmp_path):
    missing = dl.missing_files(tmp_path, "none")
    assert len(missing) == 5
    # create one -> no longer missing
    (tmp_path / "tokenizer").mkdir()
    (tmp_path / "tokenizer" / "tokenizer.json").write_text("{}")
    assert len(dl.missing_files(tmp_path, "none")) == 4


def test_mirror_fallback(monkeypatch):
    """When huggingface.co is unreachable the base flips to hf-mirror.com
    (download.rs:14-29)."""
    monkeypatch.setattr(dl, "_probe", lambda url, timeout=3.0: False)
    assert dl.resolve_base().startswith(dl.HF_MIRROR)
    monkeypatch.setattr(dl, "_probe", lambda url, timeout=3.0: True)
    assert dl.resolve_base().startswith(dl.HF_BASE)


def test_base_override(monkeypatch):
    monkeypatch.setenv("QTTS_HF_BASE", "http://air.gapped/mirror/")
    assert dl.resolve_base("r/epo") == "http://air.gapped/mirror/r/epo/resolve/main"


class _FakeResp(io.BytesIO):
    def __init__(self, data: bytes):
        super().__init__(data)
        self.headers = {"Content-Length": str(len(data))}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_check_and_download_fetches_missing(tmp_path, monkeypatch):
    fetched = []

    def fake_urlopen(req, timeout=None):
        url = req if isinstance(req, str) else req.full_url
        if getattr(req, "get_method", lambda: "GET")() == "HEAD":
            return _FakeResp(b"")
        fetched.append(url)
        return _FakeResp(b"fake-bytes")

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    dl.check_and_download(tmp_path, "none", quiet=True)
    # all 5 required + 2 optional files landed, atomically (no .part left)
    for rel in dl.manifest("none") + dl.OPTIONAL_FILES:
        p = tmp_path / rel
        assert p.exists() and p.read_bytes() == b"fake-bytes"
    assert not list(tmp_path.rglob("*.part"))
    assert len(fetched) == 7
    # idempotent: second call fetches nothing
    fetched.clear()
    dl.check_and_download(tmp_path, "none", quiet=True)
    assert fetched == []


def test_check_and_download_raises_offline(tmp_path, monkeypatch):
    def fail_urlopen(req, timeout=None):
        raise urllib.error.URLError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", fail_urlopen)
    with pytest.raises(RuntimeError, match="Place them under"):
        dl.check_and_download(tmp_path, "none", quiet=True)


def test_optional_failure_is_not_fatal(tmp_path, monkeypatch):
    def fake_urlopen(req, timeout=None):
        url = req if isinstance(req, str) else req.full_url
        if "codec_encoder" in url or "speaker_encoder" in url:
            raise urllib.error.URLError("403")
        return _FakeResp(b"ok")

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    dl.check_and_download(tmp_path, "none", quiet=True)  # must not raise
    assert (tmp_path / "onnx/qwen3_tts_decoder.onnx").exists()
    assert not (tmp_path / "onnx/qwen3_tts_codec_encoder.onnx").exists()
