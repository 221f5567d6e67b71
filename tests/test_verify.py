"""Real-checkpoint runbook (qwen3_tts_tpu/verify.py).

The runbook must be safe to run anywhere: with no model files every drill
self-skips (never fails), and the command exits 0.  With a file present but
broken, the owning drill FAILs and the exit code is 1 — that is the whole
point of the runbook on checkpoint-arrival day.
"""

import json

import numpy as np
import pytest

from qwen3_tts_tpu import verify as v


pytestmark = pytest.mark.quick


def test_empty_dir_all_skip(tmp_path, capsys):
    rc = v.main(["--model-dir", str(tmp_path / "nothing")])
    out = capsys.readouterr().out
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["fail"] == 0
    assert summary["pass"] == 0
    assert summary["skip"] == len(summary["drills"])
    assert summary["ready"] is False
    # every drill ran and reported
    for name in ("files", "hub-probe", "tokenizer", "assets-gguf",
                 "talker-gguf", "predictor-gguf", "llama-parity",
                 "onnx-decoder-import", "native-decoder-validate",
                 "encoder-import", "speaker-import", "golden-wav"):
        assert summary["drills"][name] == "SKIP"


def test_hub_probe_notices_published_files(tmp_path, capsys, monkeypatch):
    """The day the checkpoints appear on HF, the hub-probe drill must PASS
    with a loud 'published' message instead of skipping (VERDICT r4 #5)."""
    from qwen3_tts_tpu.io import download as dl

    monkeypatch.setattr(dl, "_probe", lambda url, timeout=3.0: True)
    rc = v.main(["--model-dir", str(tmp_path / "nothing")])
    out = capsys.readouterr().out
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["drills"]["hub-probe"] == "PASS"
    assert "published" in out


def test_hub_probe_partial_publication(tmp_path, capsys, monkeypatch):
    # only the tokenizer is up: the drill reports the split, still PASSes
    from qwen3_tts_tpu.io import download as dl

    def probe(url, timeout=3.0):
        return url.endswith("tokenizer.json") or "/resolve/" not in url

    monkeypatch.setattr(dl, "_probe", probe)
    res = dl.probe_manifest()
    assert res["published"] == ["tokenizer/tokenizer.json"]
    assert len(res["absent"]) == len(dl.manifest()) + len(dl.OPTIONAL_FILES) - 1


def test_broken_file_fails(tmp_path, capsys):
    # a tokenizer.json that is not a tokenizer: the drill must FAIL (not
    # crash the runbook, not skip) and the exit code must flip to 1
    tok = tmp_path / "tokenizer"
    tok.mkdir(parents=True)
    (tok / "tokenizer.json").write_text("this is not json")
    rc = v.main(["--model-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["drills"]["tokenizer"] == "FAIL"
    # the rest still ran / skipped — one bad file doesn't stop the runbook
    assert summary["drills"]["assets-gguf"] == "SKIP"


def test_assets_drill_validates_shapes(tmp_path, capsys):
    # a syntactically valid assets GGUF with the WRONG projection shape
    # must FAIL with the shape message, proving the drill checks content
    from qwen3_tts_tpu.io import gguf
    d = tmp_path / "gguf"
    d.mkdir(parents=True)
    tensors = {
        "proj.weight": np.zeros((8, 16), np.float32),
        "proj.bias": np.zeros((8,), np.float32),
        "text_embd": np.zeros((32, 16), np.float32),
        **{f"codec_embd.{i}": np.zeros((4, 16), np.float32)
           for i in range(16)},
    }
    gguf.write_gguf(d / "qwen3_assets.gguf", tensors,
                    {"general.architecture": "qwen3"})
    rc = v.main(["--model-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["drills"]["assets-gguf"] == "FAIL"
    # the failure names the offending component loudly (either our explicit
    # shape check or the Assets loader's own validation, whichever fires
    # first) and the runbook continued past it
    assert "assets-gguf" in out
    assert summary["drills"]["predictor-gguf"] == "SKIP"
