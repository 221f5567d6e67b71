"""Model provisioning (Hugging Face hub), network-gated.

The reference downloads both model files and native runtime libraries
(/root/reference/src/download.rs); the TPU framework needs only the model
files — jaxlib is the device runtime.  Downloads go through `huggingface_hub`
when it is importable and the environment allows network access; otherwise a
clear error tells the user what to place where.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

DEFAULT_REPO = "cgisky/qwen3-tts-custom-gguf"

QUANT_SUBDIR = {"none": "gguf", "q5_k_m": "gguf_q5_k_m", "q8_0": "gguf_q8_0"}


def manifest(quant: str = "none") -> List[str]:
    """Files required for synthesis, relative to the model dir (mirrors the
    reference manifest, download.rs:55-101, minus runtime libraries)."""
    sub = QUANT_SUBDIR.get(quant, "gguf")
    return [
        "tokenizer/tokenizer.json",
        f"{sub}/qwen3_assets.gguf",
        f"{sub}/qwen3_tts_talker.gguf",
        f"{sub}/qwen3_tts_predictor.gguf",
    ]


def missing_files(model_dir, quant: str = "none") -> List[Path]:
    model_dir = Path(model_dir)
    return [model_dir / rel for rel in manifest(quant)
            if not (model_dir / rel).exists()]


def check_and_download(model_dir, quant: str = "none",
                       repo_id: str = DEFAULT_REPO) -> None:
    missing = missing_files(model_dir, quant)
    if not missing:
        return
    try:
        from huggingface_hub import hf_hub_download  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "Model files missing and huggingface_hub is unavailable. "
            f"Place these files under {model_dir}: "
            + ", ".join(str(p) for p in missing)) from e
    model_dir = Path(model_dir)
    for rel in manifest(quant):
        target = model_dir / rel
        if target.exists():
            continue
        target.parent.mkdir(parents=True, exist_ok=True)
        hf_hub_download(repo_id=repo_id, filename=rel,
                        local_dir=str(model_dir))
