"""Orbax fast-start cache of converted LM weights.

The reference pays GGUF parse + ggml dequant on every process start (llama.cpp
`llama_model_load` via /root/reference/src/models/llama/mod.rs:326-391).  Here
the same conversion — GGUF K-quant dequant (io/gguf.py) followed by on-device
int8 re-quantization (ops/quant.py) — runs ONCE; the resulting device pytree
is checkpointed with Orbax next to the model files and restored directly on
later engine starts, skipping both the host-side dequant and the quantize
program.

Cache layout (under `<model_dir>/cache/<name>/`):
  params/     Orbax StandardCheckpointer tree (int8 q/s tensors + norms)
  meta.json   source fingerprint (path/size/mtime/int8 flag) + the derived
              model config (GGUF metadata overrides, io/weights.py)

A cache entry is valid only if the fingerprint matches the current source
file exactly; any GGUF change invalidates it.  Disable with
QTTS_WEIGHT_CACHE=0.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple

FORMAT_VERSION = 1


def enabled() -> bool:
    return os.environ.get("QTTS_WEIGHT_CACHE", "1") not in ("0", "false")


def fingerprint(src: Path, use_int8: bool) -> dict:
    st = Path(src).stat()
    return {"version": FORMAT_VERSION, "src": Path(src).name,
            "size": st.st_size, "mtime_ns": st.st_mtime_ns,
            "int8": bool(use_int8)}


def _coerce(cfg_cls, data: dict):
    """JSON round-trips tuples as lists; coerce back per-field so frozen
    dataclass equality (and static jit args) hold."""
    kw = {}
    for f in dataclasses.fields(cfg_cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if isinstance(v, list):
            v = tuple(v)
        kw[f.name] = v
    return cfg_cls(**kw)


def save_lm(model_dir, name: str, params: Any, cfg, fp: dict) -> bool:
    """Checkpoint converted params + derived config.  Returns False (and
    leaves no partial state) on any failure — the cache is an optimization,
    never a correctness dependency."""
    try:
        import orbax.checkpoint as ocp
        root = Path(model_dir) / "cache" / name
        if root.exists():
            shutil.rmtree(root)
        root.mkdir(parents=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((root / "params").resolve(), params)
        ckptr.wait_until_finished()
        meta = {"fingerprint": fp, "config": dataclasses.asdict(cfg)}
        (root / "meta.json").write_text(json.dumps(meta, indent=1))
        return True
    except Exception as e:  # pragma: no cover - depends on fs/orbax env
        from ..utils.logging import get_logger
        get_logger().warning(f"weight-cache save failed for {name}: {e!r}")
        shutil.rmtree(Path(model_dir) / "cache" / name, ignore_errors=True)
        return False


def load_lm(model_dir, name: str, fp: dict, cfg_cls
            ) -> Optional[Tuple[Any, Any]]:
    """Restore (params, config) if a cache entry matches `fp`, else None."""
    root = Path(model_dir) / "cache" / name
    meta_path = root / "meta.json"
    if not meta_path.exists():
        return None
    try:
        meta = json.loads(meta_path.read_text())
        if meta.get("fingerprint") != fp:
            return None
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore((root / "params").resolve())
        cfg = _coerce(cfg_cls, meta["config"])
        return params, cfg
    except Exception as e:
        from ..utils.logging import get_logger
        get_logger().warning(f"weight-cache load failed for {name}: {e!r} — "
                             "reconverting from source")
        return None
