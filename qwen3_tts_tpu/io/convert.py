"""Offline weight conversion utilities.

1. `convert_checkpoint`: GGUF (any supported quant) -> a single .npz of
   dequantized f32/bf16 tensors in this framework's layout, for faster
   subsequent loads (the GGUF K-quant dequant of a GB-scale file costs
   seconds; the npz memory-maps).
2. `save_params_npz` / `load_params_npz`: generic pytree <-> flat npz with
   'a/b/0/c' path keys (the format engine._load_npz_or consumes for codec /
   speaker weights).
3. `convert_torch_codec` (gated on torch): import codec decoder/encoder /
   speaker-encoder weights from a PyTorch state_dict whose module names are
   mapped by an explicit table — the offline path for the reference's ONNX
   graph weights once exported (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params_npz(path, params) -> None:
    np.savez(path, **flatten_pytree(params))


def load_params_npz(path):
    from ..engine import _unflatten_npz
    return _unflatten_npz(dict(np.load(path, allow_pickle=False)))


def convert_checkpoint(gguf_path, out_path, dtype=np.float32) -> None:
    """Dequantize every tensor of a GGUF file into one npz."""
    from .gguf import read_gguf
    g = read_gguf(gguf_path)
    tensors = {name: g.read_tensor(name).astype(dtype) for name in g.names()}
    np.savez(out_path, **tensors)


def onnx_to_npz(onnx_path, out_path, list_only: bool = False):
    """Dump an ONNX model's initializers to npz (via io.onnx_lite — no onnx
    package needed) and print a shape summary.  First step of importing the
    reference's codec/speaker weights: inspect with list_only, then write the
    name map into convert_torch_codec/codec param layout."""
    from .onnx_lite import read_onnx_initializers
    tensors = read_onnx_initializers(onnx_path)
    for name in sorted(tensors):
        print(f"{name}\t{tensors[name].dtype}\t{tensors[name].shape}")
    print(f"# {len(tensors)} initializers")
    if not list_only:
        np.savez(out_path, **tensors)
        print(f"wrote {out_path}")
    return tensors


def convert_torch_codec(state_dict, name_map: Dict[str, str]):
    """Map a torch state_dict into a framework params pytree using an
    explicit old->new name table.  Values are converted to numpy; the caller
    reshapes/transposes per entry as needed."""
    flat = {}
    for old, new in name_map.items():
        t = state_dict[old]
        flat[new] = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    return flat


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="qwen3_tts_tpu.io.convert")
    p.add_argument("src", type=Path, help=".gguf or .onnx input")
    p.add_argument("out", type=Path, nargs="?", default=Path("out.npz"))
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float16"])
    p.add_argument("--list", action="store_true",
                   help="only list tensors (onnx input)")
    p.add_argument("--summary", action="store_true",
                   help="print graph summary: ops, inputs, outputs (onnx)")
    args = p.parse_args(argv)
    if args.summary and args.src.suffix == ".onnx":
        from .onnx_exec import summarize
        print(summarize(args.src))
        return 0
    if args.src.suffix == ".onnx":
        onnx_to_npz(args.src, args.out, list_only=args.list)
    else:
        convert_checkpoint(args.src, args.out, np.dtype(args.dtype))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
