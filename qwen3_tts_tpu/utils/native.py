"""ctypes bindings for the native host library (native/qtts_native.cpp).

Loads `libqtts_native.so` (built via `make -C native`); every entry point has
a pure-numpy fallback, so the framework is fully functional without the
build — the native path just makes model loading (GGUF K-quant dequant of
GB-scale checkpoints) faster.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SEARCH = [
    Path(__file__).resolve().parent.parent.parent / "native" / "libqtts_native.so",
    Path(__file__).resolve().parent.parent / "libqtts_native.so",
]


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for cand in _SEARCH:
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
                if lib.qtts_version() >= 1:
                    _configure(lib)
                    _LIB = lib
                    break
            except OSError:
                continue
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    for name in ("qtts_dequant_q8_0", "qtts_dequant_q4_0", "qtts_dequant_q5_0",
                 "qtts_dequant_q4_k", "qtts_dequant_q5_k", "qtts_dequant_q6_k"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, i64, f32p]
        fn.restype = None
    lib.qtts_f16_to_f32.argtypes = [ctypes.POINTER(ctypes.c_uint16), i64, f32p]
    lib.qtts_bf16_to_f32.argtypes = [ctypes.POINTER(ctypes.c_uint16), i64, f32p]


_DEQUANT_FNS = {
    8: ("qtts_dequant_q8_0", 34, 32),    # GGML_Q8_0
    2: ("qtts_dequant_q4_0", 18, 32),    # GGML_Q4_0
    6: ("qtts_dequant_q5_0", 22, 32),    # GGML_Q5_0
    12: ("qtts_dequant_q4_k", 144, 256),  # GGML_Q4_K
    13: ("qtts_dequant_q5_k", 176, 256),  # GGML_Q5_K
    14: ("qtts_dequant_q6_k", 210, 256),  # GGML_Q6_K
}


def native_dequantize(raw: np.ndarray, ggml_type: int,
                      n_elems: int) -> Optional[np.ndarray]:
    """Dequantize via the native library; None if unavailable/unsupported."""
    lib = get_lib()
    if lib is None or ggml_type not in _DEQUANT_FNS:
        return None
    name, block_bytes, block_elems = _DEQUANT_FNS[ggml_type]
    nb = n_elems // block_elems
    raw = np.ascontiguousarray(raw[: nb * block_bytes], np.uint8)
    out = np.empty(n_elems, np.float32)
    getattr(lib, name)(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(nb),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class _TensorSpec(ctypes.Structure):
    _fields_ = [("file_offset", ctypes.c_int64),
                ("ggml_type", ctypes.c_int32),
                ("n_elems", ctypes.c_int64),
                ("out_offset", ctypes.c_int64)]


def native_load_tensors(path: str, specs, total_elems: int,
                        n_threads: int = 0) -> Optional[np.ndarray]:
    """Parallel multi-tensor GGUF load+dequant into one float32 arena.

    specs: iterable of (file_offset, ggml_type, n_elems, out_offset).
    Returns the arena or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_qtts_load_configured"):
        lib.qtts_load_tensors.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_TensorSpec), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.qtts_load_tensors.restype = ctypes.c_int
        lib._qtts_load_configured = True
    specs = list(specs)
    arr = (_TensorSpec * len(specs))(*[_TensorSpec(*s) for s in specs])
    out = np.empty(total_elems, np.float32)
    rc = lib.qtts_load_tensors(
        str(path).encode(), arr, len(specs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n_threads))
    if rc != 0:
        return None
    return out
