"""Reference-audio feature cache (binary `.cache` sidecar).

Format parity with /root/reference/src/utils/cache.rs:5-67: magic `TTSC`,
u32 version 1, u64 count + i64 codes, u64 count + f32 embedding — so caches
written by the reference implementation load here and vice versa.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

MAGIC = b"TTSC"
VERSION = 1


def save_cache(path, codes, emb) -> None:
    codes = np.asarray(codes, np.int64).reshape(-1)
    emb = np.asarray(emb, np.float32).reshape(-1)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", VERSION))
        f.write(struct.pack("<Q", codes.size))
        f.write(codes.tobytes())
        f.write(struct.pack("<Q", emb.size))
        f.write(emb.tobytes())


def load_cache(path) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError("Invalid magic bytes")
        (version,) = struct.unpack("<I", f.read(4))
        if version != VERSION:
            raise ValueError(f"Unsupported cache version {version}")
        (n_codes,) = struct.unpack("<Q", f.read(8))
        codes = np.frombuffer(f.read(8 * n_codes), np.int64).copy()
        (n_emb,) = struct.unpack("<Q", f.read(8))
        emb = np.frombuffer(f.read(4 * n_emb), np.float32).copy()
    return codes, emb
