"""TPU smoke of the full-scale ONNX decoder contract replica.

Day one with real checkpoints, serving decodes through io/onnx_exec at the
real graph's size (onnx.rs:477-487).  This script runs the contract-faithful
full-scale fixture (tests/fixtures_onnx.FULL: 512/1024 channels, 8 layers x
16 heads x 64, 5-stage upsampler -> 2000 samples/frame) through the executor
ON THE TPU to smoke out compile/memory issues that toy dims cannot:

    python scripts/smoke_onnx_fullsize.py [--frames-per-chunk 4] [--chunks 6]

Prints one JSON line with compile time, steady-state ms/chunk, codec-only
RTF, and the chunk-vs-oracle max error.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-chunk", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=6)
    args = ap.parse_args()

    import jax

    from qwen3_tts_tpu.engine import _enable_compilation_cache
    _enable_compilation_cache()
    from fixtures_onnx import FULL, build_decoder, decoder_reference

    from qwen3_tts_tpu.io.onnx_exec import OnnxExecutor
    from qwen3_tts_tpu.io.onnx_lite import read_onnx_graph
    from qwen3_tts_tpu.models.codec.onnx_decoder import OnnxStreamingDecoder

    t0 = time.time()
    data, _ = build_decoder(FULL, seed=0)
    dec = OnnxStreamingDecoder(OnnxExecutor(read_onnx_graph(data)))
    t_build = time.time() - t0

    rng = np.random.default_rng(5)
    n, k = args.frames_per_chunk, args.chunks
    codes = rng.integers(0, 2048, size=(n * k, FULL.NB))

    # first chunk: compile
    st = dec.create_state()
    t0 = time.time()
    w, st = dec.decode(codes[:n], st)
    t_compile = time.time() - t0

    # steady state: each later chunk re-specializes on the grown state
    # shapes (t grows by n per chunk) — this is exactly the shape-folding
    # behavior the real graph will exercise
    chunk_times = []
    wavs = [w]
    for i in range(1, k):
        t0 = time.time()
        w, st = dec.decode(codes[i * n:(i + 1) * n], st,
                           is_final=(i == k - 1))
        chunk_times.append(time.time() - t0)
        wavs.append(w)
    wav = np.concatenate(wavs)

    want = decoder_reference(FULL, codes)
    m = min(len(wav), len(want))
    err = float(np.abs(wav[:m] - want[:m]).max())

    spf = FULL.spf
    audio_s = n * spf / 24000.0
    warm = float(np.median(chunk_times)) if chunk_times else float("nan")
    print(json.dumps({
        "metric": "onnx_fullsize_smoke",
        "backend": jax.default_backend(),
        "frames": int(n * k),
        "build_s": round(t_build, 2),
        "first_chunk_s": round(t_compile, 2),
        "warm_ms_per_chunk": round(warm * 1e3, 2),
        "codec_rtf": round(warm / audio_s, 4),
        "max_abs_err_vs_oracle": err,
        "ok": bool(err < 1e-2 and np.isfinite(wav).all()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
