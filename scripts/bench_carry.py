"""A/B bench: carry-KV decode vs legacy xs/ys layer scan, per batch size.

Measures the per-frame decode cost of the chunk program (gen_frames, 4
frames) at several batch sizes with QTTS_CARRY_KV on and off.  The carry
path exists to kill the per-layer full-capacity KV copies whose HBM traffic
made per-stream RTF scale ~linearly with batch (BENCH_r02:
batch_rtf_per_stream 0.152@8 -> 0.609@32).

    QTTS_CARRY_KV=0 python scripts/bench_carry.py --batches 1,8,32
    QTTS_CARRY_KV=1 python scripts/bench_carry.py --batches 1,8,32

(one process per mode: the flag is read at trace time).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.engine import _enable_compilation_cache
    _enable_compilation_cache()
    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.io.assets import Assets
    from qwen3_tts_tpu.models import predictor as predictor_lib
    from qwen3_tts_tpu.models import talker as talker_lib
    from qwen3_tts_tpu.ops import quant as quant_ops
    from qwen3_tts_tpu.runtime import generate as gen
    from qwen3_tts_tpu.utils.sync import hard_sync

    cfg = EngineConfig()
    PCAP = 128
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k5 = jax.random.split(key, 4)
    tp = jax.jit(functools.partial(talker_lib.init_talker_params,
                                   cfg.talker))(k1)
    tp = jax.jit(lambda p: {
        "layers": quant_ops.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "codec_head": quant_ops.quantize_head(p["codec_head"])})(tp)
    pp = jax.jit(functools.partial(predictor_lib.init_predictor_params,
                                   cfg.predictor))(k2)
    pp = jax.jit(lambda p: {
        "layers": quant_ops.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "lm_head": quant_ops.quantize_head(p["lm_head"])})(pp)
    assets = Assets.random_init(k3, text_rows=4096, codec_rows=4096,
                                dtype=jnp.bfloat16)
    generator = gen.Generator(cfg, tp, pp, assets.pack())
    sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                top_k=jnp.int32(40), top_p=jnp.float32(0.9))

    mode = "carry" if os.environ.get("QTTS_CARRY_KV", "1") != "0" else "legacy"
    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        embeds = jax.random.normal(k5, (b, PCAP, cfg.talker.d_model),
                                   jnp.float32) * 0.02
        lengths = jnp.full((b,), PCAP, jnp.int32)

        t0 = time.time()
        state = generator.start(embeds, lengths, jax.random.PRNGKey(1))
        hard_sync(state.logits)
        t_prefill_cold = time.time() - t0
        pf = []
        for _ in range(args.reps):
            t0 = time.time()
            state = generator.start(embeds, lengths, jax.random.PRNGKey(1))
            hard_sync(state.logits)
            pf.append(time.time() - t0)
        t_prefill = min(pf)

        t0 = time.time()
        state, codes, valid = generator.chunk(state, sampler,
                                              prompt_cap=PCAP,
                                              n_frames=args.frames)
        hard_sync(codes)
        t_cold = time.time() - t0

        times = []
        for _ in range(args.reps):
            t0 = time.time()
            state, codes, valid = generator.chunk(state, sampler,
                                                  prompt_cap=PCAP,
                                                  n_frames=args.frames)
            hard_sync(codes)
            times.append(time.time() - t0)
        warm = min(times)
        results[b] = {
            "compile_s": round(t_cold, 1),
            "prefill_cold_s": round(t_prefill_cold, 1),
            "prefill_warm_ms": round(t_prefill * 1e3, 1),
            "ms_per_frame": round(warm * 1e3 / args.frames, 3),
            "ms_per_frame_per_stream": round(warm * 1e3 / args.frames / b,
                                             4),
        }
        print(json.dumps({"mode": mode, "batch": b, **results[b]}),
              flush=True)
    print(json.dumps({"metric": "carry_kv_ab", "mode": mode,
                      "frames": args.frames, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
