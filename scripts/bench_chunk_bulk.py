"""A/B the chunk megakernel inside the one-dispatch bulk path.

Measures exactly bench.py's headline schedule (prefill + run_bulk, b=1,
96 frames) with QTTS_FUSED_CHUNK on vs off, printing ms/frame for each.
Run: QTTS_FUSED_CHUNK=1 python scripts/bench_chunk_bulk.py [--frames 96]
(the env var only gates the DEFAULT; both arms are always measured by
constructing two Generators).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--prompt-cap", type=int, default=128)
    ap.add_argument("--arm", default="both", choices=["both", "on", "off"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.engine import _enable_compilation_cache
    from qwen3_tts_tpu.io.assets import Assets
    from qwen3_tts_tpu.models import predictor as pl_
    from qwen3_tts_tpu.models import talker as tl
    from qwen3_tts_tpu.models.codec import decoder as dec
    from qwen3_tts_tpu.ops import quant as qo
    from qwen3_tts_tpu.runtime import generate as gen
    from qwen3_tts_tpu.utils.sync import hard_sync

    _enable_compilation_cache()
    cfg = EngineConfig()
    pc = args.prompt_cap
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    tp = jax.jit(functools.partial(tl.init_talker_params, cfg.talker))(ks[0])
    pp = jax.jit(functools.partial(pl_.init_predictor_params,
                                   cfg.predictor))(ks[1])
    tp = jax.jit(lambda p: {
        "layers": qo.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "codec_head": qo.quantize_head(p["codec_head"])})(tp)
    pp = jax.jit(lambda p: {
        "layers": qo.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "lm_head": qo.quantize_head(p["lm_head"])})(pp)
    assets = Assets.random_init(ks[2], text_rows=4096, codec_rows=4096,
                                dtype=jnp.bfloat16)
    pack = assets.pack()
    dp = jax.jit(functools.partial(dec.init_decoder_params,
                                   cfg.codec_decoder))(ks[3])
    embeds = jax.random.normal(ks[4], (1, pc, 2048), jnp.float32) * 0.02
    lengths = jnp.full((1,), pc, jnp.int32)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                top_k=jnp.int32(40), top_p=jnp.float32(0.9))

    def measure(label):
        g = gen.Generator(cfg, tp, pp, pack, codec_params=dp)

        def run_once(seed):
            t0 = time.perf_counter()
            st = g.start(embeds, lengths, jax.random.PRNGKey(seed))
            hard_sync(st.logits)
            t_pre = time.perf_counter() - t0
            ds = dec.init_decoder_state(cfg.codec_decoder, dp, 1)
            st, ds, codes, valid, wav, _, _ = g.run_bulk(
                st, ds, sampler, prompt_cap=pc, max_frames=args.frames)
            hard_sync(wav)
            return t_pre, time.perf_counter() - t0

        t0 = time.perf_counter()
        run_once(0)
        compile_s = time.perf_counter() - t0
        runs = [run_once(s) for s in (1, 2, 3)]
        best = min(r[1] for r in runs)
        pre = min(r[0] for r in runs)
        print(json.dumps({
            "arm": label, "compile_s": round(compile_s, 1),
            "prefill_ms": round(pre * 1000, 1),
            "total_ms": round(best * 1000, 1),
            "ms_per_frame": round((best - pre) * 1000 / args.frames, 3),
        }), flush=True)

    if args.arm in ("both", "off"):
        os.environ["QTTS_FUSED_CHUNK"] = "0"
        measure("bulk-chunkoff")
    if args.arm in ("both", "on"):
        os.environ["QTTS_FUSED_CHUNK"] = "1"
        measure("bulk-chunkon")


if __name__ == "__main__":
    main()
