"""A/B the continuous scheduler's group program vs the wave bulk program.

Same shapes as the 96-on-32 serving bench (b=32, bucket-128 prompts,
16-frame groups): run_bulk with uniform_cursor=True (wave path) vs
uniform_cursor=False + per-lane budgets (what ContinuousBatcher
dispatches per round).  Isolates where the scheduler's ~33 ms/frame-row
vs the wave path's ~18 comes from.

Run on the TPU: python scripts/bench_group_cursor.py [--frames 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prompt-cap", type=int, default=128)
    args = ap.parse_args()

    import functools
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
    b, pc = args.batch, args.prompt_cap
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
    dp = jax.jit(functools.partial(dec.init_decoder_params,
                                   cfg.codec_decoder))(ks[3])
    g = gen.Generator(cfg, tp, pp, assets.pack(), codec_params=dp)
    embeds = jax.random.normal(ks[4], (b, pc, 2048), jnp.float32) * 0.02
    lengths = jnp.full((b,), pc, jnp.int32)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                top_k=jnp.int32(40), top_p=jnp.float32(0.9))
    budgets = jnp.full((b,), 10_000, jnp.int32)   # never binding

    def measure(label, **kw):
        def run_once(seed):
            st = g.start(embeds, lengths, jax.random.PRNGKey(seed))
            hard_sync(st.logits)
            ds = dec.init_decoder_state(cfg.codec_decoder, dp, b)
            t0 = time.perf_counter()
            out = g.run_bulk(st, ds, sampler, prompt_cap=pc,
                             max_frames=args.frames, **kw)
            hard_sync(out[4])
            return time.perf_counter() - t0
        run_once(0)                                   # compile/warm
        best = min(run_once(s) for s in (1, 2, 3))
        print(json.dumps({
            "arm": label, "decode_ms": round(best * 1000, 1),
            "ms_per_frame_row": round(best * 1000 / args.frames, 2),
        }), flush=True)

    arm = os.environ.get("ARM", "both")
    if arm in ("both", "uniform"):
        measure("uniform")
    if arm in ("both", "perlane"):
        measure("perlane", uniform_cursor=False, budgets=budgets)


if __name__ == "__main__":
    main()
