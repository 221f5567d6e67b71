"""Component-level micro-benchmarks: per-frame cost of each pipeline stage.

Prints one JSON line per component (talker step, predictor frame, codec
chunk, prefill, fused chunk) so optimization work can see exactly where
frame time goes.  Run: python bench_micro.py [--frames 24]
"""

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--prompt-cap", type=int, default=128)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="packed-int4 LM weights (grouped scales)")
    ap.add_argument("--only", default="",
                    help="comma-separated component-name substrings to run")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]

    def want(name):
        return not only or any(s in name for s in only)

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
    n, pc = args.frames, args.prompt_cap
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    tp = jax.jit(functools.partial(tl.init_talker_params, cfg.talker))(ks[0])
    pp = jax.jit(functools.partial(pl_.init_predictor_params,
                                   cfg.predictor))(ks[1])
    if args.int4:
        tp = jax.jit(lambda p: {
            "layers": qo.quantize_decoder_layers_int4(p["layers"]),
            "final_norm": p["final_norm"],
            "codec_head": qo.quantize_head(p["codec_head"])})(tp)
        pp = jax.jit(lambda p: {
            "layers": qo.quantize_decoder_layers_int4(p["layers"]),
            "final_norm": p["final_norm"],
            "lm_head": qo.quantize_head(p["lm_head"])})(pp)
    elif not args.no_int8:
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
    g = gen.Generator(cfg, tp, pp, pack, codec_params=dp)
    embeds = jax.random.normal(ks[4], (1, pc, 2048), jnp.float32) * 0.02
    lengths = jnp.full((1,), pc, jnp.int32)
    sp = gen.SamplerParams(temperature=jnp.float32(0.7),
                           top_k=jnp.int32(40), top_p=jnp.float32(0.9))

    def timeit(fn, reps=3, warm=1):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def emit(component, total_s, per="frame", count=None):
        count = count or n
        print(json.dumps({"component": component,
                          "total_ms": round(total_s * 1000, 2),
                          f"ms_per_{per}": round(total_s * 1000 / count, 3)}))

    def run_prefill():
        st = g.start(embeds, lengths, jax.random.PRNGKey(1))
        hard_sync(st.logits)
        return st

    if want("prefill"):
        emit("prefill", timeit(run_prefill), per="call", count=1)

    def fused():
        st = g.start(embeds, lengths, jax.random.PRNGKey(1))
        ds = dec.init_decoder_state(cfg.codec_decoder, dp, 1)
        for _ in range(n // 4):
            st, ds, codes, valid, wav = g.chunk_with_audio(
                st, ds, sp, prompt_cap=pc)
        hard_sync(wav)

    if want("fused_lm_plus_codec"):
        emit("fused_lm_plus_codec", timeit(fused))

    def lm_only():
        st = g.start(embeds, lengths, jax.random.PRNGKey(1))
        for _ in range(n // 4):
            st, codes, valid = g.chunk(st, sp, prompt_cap=pc)
        hard_sync(codes)

    if want("lm_only"):
        emit("lm_only", timeit(lm_only))

    codes4 = jnp.zeros((1, 4, 16), jnp.int32)
    dchunk = jax.jit(lambda p, c, s: dec.decode_chunk(cfg.codec_decoder,
                                                      p, c, s),
                     donate_argnums=(2,))

    def codec_only():
        ds = dec.init_decoder_state(cfg.codec_decoder, dp, 1)
        for _ in range(n // 4):
            wav, ds = dchunk(dp, codes4, ds)
        hard_sync(wav)

    if want("codec_only"):
        emit("codec_only", timeit(codec_only))

    h1024 = jnp.zeros((1, 1024), jnp.float32)
    code0 = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def pred_n(params, tables):
        def body(_, i):
            return _, pl_.predict_frame(cfg.predictor, params, h1024, code0,
                                        tables)
        _, codes = jax.lax.scan(body, None, jnp.arange(n))
        return codes

    if want("predictor_only"):
        emit("predictor_only",
             timeit(lambda: hard_sync(pred_n(pp, pack["codec_tables_1024"]))))

    # fused Pallas predictor kernel (both modes), dependent-chained like the
    # real loop (codes feed the next frame's hidden perturbation)
    from qwen3_tts_tpu.kernels import predictor_frame as pf
    if pf.supported(cfg.predictor, 1) and not args.int4 and want("predictor_fused"):
        def fused_n_factory():
            @jax.jit
            def fused_n(params, tables):
                def body(c, i):
                    h = h1024 + c.sum().astype(jnp.float32) * 1e-9
                    codes = pf.predict_frame_fused(cfg.predictor, params, h,
                                                   code0, tables)
                    return codes, codes
                _, codes = jax.lax.scan(body, jnp.zeros((1, 16), jnp.int32),
                                        jnp.arange(n))
                return codes
            return fused_n

        import os
        fused_res = fused_n_factory()
        emit("predictor_fused_resident",
             timeit(lambda: hard_sync(fused_res(pp,
                                                pack["codec_tables_1024"]))))
        os.environ["QTTS_PREDICTOR_RESIDENT"] = "0"
        fused_str = fused_n_factory()
        emit("predictor_fused_streaming",
             timeit(lambda: hard_sync(fused_str(pp,
                                                pack["codec_tables_1024"]))))
        del os.environ["QTTS_PREDICTOR_RESIDENT"]


if __name__ == "__main__":
    main()
