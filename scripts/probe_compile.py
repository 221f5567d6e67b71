"""Compile-ceiling probe for the talker-step megakernel (round-3 item #1).

The axon remote-compile service historically died (~30-40 min broken pipe)
on any lax.scan-wrapped program containing kernels/talker_step.py, which is
what keeps QTTS_FUSED_TALKER opt-in.  This probe times each candidate
program shape separately so one crash doesn't mask the others:

  python scripts/probe_compile.py kern    # standalone kernel call
  python scripts/probe_compile.py scan4   # minimal 4-step lax.scan wrapper
  python scripts/probe_compile.py chunk   # full gen_frames chunk (fused on)
  python scripts/probe_compile.py bulk    # full _gen_bulk (fused on)

Run on the TPU (default backend).  Results append to
/root/repo/scripts/probe_compile.log with wall times.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOG = os.path.join(os.path.dirname(__file__), "probe_compile.log")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main() -> None:
    stage = sys.argv[1]
    wmode = "int8"
    for suffix in ("bf16", "w8a8", "w4a8", "off"):
        if stage.endswith("_" + suffix):
            wmode = suffix
            stage = stage[: -len(suffix) - 1]
    os.environ["QTTS_FUSED_TALKER"] = (
        "0" if wmode == "off" else wmode if wmode != "int8" else "1")

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.engine import _enable_compilation_cache
    _enable_compilation_cache()

    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.io.assets import Assets
    from qwen3_tts_tpu.kernels import talker_step as ts
    from qwen3_tts_tpu.models import predictor as predictor_lib
    from qwen3_tts_tpu.models import talker as talker_lib
    from qwen3_tts_tpu.models import transformer
    from qwen3_tts_tpu.models.codec import decoder as codec_decoder
    from qwen3_tts_tpu.ops import quant as quant_ops
    from qwen3_tts_tpu.ops.rope import (inv_frequencies, mrope_cos_sin,
                                        section_ids)
    from qwen3_tts_tpu.runtime import generate as gen
    from qwen3_tts_tpu.utils.sync import hard_sync

    cfg = EngineConfig()
    tcfg = cfg.talker
    B = int(os.environ.get("QTTS_PROBE_B", "1"))
    PCAP = int(os.environ.get("QTTS_PROBE_PCAP", "128"))
    # capacity formula of runtime.generate.prefill at bench shapes
    need = PCAP + cfg.runtime.max_steps + cfg.runtime.frames_per_chunk
    CAP = ((need + 511) // 512) * 512

    from qwen3_tts_tpu.kernels.talker_step import layers_per_step
    log(f"stage={stage} weights={wmode} backend={jax.default_backend()} "
        f"B={B} PCAP={PCAP} CAP={CAP} lps={layers_per_step(28)}")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tp = jax.jit(functools.partial(talker_lib.init_talker_params, tcfg))(k1)
    tp = jax.jit(lambda p: {
        "layers": quant_ops.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "codec_head": quant_ops.quantize_head(p["codec_head"])})(tp)

    if stage in ("kern", "scan4", "scan64"):
        cache = transformer.init_kv_cache(tcfg, B, CAP, jnp.bfloat16)
        cache = cache.replace(
            lengths=jnp.full((B,), PCAP, jnp.int32),
            write_idx=jnp.full((B,), PCAP, jnp.int32))
        x = jax.random.normal(k2, (B, tcfg.d_model), jnp.float32) * 0.02
        inv = jnp.asarray(inv_frequencies(tcfg.head_dim, tcfg.rope_theta))
        sec = jnp.asarray(section_ids(tcfg.mrope_sections))

        def rope_at(pos):
            p = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))[:, None]
            pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
            return mrope_cos_sin(pos4, inv, sec)

        if stage == "kern":
            t0 = time.time()
            h, kc, vc = ts.talker_step_fused(
                tcfg, tp, x.astype(jnp.bfloat16),
                rope_at(PCAP)[0][:, 0], rope_at(PCAP)[1][:, 0],
                cache.k, cache.v, cache.lengths, jnp.int32(PCAP), PCAP,
                weights=wmode)
            hard_sync(h)
            log(f"kern compile+run: {time.time()-t0:.1f}s")
            t0 = time.time()
            h, kc, vc = ts.talker_step_fused(
                tcfg, tp, x.astype(jnp.bfloat16),
                rope_at(PCAP)[0][:, 0], rope_at(PCAP)[1][:, 0],
                kc, vc, cache.lengths, jnp.int32(PCAP + 1), PCAP,
                weights=wmode)
            hard_sync(h)
            log(f"kern warm run: {time.time()-t0:.3f}s")
            return

        # scan4: minimal scan wrapper — the step's own output feeds back in
        layer_w = ts.prep_layer_weights(tcfg, tp, weights=wmode)
        cfg_static = (tcfg.n_layers, B, B + (B % 2), tcfg.n_heads,
                      tcfg.n_kv_heads, tcfg.head_dim, tcfg.d_model,
                      tcfg.rms_eps, CAP, PCAP)

        @jax.jit
        def scan4(layer_w, x0, k_cache, v_cache, lengths):
            def body(carry, i):
                xx, kc, vc, pos = carry
                cos, sin = rope_at(pos)
                cos_t = jnp.tile(cos[:, 0].reshape(B, tcfg.head_dim),
                                 (1, tcfg.n_heads))
                sin_t = jnp.tile(sin[:, 0].reshape(B, tcfg.head_dim),
                                 (1, tcfg.n_heads))
                bp = B + (B % 2)
                if bp != B:
                    pad = ((0, bp - B), (0, 0))
                    xx_p = jnp.pad(xx.astype(jnp.bfloat16), pad)
                    cos_t = jnp.pad(cos_t, pad)
                    sin_t = jnp.pad(sin_t, pad)
                else:
                    xx_p = xx.astype(jnp.bfloat16)
                h, kc, vc = ts._call(
                    xx_p, cos_t.astype(jnp.float32),
                    sin_t.astype(jnp.float32), layer_w, kc, vc,
                    lengths, pos, cfg_static=cfg_static, wmode=wmode,
                    lps=ts.layers_per_step(tcfg.n_layers),
                    ablate=os.environ.get("QTTS_TALKER_ABLATE") or None,
                    sfold=(wmode == "w4a8" and
                           os.environ.get("QTTS_TALKER_SFOLD") == "1"))
                return (h.astype(jnp.float32), kc, vc, pos + 1), h[0, 0]
            (xx, kc, vc, pos), ys = jax.lax.scan(
                body, (x0, k_cache, v_cache, jnp.int32(PCAP)), None,
                length=(64 if stage == "scan64" else 4))
            return xx, kc, vc, ys

        layer_w = jax.device_put(layer_w)
        t0 = time.time()
        xx, kc, vc, ys = scan4(layer_w, x, cache.k, cache.v, cache.lengths)
        hard_sync(ys)
        log(f"{stage} compile+run: {time.time()-t0:.1f}s")
        for _ in range(3):
            t0 = time.time()
            xx, kc, vc, ys = scan4(layer_w, x, cache.k, cache.v,
                                   cache.lengths)
            hard_sync(ys)
            log(f"{stage} warm run: {time.time()-t0:.3f}s")
        return

    # full-pipeline stages
    pp = jax.jit(functools.partial(predictor_lib.init_predictor_params,
                                   cfg.predictor))(k2)
    pp = jax.jit(lambda p: {
        "layers": quant_ops.quantize_decoder_layers(p["layers"]),
        "final_norm": p["final_norm"],
        "lm_head": quant_ops.quantize_head(p["lm_head"])})(pp)
    assets = Assets.random_init(k3, text_rows=4096, codec_rows=4096,
                                dtype=jnp.bfloat16)
    pack = assets.pack()
    dec_params = jax.jit(functools.partial(
        codec_decoder.init_decoder_params, cfg.codec_decoder))(k4)
    generator = gen.Generator(cfg, tp, pp, pack, codec_params=dec_params)
    embeds = jax.random.normal(k2, (B, PCAP, tcfg.d_model), jnp.float32) * 0.02
    lengths = jnp.full((B,), PCAP, jnp.int32)
    sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                                top_k=jnp.int32(40), top_p=jnp.float32(0.9))

    t0 = time.time()
    state = generator.start(embeds, lengths, jax.random.PRNGKey(7))
    hard_sync(state.logits)
    log(f"prefill compile+run: {time.time()-t0:.1f}s")

    if stage == "chunk":
        t0 = time.time()
        state, codes, valid = generator.chunk(state, sampler, prompt_cap=PCAP)
        hard_sync(codes)
        log(f"chunk(fused talker) compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        state, codes, valid = generator.chunk(state, sampler, prompt_cap=PCAP)
        hard_sync(codes)
        log(f"chunk warm run: {time.time()-t0:.3f}s")
        return

    if stage == "bulk":
        dec_state = codec_decoder.init_decoder_state(
            cfg.codec_decoder, dec_params, batch=B)
        t0 = time.time()
        out = generator.run_bulk(state, dec_state, sampler, prompt_cap=PCAP,
                                 max_frames=96)
        hard_sync(out[4])
        log(f"bulk(fused talker) compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        state2 = generator.start(embeds, lengths, jax.random.PRNGKey(8))
        dec_state = codec_decoder.init_decoder_state(
            cfg.codec_decoder, dec_params, batch=B)
        out = generator.run_bulk(state2, dec_state, sampler, prompt_cap=PCAP,
                                 max_frames=96)
        hard_sync(out[4])
        log(f"bulk warm run: {time.time()-t0:.3f}s")
        return


if __name__ == "__main__":
    main()
