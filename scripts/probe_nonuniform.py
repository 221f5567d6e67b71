"""A/B: bulk decode with uniform vs per-lane cursors (continuous batching's
decode path).  Run: python scripts/probe_nonuniform.py [batch]"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.engine import _enable_compilation_cache
from qwen3_tts_tpu.io.assets import Assets
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.ops import quant as qo
from qwen3_tts_tpu.runtime import generate as gen
from qwen3_tts_tpu.utils.sync import hard_sync

_enable_compilation_cache()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
FRAMES = 16
PCAP = 128

cfg = EngineConfig()
key = jax.random.PRNGKey(0)
k1, k2, k3, k5 = jax.random.split(key, 4)
tp = jax.jit(functools.partial(talker_lib.init_talker_params, cfg.talker))(k1)
pp = jax.jit(functools.partial(predictor_lib.init_predictor_params,
                               cfg.predictor))(k2)
tp = jax.jit(lambda p: {"layers": qo.quantize_decoder_layers(p["layers"]),
                        "final_norm": p["final_norm"],
                        "codec_head": qo.quantize_head(p["codec_head"])})(tp)
pp = jax.jit(lambda p: {"layers": qo.quantize_decoder_layers(p["layers"]),
                        "final_norm": p["final_norm"],
                        "lm_head": qo.quantize_head(p["lm_head"])})(pp)
assets = Assets.random_init(k3, text_rows=2048, codec_rows=4096,
                            dtype=jnp.bfloat16)
pack = assets.pack()
generator = gen.Generator(cfg, tp, pp, pack)

embeds = jax.random.normal(k5, (B, PCAP, cfg.talker.d_model),
                           jnp.float32) * 0.02
lengths = jnp.full((B,), PCAP, jnp.int32)
sampler = gen.SamplerParams(temperature=jnp.float32(0.7),
                            top_k=jnp.int32(40), top_p=jnp.float32(0.9))

for uniform in (True, False):
    state = generator.start(embeds, lengths, jax.random.PRNGKey(0))
    if not uniform:
        # de-uniform the cursors like a post-refill state (lane 0 ahead)
        state = state.replace(cache=state.cache.replace(
            write_idx=state.cache.write_idx.at[0].add(0)))
    st, codes, valid, done, saw = generator.run_bulk_codes(
        state, sampler, prompt_cap=PCAP, max_frames=FRAMES,
        uniform_cursor=uniform)
    hard_sync(codes)
    ts = []
    for _ in range(3):
        state2 = generator.start(embeds, lengths, jax.random.PRNGKey(1))
        hard_sync(state2.logits)
        t0 = time.perf_counter()
        st, codes, valid, done, saw = generator.run_bulk_codes(
            state2, sampler, prompt_cap=PCAP, max_frames=FRAMES,
            uniform_cursor=uniform)
        hard_sync(codes)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"uniform={uniform} b={B}: {dt*1e3:.1f} ms for {FRAMES} frames "
          f"({dt/FRAMES*1e3:.2f} ms/frame, {B*FRAMES/dt:.0f} frames/s)",
          flush=True)
