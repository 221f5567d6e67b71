"""Focused bench: per-stream RTF at serving batches through the new
batched fused-column talker kernel + batched fused predictor."""
import functools, json, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.io.assets import Assets
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.models.codec import decoder as codec_decoder
from qwen3_tts_tpu.runtime import generate as gen
from qwen3_tts_tpu.ops import quant as quant_ops
from qwen3_tts_tpu.utils.sync import hard_sync

PROMPT_CAP = 128
SFRAMES = 48

cfg = EngineConfig()
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
talker_params = jax.jit(functools.partial(talker_lib.init_talker_params, cfg.talker))(k1)
predictor_params = jax.jit(functools.partial(predictor_lib.init_predictor_params, cfg.predictor))(k2)
talker_params = jax.jit(lambda p: {
    "layers": quant_ops.quantize_decoder_layers(p["layers"]),
    "final_norm": p["final_norm"],
    "codec_head": quant_ops.quantize_head(p["codec_head"])})(talker_params)
predictor_params = jax.jit(lambda p: {
    "layers": quant_ops.quantize_decoder_layers(p["layers"]),
    "final_norm": p["final_norm"],
    "lm_head": quant_ops.quantize_head(p["lm_head"])})(predictor_params)
assets = Assets.random_init(k3, text_rows=4096, codec_rows=4096, dtype=jnp.bfloat16)
pack = assets.pack()
dec_params = jax.jit(functools.partial(codec_decoder.init_decoder_params, cfg.codec_decoder))(k4)
generator = gen.Generator(cfg, talker_params, predictor_params, pack, codec_params=dec_params)
sampler = gen.SamplerParams(temperature=jnp.float32(0.7), top_k=jnp.int32(40), top_p=jnp.float32(0.9))
spf = cfg.codec_decoder.samples_per_frame
audio_batch_s = SFRAMES * spf / P.SAMPLE_RATE


def run_batch(b: int):
    embeds_b = jax.random.normal(k5, (b, PROMPT_CAP, cfg.talker.d_model), jnp.float32) * 0.02
    lengths_b = jnp.full((b,), PROMPT_CAP, jnp.int32)
    t0 = time.perf_counter()
    dec_state = codec_decoder.init_decoder_state(cfg.codec_decoder, dec_params, batch=b)
    state, dec_state, codes, valid, wav = generator.start_first_chunk(
        embeds_b, lengths_b, jax.random.PRNGKey(9), dec_state, sampler,
        prompt_cap=PROMPT_CAP, n_frames=1)
    hard_sync(wav)
    ttft_b = time.perf_counter() - t0
    state, dec_state, codes, valid, wav, _, _ = generator.run_bulk(
        state, dec_state, sampler, prompt_cap=PROMPT_CAP, max_frames=SFRAMES - 1)
    hard_sync(wav)
    return time.perf_counter() - t0, ttft_b


for b in [int(a) for a in sys.argv[1:]] or [8]:
    t0 = time.perf_counter()
    run_batch(b)
    compile_s = time.perf_counter() - t0
    reps = [run_batch(b) for _ in range(3)]
    print(json.dumps({
        "b": b,
        "rtf_per_stream": round(min(r[0] for r in reps) / audio_batch_s, 4),
        "ttft_ms": round(min(r[1] for r in reps) * 1000, 1),
        "first_call_s": round(compile_s, 1)}), flush=True)
