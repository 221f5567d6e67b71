"""Chained predictor-frame timing: 64 fused predictor frames in one
jitted scan (dispatch-immune).  QTTS_PRED_ABLATE={nolayers,nohead,noemb,min}
selects the structural ablation variants (DESIGN §11 attribution).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_predictor_scan.py
"""
import os, time, functools
os.environ.setdefault("QTTS_DEBUG_PROBES", "1")  # this IS a probe script
import jax, jax.numpy as jnp
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import predictor as predictor_lib
from qwen3_tts_tpu.kernels.predictor_frame import predict_frame_fused, supported
from qwen3_tts_tpu.utils.sync import hard_sync

cfg = EngineConfig()
pcfg = cfg.predictor
params = predictor_lib.init_predictor_params(pcfg, jax.random.PRNGKey(0))
from qwen3_tts_tpu.ops import quant as Q
params = {"layers": Q.quantize_decoder_layers(params["layers"]),
          "final_norm": params["final_norm"],
          "lm_head": Q.quantize_head(params["lm_head"])}
b = 1
tables = jax.random.normal(jax.random.PRNGKey(1), (16, pcfg.codebook_size, pcfg.d_model), jnp.float32) * 0.3
h = jax.random.normal(jax.random.PRNGKey(2), (b, pcfg.d_model), jnp.float32) * 0.3
print("supported:", supported(pcfg, b))

@jax.jit
def scan64(params, h, tables):
    def body(c, _):
        code0 = c
        codes = predict_frame_fused(pcfg, params, h, code0, tables)
        return codes[:, 1] % 2048, codes[:, 0]
    c, ys = jax.lax.scan(body, jnp.zeros((b,), jnp.int32), None, length=64)
    return ys

y = scan64(params, h, tables); hard_sync(y)
ts = []
for _ in range(4):
    t0 = time.perf_counter(); y = scan64(params, h, tables); hard_sync(y)
    ts.append(time.perf_counter() - t0)
print(f"predictor scan64: min {min(ts)*1e3:.1f} ms = {min(ts)/64*1e3:.2f} ms/frame", flush=True)
