"""Decompose prefill overhead vs the pure-matmul chain lower bound.

bench_prefill_matmul measured the talker's 28-layer matmul chain at
206 TFLOP/s (a8w8, M=12288), i.e. 70.3 ms at b=32 / 105 ms at b=48 —
but the real prefill measures 87/135 ms (+24-29%).  This probe times
gen.prefill with individual components stubbed out (monkeypatched
before trace) to attribute the gap:

  full        the shipped program
  no_attn     gqa_attend -> zeros (drops QK/softmax/PV + mask)
  no_rope     apply_rope -> identity
  no_kvwrite  cache append skipped (attention sees raw cache)
  no_head     codec-head logits -> zeros slice

Each variant is a separate process-wide monkeypatch + fresh jit, timed
with the dependent-chain rule (hard_sync barrier, min over reps).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_prefill_decomp.py [b]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.models import transformer
from qwen3_tts_tpu.ops import quant as quant_ops
from qwen3_tts_tpu.runtime import generate as gen
from qwen3_tts_tpu.utils.sync import hard_sync

import os
os.environ["QTTS_CARRY_KV"] = "0"  # xs/ys path so every patch point applies
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PCAP = 128
cfg = EngineConfig()
k1, k5 = jax.random.split(jax.random.PRNGKey(0))
tp = jax.jit(functools.partial(talker_lib.init_talker_params, cfg.talker))(k1)
tp = jax.jit(lambda p: {
    "layers": quant_ops.quantize_decoder_layers(p["layers"]),
    "final_norm": p["final_norm"],
    "codec_head": quant_ops.quantize_head(p["codec_head"])})(tp)
embeds = jax.random.normal(k5, (B, PCAP, cfg.talker.d_model),
                           jnp.float32) * 0.02
lengths = jnp.full((B,), PCAP, jnp.int32)

_orig_attend = transformer.gqa_attend
_orig_rope = transformer._rope
_orig_logits = talker_lib._codec_logits


def _restore():
    transformer.gqa_attend = _orig_attend
    transformer._rope = _orig_rope
    talker_lib._codec_logits = _orig_logits


def timeit():
    f = jax.jit(lambda tp, e, l, k: gen.prefill(cfg, tp, e, l, k))
    st = f(tp, embeds, lengths, jax.random.PRNGKey(0))
    hard_sync(st.logits)
    ts = []
    for i in range(6):
        st = None
        t0 = time.perf_counter()
        st = f(tp, embeds, lengths, jax.random.PRNGKey(i))
        hard_sync(st.logits)
        ts.append(time.perf_counter() - t0)
    return min(ts)


results = {}
results["full"] = timeit()

transformer.gqa_attend = lambda q, k, v, mask: jnp.zeros(
    (q.shape[0], q.shape[1], q.shape[2], v.shape[-1]), q.dtype)
results["no_attn"] = timeit()
_restore()

transformer._rope = lambda x, cos, sin: x
results["no_rope"] = timeit()
_restore()

import qwen3_tts_tpu.ops.attention as attn_ops
_orig_update = transformer.update_cache
transformer.update_cache = lambda cache, new, start: cache
results["no_kvwrite"] = timeit()
transformer.update_cache = _orig_update
_restore()

talker_lib._codec_logits = lambda params, hidden: hidden[:, :16] * 0.0
results["no_head"] = timeit()
_restore()

base = results["full"]
print(f"b={B} prefill decomposition (ms, min of 6):")
for k, t in results.items():
    delta = "" if k == "full" else f"  (saves {1e3*(base-t):+.1f})"
    print(f"  {k:10s} {t*1e3:7.1f}{delta}", flush=True)
