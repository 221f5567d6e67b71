"""Prefill-only A/B: a8w8 vs deq-bf16 at several batch sizes, same process
(QTTS_A8_PREFILL toggles per-call via distinct jitted partials)."""
import functools, os, time
import numpy as np, jax, jax.numpy as jnp
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import talker as talker_lib
from qwen3_tts_tpu.ops import quant as quant_ops
from qwen3_tts_tpu.runtime import generate as gen
from qwen3_tts_tpu.utils.sync import hard_sync

cfg = EngineConfig()
PCAP = 128
k1, k5 = jax.random.split(jax.random.PRNGKey(0))
tp = jax.jit(functools.partial(talker_lib.init_talker_params, cfg.talker))(k1)
tp = jax.jit(lambda p: {"layers": quant_ops.quantize_decoder_layers(p["layers"]),
                        "final_norm": p["final_norm"],
                        "codec_head": quant_ops.quantize_head(p["codec_head"])})(tp)

def make(mode):
    os.environ["QTTS_A8_PREFILL"] = mode
    @jax.jit
    def f(tp, embeds, lengths, key):
        return gen.prefill(cfg, tp, embeds, lengths, key)
    return f

for b in (1, 8, 32, 48, 96):
    embeds = jax.random.normal(k5, (b, PCAP, cfg.talker.d_model), jnp.float32) * 0.02
    lengths = jnp.full((b,), PCAP, jnp.int32)
    row = [f"b={b}:"]
    st = None
    for mode, name in (("0", "deq"), ("1", "a8")):
        f = make(mode)
        st = f(tp, embeds, lengths, jax.random.PRNGKey(0)); hard_sync(st.logits)
        ts = []
        for i in range(8):
            t0 = time.perf_counter()
            st = f(tp, embeds, lengths, jax.random.PRNGKey(i))
            hard_sync(st.logits)
            ts.append(time.perf_counter() - t0)
        row.append(f"{name} min {min(ts)*1e3:.1f} med {sorted(ts)[len(ts)//2]*1e3:.1f} ms")
    print("  ".join(row), flush=True)
