"""Prefill matmul throughput probe: where is the a8w8 ceiling?

The batched-TTFT target beyond 32 streams is prefill-matmul-bound
(TTFT@96 ~384 ms of which ~330 ms is the talker prefill at the measured
104.6 TFLOP/s a8w8 rate).  v5e int8 MXU peak is ~394 TOPS, so if the
s8xs8->s32 dot is actually mapped to the double-rate path there should be
~3x headroom.  This probe times each candidate schedule at real prefill
shapes (M = lanes * 128 prompt rows; layer matmuls of the talker config):

  A  bf16 x bf16                      (upper bound for the non-int8 path)
  B  deq: int8 weight -> bf16 in-dot  (the QTTS_A8_PREFILL=0 path)
  C  a8w8 as shipped (quantize act + s8xs8->s32 + two scales)
  D  s8xs8->s32 dot alone (pre-quantized acts; isolates the dot rate)
  E  s8xs8 dot with bf16 output cast only (no scales)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_prefill_matmul.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.ops import quant as quant_ops
from qwen3_tts_tpu.utils.sync import hard_sync

# talker layer matmuls: (K, N) pairs and a label
SHAPES = [
    ("qkv", 2048, 4096),
    ("o", 2048, 2048),
    ("gate_up", 2048, 12288),
    ("down", 6144, 2048),
]
MS = [4096, 6144, 12288]          # 32 / 48 / 96 lanes x 128 rows

key = jax.random.PRNGKey(0)


def timeit(f, *args, reps=6):
    out = f(*args)
    hard_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


for M in MS:
    for name, K, N in SHAPES:
        kw, kx = jax.random.split(jax.random.fold_in(key, M * N + K))
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        x = jax.random.normal(kx, (M, K), jnp.float32) * 0.5
        wq = jax.jit(quant_ops.quantize_weight)(w)
        w16 = w.astype(jnp.bfloat16)
        x16 = x.astype(jnp.bfloat16)
        xq = jax.jit(lambda x: jnp.clip(jnp.round(x * 4), -127, 127)
                     .astype(jnp.int8))(x)
        flops = 2.0 * M * K * N

        A = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
        B = jax.jit(lambda a, wq: quant_ops.matmul(a, wq))
        C = jax.jit(lambda a, wq: quant_ops.matmul_a8(a, wq))

        def _D(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        D = jax.jit(_D)
        E = jax.jit(lambda a, b: _D(a, b).astype(jnp.bfloat16))

        res = {
            "A_bf16": timeit(A, x16, w16),
            "B_deq": timeit(B, x16, wq),
            "C_a8w8": timeit(C, x16, wq),
            "D_s8dot": timeit(D, xq, wq["q"]),
            "E_s8cast": timeit(E, xq, wq["q"]),
        }
        row = "  ".join(f"{k} {flops/t/1e12:7.1f}T" for k, t in res.items())
        print(f"M={M:6d} {name:8s} K={K} N={N}:  {row}", flush=True)
