"""Prefill matmul throughput probe: where is the a8w8 ceiling?

The batched-TTFT target beyond 32 streams is prefill-matmul-bound
(TTFT@96 ~384 ms of which ~330 ms is the talker prefill at the measured
104.6 TFLOP/s a8w8 rate).  v5e int8 MXU peak is ~394 TOPS, so if the
s8xs8->s32 dot actually maps to the double-rate path there should be
~3x headroom over the shipped rate.

Measurement rule (ROADMAP r2 note): the axon tunnel has 1.5-28 ms
per-dispatch latency, so EVERYTHING must be timed as one jitted program
with an internal dependent chain.  Each variant runs the talker's full
28-layer matmul sequence (qkv -> o -> gate_up -> mul -> down, residual
feedback) via lax.scan over stacked layer weights — the same shape
stream the real prefill issues, minus attention/norms:

  A  bf16 x bf16                   (non-int8 ceiling at these shapes)
  C  a8w8 as shipped               (dynamic per-row amax quantize)
  S  a8w8, static activation scale (isolates the amax-reduce cost)
  D  s8 chain, shift-requantize    (pure s8xs8->s32 dot rate; activations
                                    stay int8 end-to-end, >>4 feedback)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_prefill_matmul.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.utils.sync import hard_sync

L = 28
D_MODEL, D_QKV, D_FF2, D_FF = 2048, 4096, 12288, 6144
MS = [4096, 12288]                # 32 / 96 lanes x 128 prompt rows
FLOPS_PER_ROW_LAYER = 2.0 * (D_MODEL * D_QKV + D_MODEL * D_MODEL
                             + D_MODEL * D_FF2 + D_FF * D_MODEL)

key = jax.random.PRNGKey(0)
kw1, kw2, kw3, kw4 = jax.random.split(key, 4)
W1 = jax.random.normal(kw1, (L, D_MODEL, D_QKV), jnp.float32) * 0.02
W2 = jax.random.normal(kw2, (L, D_MODEL, D_MODEL), jnp.float32) * 0.02
W3 = jax.random.normal(kw3, (L, D_MODEL, D_FF2), jnp.float32) * 0.02
W4 = jax.random.normal(kw4, (L, D_FF, D_MODEL), jnp.float32) * 0.02


def _stack16(*ws):
    return [w.astype(jnp.bfloat16) for w in ws]


def _stack8(*ws):
    out = []
    for w in ws:
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
        out.append((jnp.round(w / s).astype(jnp.int8), s.astype(jnp.float32)))
    return out


def dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


@jax.jit
def chain_bf16(x, ws):
    def layer(x, w):
        w1, w2, w3, w4 = w
        qkv = x @ w1
        o = qkv[:, :D_MODEL] @ w2
        g = o @ w3
        d = (g[:, :D_FF] * g[:, D_FF:]) @ w4
        return (x + 0.01 * d).astype(jnp.bfloat16), ()
    x, _ = jax.lax.scan(layer, x, ws)
    return x


def _q_dyn(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8), sx


def _mk_a8(static_scale):
    def q(x):
        if static_scale:
            return (jnp.clip(jnp.round(x.astype(jnp.float32) * 32.0),
                             -127, 127).astype(jnp.int8),
                    jnp.float32(1 / 32.0))
        return _q_dyn(x)

    @jax.jit
    def chain(x, ws):
        def mm(x, wq):
            w, s = wq
            xq, sx = q(x)
            y = dot(xq, w)
            return (y.astype(jnp.float32) * sx * s.reshape(1, -1)
                    if not static_scale else
                    y.astype(jnp.float32) * sx * s.reshape(1, -1))

        def layer(x, w):
            w1, w2, w3, w4 = w
            qkv = mm(x, w1)
            o = mm(qkv[:, :D_MODEL].astype(jnp.bfloat16), w2)
            g = mm(o.astype(jnp.bfloat16), w3)
            d = mm((g[:, :D_FF] * g[:, D_FF:]).astype(jnp.bfloat16), w4)
            return (x + 0.01 * d).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(layer, x, ws)
        return x
    return chain


@jax.jit
def chain_s8(xq, ws):
    """Pure s8 dot rate: int8 activations end-to-end, s32 -> s8 feedback
    via arithmetic shift (no scales, no amax — NOT numerically useful,
    isolates the MXU int8 path)."""
    def requant(y):
        return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)

    def layer(xq, w):
        w1, w2, w3, w4 = w
        qkv = requant(dot(xq, w1[0]))
        o = requant(dot(qkv[:, :D_MODEL], w2[0]))
        g = dot(o, w3[0])
        d = requant(dot(requant(g[:, :D_FF] + g[:, D_FF:]), w4[0]))
        return jnp.clip(xq + (d >> 2), -127, 127).astype(jnp.int8), ()
    xq, _ = jax.lax.scan(layer, xq, ws)
    return xq


def timeit(f, *args, reps=4):
    out = f(*args)
    hard_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


ws16 = tuple(_stack16(W1, W2, W3, W4))
ws8 = tuple(_stack8(W1, W2, W3, W4))

for M in MS:
    kx = jax.random.fold_in(key, M)
    x = (jax.random.normal(kx, (M, D_MODEL), jnp.float32) * 0.5
         ).astype(jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127, 127
                  ).astype(jnp.int8)
    flops = FLOPS_PER_ROW_LAYER * M * L
    res = {
        "A_bf16": timeit(chain_bf16, x, ws16),
        "C_a8w8_dyn": timeit(_mk_a8(False), x, ws8),
        "S_a8w8_static": timeit(_mk_a8(True), x, ws8),
        "D_s8_pure": timeit(chain_s8, xq, ws8),
    }
    row = "  ".join(f"{k} {t*1e3:7.1f}ms={flops/t/1e12:6.1f}T"
                    for k, t in res.items())
    print(f"M={M:6d} (28L):  {row}", flush=True)
