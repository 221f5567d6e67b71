"""Ablation tool: where does the talker step time go vs the weight-stream floor?

Runs N dependent talker decode steps inside ONE jit (axon per-dispatch
latency makes per-call timing useless) for several ablations:
  full      — the real decoder_forward step (flash decode on)
  noattn    — same weights/matmuls, attention replaced by identity
  mmonly    — bare int8 matvec chain over the same weight bytes
"""
import functools, os, time, sys
import jax, jax.numpy as jnp

from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import talker as tl
from qwen3_tts_tpu.models import transformer as tf
from qwen3_tts_tpu.ops import quant as qo
from qwen3_tts_tpu.models.talker import talker_decode_step

from qwen3_tts_tpu.engine import _enable_compilation_cache
_enable_compilation_cache()

cfg = EngineConfig().talker
import sys
N = int(os.environ.get("QTTS_ABLATE_N", "64"))
WHICH = sys.argv[1] if len(sys.argv) > 1 else 'all'
key = jax.random.PRNGKey(0)
params = jax.jit(functools.partial(tl.init_talker_params, cfg))(key)
params = jax.jit(lambda p: {
    "layers": qo.quantize_decoder_layers(p["layers"]),
    "final_norm": p["final_norm"],
    "codec_head": qo.quantize_head(p["codec_head"])})(params)

B, CAP, PC = 1, int(os.environ.get("QTTS_ABLATE_CAP", "1024")), 128
cache = tf.init_kv_cache(cfg, B, CAP, jnp.bfloat16)
cache = cache.replace(write_idx=jnp.full((B,), PC, jnp.int32),
                      lengths=jnp.full((B,), PC, jnp.int32))
x0 = jnp.ones((B, 1, cfg.d_model), jnp.bfloat16) * 0.01

def timeit(f, *args, reps=3):
    r = f(*args); _ = jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum().item()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        _ = jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum().item()
        ts.append(time.perf_counter() - t0)
    return min(ts)

base = timeit(jax.jit(lambda a: a + 1), jnp.zeros((8, 128), jnp.float32))
print(f"fixed: {base*1e3:.2f} ms")

# ---- full talker step xN (dependent chain)
@jax.jit
def full_steps(x, cache):
    def body(carry, i):
        x, cache = carry
        pos = cache.write_idx
        logits, hidden, cache = talker_decode_step(cfg, params, x[:, 0], pos,
                                                   cache, PC)
        x = (x + logits[:, :1, None] * 1e-6).astype(x.dtype)
        return (x, cache), None
    (x, cache), _ = jax.lax.scan(body, (x, cache), jnp.arange(N))
    return x

if WHICH in ('all', 'full'):
    t = timeit(full_steps, x0, cache)
    print(f"full talker step: {(t-base)/N*1e3:.3f} ms/step", flush=True)

# ---- fused talker-step megakernel (kernels/talker_step.py)
if WHICH in ('all', 'kernel'):
    from qwen3_tts_tpu.kernels.talker_step import talker_step_fused
    from qwen3_tts_tpu.ops.norms import rms_norm

    @jax.jit
    def kernel_steps(x, k, v):
        lengths = jnp.full((B,), PC, jnp.int32)
        from qwen3_tts_tpu.models.talker import _rope_tables
        def body(carry, t):
            x, k, v = carry
            p = jnp.full((B, 1), PC + t, jnp.int32)
            pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
            cos, sin = _rope_tables(cfg, pos4)
            h1, k, v = talker_step_fused(
                cfg, params, x[:, 0].astype(jnp.bfloat16), cos[:, 0],
                sin[:, 0], k, v, lengths, PC + t, PC)
            h = rms_norm(h1, params["final_norm"], cfg.rms_eps)
            x = (x + h[:, None, :] * 1e-6).astype(x.dtype)
            return (x, k, v), None
        (x, k, v), _ = jax.lax.scan(body, (x, k, v), jnp.arange(N))
        return x

    t = timeit(kernel_steps, x0, cache.k, cache.v)
    print(f"kernel step:      {(t-base)/N*1e3:.3f} ms/step", flush=True)

# ---- no attention (identity) — same matmuls/weight bytes
def decoder_noattn(x, cache):
    b, s, d = x.shape
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    def layer_fn(xx, layer):
        p = layer
        from qwen3_tts_tpu.ops.norms import rms_norm
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        qkv = qo.matmul(hn, p["wqkv"])
        attn = qkv[..., : h * dh]
        xx = xx + qo.matmul(attn, p["wo"])
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        gu = qo.matmul(hn, p["w_gate_up"])
        fh = gu.shape[-1] // 2
        ff = jax.nn.silu(gu[..., :fh]) * gu[..., fh:]
        xx = xx + qo.matmul(ff, p["w_down"])
        return xx, None
    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x

@jax.jit
def noattn_steps(x):
    def body(x, i):
        h = decoder_noattn(x, None)
        logits = qo.head_matmul(h[:, 0], params["codec_head"])
        x = (x + logits[:, :1, None] * 1e-6).astype(x.dtype)
        return x, None
    x, _ = jax.lax.scan(body, x, jnp.arange(N))
    return x

if WHICH in ('all', 'noattn'):
    t = timeit(noattn_steps, x0)
    print(f"noattn step:      {(t-base)/N*1e3:.3f} ms/step", flush=True)

# ---- bare matvec chain over same weight arrays
lw = params["layers"]
@jax.jit
def mmonly_steps(x):
    v = x[:, 0]
    def body(v, i):
        def layer(v, p):
            a = qo.matmul(v, p["wqkv"])
            v = qo.matmul(a[..., :cfg.n_heads*cfg.head_dim], p["wo"])
            g = qo.matmul(v, p["w_gate_up"])
            v = qo.matmul(g[..., :cfg.d_ff], p["w_down"])
            return v.astype(jnp.bfloat16), None
        v, _ = jax.lax.scan(layer, v, lw)
        return v, None
    v, _ = jax.lax.scan(body, v, jnp.arange(N))
    return v

if WHICH in ('all', 'mmonly'):
    t = timeit(mmonly_steps, x0)
    print(f"mmonly step:      {(t-base)/N*1e3:.3f} ms/step", flush=True)
