"""Pallas flash-attention kernel for multi-token (prefill) GQA.

The XLA prefill attention (ops.attention.gqa_attend) materializes the
fp32 score tensor [B, Hkv, G, S, W] in HBM and runs softmax over it in
separate passes — measured at b=32/bucket-128 that is 16 ms of the
90 ms prefill, i.e. most of the gap to the 70 ms pure-matmul chain
bound (scripts/bench_prefill_decomp.py).  This kernel computes
attention flash-style per (batch, kv-head, 128-row query tile): K/V
stream chunk-by-chunk from the STACKED [L, B, Hkv, C, Dh] cache in HBM
(double-buffered DMA, same pattern as flash_decode._kernel_stacked),
scores live only in VMEM, softmax runs online (running max/sum), and
causally-dead chunks are skipped outright (the trip count tracks
`start + (t+1)*QTILE`, halving attention work for fresh prefill).

Covers the whole reference prefill semantics (prompt.rs section layout
-> ops.attention.history_mask): slot c is visible to the query at
absolute slot a iff c <= a and (c < length or c >= prompt_cap or
c == a).  Numerics: bf16 QK / PV dots with fp32 accumulation and fp32
online softmax — the same class as the fused talker/predictor decode
kernels; parity with the XLA path is tested in interpret mode
(tests/test_flash_prefill.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
QTILE = 128          # query rows (sequence positions) per grid step


def use_flash_prefill() -> bool:
    if os.environ.get("QTTS_FLASH_PREFILL", "1") == "0":
        return False
    from .flash_decode import use_flash_decode
    return use_flash_decode()


def _kchunk(window: int) -> int:
    return min(512, window)


def supported(s: int, window: int, h: int, hkv: int, dh: int) -> bool:
    """Static-shape gate; callers fall back to the XLA path otherwise."""
    if h % hkv != 0 or dh % 128 != 0:
        return False
    if s % QTILE != 0 or window <= 0:
        return False
    kc = _kchunk(window)
    return window % kc == 0


def _kernel(lengths_ref, start_ref, layer_ref, q_ref, k_hbm, v_hbm,
            o_ref, k_scratch, v_scratch, sem_k, sem_v, *,
            prompt_cap: int, window: int, kchunk: int, scale: float,
            g: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)
    rows, dh = q_ref.shape[2], q_ref.shape[3]   # rows = QTILE * G
    layer = layer_ref[0]
    length = lengths_ref[b]
    start = start_ref[b]

    # Rows r of this tile are query positions start + t*QTILE + r//G.
    r_off = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g
    q_abs = start + t * QTILE + r_off                       # [rows, 1]
    # Last chunk that can contain a visible slot: c <= q_abs_max.
    valid_end = jnp.minimum(start + (t + 1) * QTILE, window)
    n_chunks = pl.cdiv(valid_end, kchunk)

    q = q_ref[0, 0]                                          # [rows, Dh]

    def get_dma(slot, chunk_idx, sref, hbm, sem):
        return pltpu.make_async_copy(
            hbm.at[layer, b, h, pl.ds(chunk_idx * kchunk, kchunk), :],
            sref.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0, k_scratch, k_hbm, sem_k).start()
    get_dma(0, 0, v_scratch, v_hbm, sem_v).start()

    def body(ci, carry):
        m, l, acc = carry
        slot = jax.lax.rem(ci, 2)
        next_slot = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(next_slot, ci + 1, k_scratch, k_hbm, sem_k).start()
            get_dma(next_slot, ci + 1, v_scratch, v_hbm, sem_v).start()

        get_dma(slot, ci, k_scratch, k_hbm, sem_k).wait()
        get_dma(slot, ci, v_scratch, v_hbm, sem_v).wait()

        k = k_scratch[slot]                                  # [kchunk, Dh]
        v = v_scratch[slot]

        c_idx = ci * kchunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, kchunk), 1)                       # [1, kchunk]
        visible = ((c_idx < length) | (c_idx >= prompt_cap)
                   | (c_idx == q_abs))
        valid = (c_idx <= q_abs) & visible                   # [rows, kchunk]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [rows, kchunk]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        # Guard the all-masked-while-m==NEG_INF case: there exp(s - m_new)
        # = exp(0) = 1 for every masked slot and garbage V accumulates.
        # Reachable only for length==0 lanes today, but cheap to kill.
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)        # [rows, kchunk]
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [rows, Dh]
        return m_new, l_new, acc_new

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_gqa_prefill_stacked(q: jnp.ndarray, k_all: jnp.ndarray,
                              v_all: jnp.ndarray, lengths: jnp.ndarray,
                              start, layer, prompt_cap: int, window: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Prefill GQA attention against layer `layer` of a stacked cache.

    q: [B, S, H, Dh] (roped, qk-normed); k_all/v_all: [L, B, Hkv, C, Dh]
    with the S new rows already written; lengths: [B] true prompt
    lengths; start: scalar or [B] absolute slot of query row 0; window:
    static visible-slot bound (ops only read slots [0, window)).
    Returns [B, S, H, Dh] in q.dtype.  Gate with `supported()` first.
    """
    b, s, hq, dh = q.shape
    hkv, cap = k_all.shape[2], k_all.shape[3]
    g = hq // hkv
    kc = _kchunk(window)
    if not supported(s, window, hq, hkv, dh) or window > cap:
        raise ValueError(f"unsupported flash-prefill shape: s={s} "
                         f"window={window} h={hq} hkv={hkv} dh={dh}")
    start = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (b,))
    rows = QTILE * g

    # [B, S, H, Dh] -> [B, Hkv, S*G, Dh]: rows are s-major, g-minor so a
    # QTILE*G block is one contiguous 128-position query tile.
    qt = q.reshape(b, s, hkv, g, dh).transpose(0, 2, 1, 3, 4)
    qt = qt.reshape(b, hkv, s * g, dh)

    grid = (b, hkv, s // QTILE)
    out = pl.pallas_call(
        functools.partial(_kernel, prompt_cap=prompt_cap, window=window,
                          kchunk=kc, scale=dh ** -0.5, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, rows, dh),
                             lambda i, j, t, *_: (i, j, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, rows, dh),
                                   lambda i, j, t, *_: (i, j, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kc, dh), k_all.dtype),
                pltpu.VMEM((2, kc, dh), v_all.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, s * g, dh), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), start,
      jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
      qt, k_all, v_all)

    out = out.reshape(b, hkv, s, g, dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, s, hq, dh)
