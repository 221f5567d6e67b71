"""Pallas flash-decode kernel for single-token GQA attention.

Replaces the XLA attention path for decode steps (S=1).  The decisive
advantage over the XLA program is *dynamic-length cache reads*: the KV cache
has a static capacity C (prompt bucket + max_steps), but at step t only
`write_idx + 1` slots are live.  XLA must stream all C slots from HBM every
step; this kernel's inner loop has a data-dependent trip count
(cdiv(write_idx + 1, CHUNK)), so HBM traffic tracks the true sequence length
— early in generation that is a >10x bandwidth cut on the dominant memory
stream, directly improving TTFT and per-frame latency.

Mechanics: grid over (batch, kv_head); K/V stay in HBM/ANY and are DMA'd
chunk-by-chunk into double-buffered VMEM scratch, overlapping copy with
compute (pallas_guide: double-buffering pattern); softmax runs online
(flash-style running max/sum) in f32; per-slot validity reproduces
ops.attention.history_mask (prompt slots < length, generated slots
prompt_cap..write_idx, all <= write_idx).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
CHUNK = 512  # cache slots per DMA


def _kernel(lengths_ref, start_ref, q_ref, k_hbm, v_hbm,
            o_ref, k_scratch, v_scratch, sem_k, sem_v, *, prompt_cap: int,
            capacity: int, scale: float):
    b = pl.program_id(0)
    h = pl.program_id(1)
    g, dh = q_ref.shape[2], q_ref.shape[3]

    length = lengths_ref[b]
    start = start_ref[b]  # per-lane cursor (continuous batching)
    valid_end = start + 1                      # slots [0, start] are visible
    n_chunks = pl.cdiv(valid_end, CHUNK)

    q = q_ref[0, 0].astype(jnp.float32) * scale     # [G, Dh]

    def get_dma(slot, chunk_idx, sref, hbm, sem):
        return pltpu.make_async_copy(
            hbm.at[b, h, pl.ds(chunk_idx * CHUNK, CHUNK), :],
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

        k = k_scratch[slot].astype(jnp.float32)       # [CHUNK, Dh]
        v = v_scratch[slot].astype(jnp.float32)

        c_idx = ci * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1)                 # [1, CHUNK]
        valid = (c_idx < length) | ((c_idx >= prompt_cap) & (c_idx <= start))
        valid = valid & (c_idx < capacity)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, CHUNK]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                         # [G, CHUNK]
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, Dh]
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _kernel_stacked(lengths_ref, start_ref, layer_ref, q_ref, k_hbm, v_hbm,
                    o_ref, k_scratch, v_scratch, sem_k, sem_v,
                    *, prompt_cap: int, capacity: int, scale: float):
    """Same as _kernel but reads layer `layer_ref[0]` of a stacked
    [L, B, Hkv, C, Dh] cache, so the caller never materializes a per-layer
    slice (one full-capacity copy per layer per step in the XLA path)."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    g, dh = q_ref.shape[2], q_ref.shape[3]
    layer = layer_ref[0]

    length = lengths_ref[b]
    start = start_ref[b]
    valid_end = start + 1
    n_chunks = pl.cdiv(valid_end, CHUNK)

    q = q_ref[0, 0].astype(jnp.float32) * scale     # [G, Dh]

    def get_dma(slot, chunk_idx, sref, hbm, sem):
        return pltpu.make_async_copy(
            hbm.at[layer, b, h, pl.ds(chunk_idx * CHUNK, CHUNK), :],
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

        k = k_scratch[slot].astype(jnp.float32)       # [CHUNK, Dh]
        v = v_scratch[slot].astype(jnp.float32)

        c_idx = ci * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1)                 # [1, CHUNK]
        valid = (c_idx < length) | ((c_idx >= prompt_cap) & (c_idx <= start))
        valid = valid & (c_idx < capacity)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, CHUNK]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, Dh]
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_gqa_decode_stacked(q: jnp.ndarray, k_all: jnp.ndarray,
                             v_all: jnp.ndarray, lengths: jnp.ndarray,
                             write_idx: jnp.ndarray, layer: jnp.ndarray,
                             prompt_cap: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Single-token GQA decode attention against a STACKED cache.

    q: [B, H, Dh]; k_all/v_all: [L, B, Hkv, C, Dh] (C must be a CHUNK
    multiple — runtime.generate's capacity formula guarantees it);
    layer: scalar int32 layer index; write_idx: [B] or scalar slot of the
    current token (already written).  Returns [B, H, Dh].  Designed for the
    carry-KV decode loop (models/transformer._decode_step_carry): the cache
    never leaves HBM and never gets sliced per layer by XLA.
    """
    b, hq, dh = q.shape
    write_idx = jnp.broadcast_to(jnp.asarray(write_idx, jnp.int32), (b,))
    hkv, cap = k_all.shape[2], k_all.shape[3]
    if cap % CHUNK != 0:
        raise ValueError(f"stacked flash decode needs capacity % {CHUNK} "
                         f"== 0, got {cap}")
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dh)

    grid = (b, hkv)
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, prompt_cap=prompt_cap,
                          capacity=cap, scale=dh ** -0.5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g, dh), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g, dh),
                                   lambda i, j, *_: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, dh), k_all.dtype),
                pltpu.VMEM((2, CHUNK, dh), v_all.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, dh), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), write_idx,
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      q4, k_all, v_all)
    return out.reshape(b, hq, dh)


def _kernel_stacked_append(lengths_ref, start_ref, layer_ref, q_ref,
                           kn_ref, vn_ref, k_hbm, v_hbm,
                           o_ref, k_out, v_out,
                           k_scratch, v_scratch, ktmp, vtmp,
                           sem_k, sem_v, sem_w,
                           *, prompt_cap: int, capacity: int, scale: float):
    """_kernel_stacked + IN-KERNEL cache append at per-lane cursors.

    The XLA form of a per-lane append (`.at[l, lanes, :, cursors, :]`,
    or an equivalent lax.scatter) defeats in-place buffer reuse inside the
    decode loop: measured b=32 bulk decode went 17.8 -> 346 ms/frame the
    moment cursors became per-lane (the reason round 3 concluded continuous
    batching was "host-dispatch-bound").  Here the new token's k/v rows are
    DMA'd straight into the ALIASED cache buffer at (layer, b, h, start[b])
    — the cache never leaves HBM and never gets copied.  The written slot
    is excluded from the prefix reads (c < start) and the current token
    joins the online softmax in-register, so there is no read-after-write
    hazard to order around.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    g, dh = q_ref.shape[2], q_ref.shape[3]
    layer = layer_ref[0]

    length = lengths_ref[b]
    start = start_ref[b]
    n_chunks = pl.cdiv(start, CHUNK)

    # Append this (b, h)'s new row via read-modify-write of the ALIGNED
    # 2-slot window: bf16 sublane tiling forbids 1-row HBM DMA slices.
    # The window's rows below `start` are live and rewritten with the
    # identical bytes they already hold (a racing prefix read sees the same
    # data either way); rows above `start` are dead until later appends
    # overwrite them.
    aligned = (start // 8) * 8
    rem = start - aligned
    rk = pltpu.make_async_copy(
        k_out.at[layer, b, h, pl.ds(aligned, 8), :], ktmp, sem_w.at[0])
    rv = pltpu.make_async_copy(
        v_out.at[layer, b, h, pl.ds(aligned, 8), :], vtmp, sem_w.at[1])
    rk.start()
    rv.start()

    q = q_ref[0, 0].astype(jnp.float32) * scale     # [G, Dh]

    def get_dma(slot, chunk_idx, sref, hbm, sem):
        return pltpu.make_async_copy(
            hbm.at[layer, b, h, pl.ds(chunk_idx * CHUNK, CHUNK), :],
            sref.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
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

        k = k_scratch[slot].astype(jnp.float32)       # [CHUNK, Dh]
        v = v_scratch[slot].astype(jnp.float32)

        c_idx = ci * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1)                 # [1, CHUNK]
        valid = (c_idx < length) | ((c_idx >= prompt_cap) & (c_idx < start))
        valid = valid & (c_idx < capacity)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, CHUNK]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, Dh]
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    # blend the new row into the aligned window and write it back
    rk.wait()
    rv.wait()
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, dh), 0)
    ktmp[...] = jnp.where(rowi == rem, kn_ref[0, 0], ktmp[...])
    vtmp[...] = jnp.where(rowi == rem, vn_ref[0, 0], vtmp[...])
    wk = pltpu.make_async_copy(
        ktmp, k_out.at[layer, b, h, pl.ds(aligned, 8), :], sem_w.at[0])
    wv = pltpu.make_async_copy(
        vtmp, v_out.at[layer, b, h, pl.ds(aligned, 8), :], sem_w.at[1])
    wk.start()
    wv.start()

    # current token (always self-visible), in-register
    kn = kn_ref[0, 0].astype(jnp.float32)             # [1, Dh]
    vn = vn_ref[0, 0].astype(jnp.float32)
    s_cur = jax.lax.dot_general(
        q, kn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [G, 1]
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    acc = acc * alpha + jax.lax.dot_general(
        p_cur, vn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    l = l * alpha + p_cur

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    wk.wait()
    wv.wait()


def flash_gqa_decode_append(q: jnp.ndarray, k_all: jnp.ndarray,
                            v_all: jnp.ndarray, k_new: jnp.ndarray,
                            v_new: jnp.ndarray, lengths: jnp.ndarray,
                            write_idx: jnp.ndarray, layer: jnp.ndarray,
                            prompt_cap: int, interpret: bool = False,
                            ) -> tuple:
    """Stacked-cache decode attention + per-lane-cursor append, in place.

    q: [B, H, Dh]; k_all/v_all: [L, B, Hkv, C, Dh] (donated — the returned
    caches alias them); k_new/v_new: [B, Hkv, Dh] the current token's
    rows (NOT yet written); write_idx: [B] per-lane slots to write.
    Returns (attn [B, H, Dh], k_all', v_all').
    """
    b, hq, dh = q.shape
    write_idx = jnp.broadcast_to(jnp.asarray(write_idx, jnp.int32), (b,))
    hkv, cap = k_all.shape[2], k_all.shape[3]
    if cap % CHUNK != 0:
        raise ValueError(f"stacked flash decode needs capacity % {CHUNK} "
                         f"== 0, got {cap}")
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dh)

    grid = (b, hkv)
    # [B, Hkv, 1, Dh] with unit slot axis: Mosaic needs the last two
    # block dims tiled 8/128-aligned or equal to the array dims
    newspec = pl.BlockSpec((1, 1, 1, dh), lambda i, j, *_: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_kernel_stacked_append, prompt_cap=prompt_cap,
                          capacity=cap, scale=dh ** -0.5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g, dh), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                newspec,
                newspec,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, g, dh), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, dh), k_all.dtype),
                pltpu.VMEM((2, CHUNK, dh), v_all.dtype),
                pltpu.VMEM((8, dh), k_all.dtype),
                pltpu.VMEM((8, dh), v_all.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g, dh), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        # flat operand indices INCLUDE the scalar-prefetch args:
        # lengths(0) start(1) layer(2) q4(3) k_new(4) v_new(5) k(6) v(7)
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(lengths.astype(jnp.int32), write_idx,
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      q4, k_new.astype(k_all.dtype)[:, :, None],
      v_new.astype(v_all.dtype)[:, :, None],
      k_all, v_all)
    return out.reshape(b, hq, dh), k_out, v_out


def _kernel_inject(lanes_ref, k_small, v_small, k_big_in, v_big_in,
                   k_out, v_out, sems, *, n_layers: int, n_slots: int):
    """Copy lane r's prefilled prompt KV rows [0, n_slots) into big-cache
    lane lanes[r], straight HBM->HBM, one grid step per refill lane."""
    r = pl.program_id(0)
    lane = lanes_ref[r]
    copies = []
    for l in range(n_layers):
        copies.append(pltpu.make_async_copy(
            k_small.at[l, r], k_out.at[l, lane, :, pl.ds(0, n_slots), :],
            sems.at[l, 0]))
        copies.append(pltpu.make_async_copy(
            v_small.at[l, r], v_out.at[l, lane, :, pl.ds(0, n_slots), :],
            sems.at[l, 1]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def inject_prompt_lanes(k_big: jnp.ndarray, v_big: jnp.ndarray,
                        k_small: jnp.ndarray, v_small: jnp.ndarray,
                        lanes: jnp.ndarray,
                        interpret: bool = False) -> tuple:
    """Scatter R freshly prefilled lanes' prompt KV into the big cache,
    IN PLACE (aliased outputs) — the XLA fallback
    (`cache.k.at[:, lanes].set(...)`) materializes full-cache copies, which
    made each batched-refill round cost ~1.4 s at b=32 (the same
    in-place-defeating scatter class fixed for decode appends by
    _kernel_stacked_append).

    k_small/v_small: [L, R, Hkv, S, Dh] compact prefill caches (capacity =
    prompt bucket S); lanes: [R] target lanes, duplicates allowed with
    identical data (grid steps serialize).  Returns (k_big', v_big').
    """
    L, r, hkv, s, dh = k_small.shape
    assert s % 8 == 0, s
    out_k, out_v = pl.pallas_call(
        functools.partial(_kernel_inject, n_layers=L, n_slots=s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[pltpu.SemaphoreType.DMA((L, 2))],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_big.shape, k_big.dtype),
            jax.ShapeDtypeStruct(v_big.shape, v_big.dtype),
        ],
        # flat operands: lanes(0) k_small(1) v_small(2) k_big(3) v_big(4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(lanes.astype(jnp.int32), k_small.astype(k_big.dtype),
      v_small.astype(v_big.dtype), k_big, v_big)
    return out_k, out_v


def _kernel_append_lanes(starts_ref, k_tok, v_tok, k_big_in, v_big_in,
                         k_out, v_out, ktmp, vtmp, sems,
                         *, n_layers: int):
    """Blend one new token row per (layer, lane) into the aliased cache at
    per-lane cursors via aligned-window read-modify-write (the 1-row HBM
    DMA that a direct store would need is forbidden by bf16 sublane
    tiling; see _kernel_stacked_append).  One grid step per lane; all
    layers' windows stream together ([L, Hkv, 8, Dh] ≈ 0.5 MB per cache
    for the production talker — VMEM-trivial)."""
    b = pl.program_id(0)
    start = starts_ref[b]
    aligned = (start // 8) * 8
    rem = start - aligned
    reads = []
    for l in range(n_layers):
        reads.append(pltpu.make_async_copy(
            k_out.at[l, b, :, pl.ds(aligned, 8), :], ktmp.at[l],
            sems.at[l, 0]))
        reads.append(pltpu.make_async_copy(
            v_out.at[l, b, :, pl.ds(aligned, 8), :], vtmp.at[l],
            sems.at[l, 1]))
    for c in reads:
        c.start()
    for c in reads:
        c.wait()
    L, hkv, _, dh = ktmp.shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, ktmp.shape, 2)
    ktmp[...] = jnp.where(rowi == rem,
                          k_tok[...].reshape(L, hkv, 1, dh), ktmp[...])
    vtmp[...] = jnp.where(rowi == rem,
                          v_tok[...].reshape(L, hkv, 1, dh), vtmp[...])
    writes = []
    for l in range(n_layers):
        writes.append(pltpu.make_async_copy(
            ktmp.at[l], k_out.at[l, b, :, pl.ds(aligned, 8), :],
            sems.at[l, 0]))
        writes.append(pltpu.make_async_copy(
            vtmp.at[l], v_out.at[l, b, :, pl.ds(aligned, 8), :],
            sems.at[l, 1]))
    for c in writes:
        c.start()
    for c in writes:
        c.wait()


def append_kv_lanes(k_big: jnp.ndarray, v_big: jnp.ndarray,
                    k_tok: jnp.ndarray, v_tok: jnp.ndarray,
                    starts: jnp.ndarray,
                    interpret: bool = False) -> tuple:
    """Append one new token's K/V rows per lane at PER-LANE cursors,
    IN PLACE (aliased outputs).

    The XLA form (`cache.at[:, lanes, :, cursors, :].set`) is the
    in-place-defeating scatter class measured at ~1.4 s per call at b=32;
    this kernel RMWs one aligned 8-slot window per (layer, lane) —
    ~60 MB of traffic at b=32 for the production talker, ~75 µs at HBM
    rate.  Used by the batched talker megakernel's per-lane-cursor mode
    (continuous batching: kernels/talker_step.py).

    k_big/v_big: [L, B, Hkv, C, Dh] (donated); k_tok/v_tok: [L, B, Hkv, Dh]
    the new rows; starts: [B] per-lane write slots (each < C - 7 rounded
    down to the window: requires C % 8 == 0 and starts < C).
    Returns (k_big', v_big')."""
    L, B, hkv, cap, dh = k_big.shape
    assert cap % 8 == 0, cap
    out_k, out_v = pl.pallas_call(
        functools.partial(_kernel_append_lanes, n_layers=L),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((L, 1, hkv, dh), lambda i, *_: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1, hkv, dh), lambda i, *_: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((L, hkv, 8, dh), k_big.dtype),
                pltpu.VMEM((L, hkv, 8, dh), v_big.dtype),
                pltpu.SemaphoreType.DMA((L, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_big.shape, k_big.dtype),
            jax.ShapeDtypeStruct(v_big.shape, v_big.dtype),
        ],
        # flat operands: starts(0) k_tok(1) v_tok(2) k_big(3) v_big(4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(starts.astype(jnp.int32), k_tok.astype(k_big.dtype),
      v_tok.astype(v_big.dtype), k_big, v_big)
    return out_k, out_v


def use_flash_decode() -> bool:
    """Trace-time gate: Pallas TPU kernels only run on TPU backends."""
    import os
    if os.environ.get("QTTS_NO_FLASH"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=("prompt_cap", "interpret"))
def flash_gqa_decode(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, lengths: jnp.ndarray,
                     write_idx: jnp.ndarray, prompt_cap: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Single-token GQA decode attention.

    q: [B, H, Dh]; k_cache/v_cache: [B, Hkv, C, Dh]; lengths: [B] prompt
    lengths; write_idx: [B] (or scalar) — per-lane slot of the current
    token (already written to the cache).  Returns [B, H, Dh].
    """
    b, hq, dh = q.shape
    write_idx = jnp.broadcast_to(jnp.asarray(write_idx, jnp.int32), (b,))
    hkv, cap = k_cache.shape[1], k_cache.shape[2]
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dh)

    padded_cap = ((cap + CHUNK - 1) // CHUNK) * CHUNK
    if padded_cap != cap:
        pad = [(0, 0), (0, 0), (0, padded_cap - cap), (0, 0)]
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)

    grid = (b, hkv)
    out = pl.pallas_call(
        functools.partial(_kernel, prompt_cap=prompt_cap, capacity=cap,
                          scale=dh ** -0.5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g, dh), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g, dh), lambda i, j, *_: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, dh), k_cache.dtype),
                pltpu.VMEM((2, CHUNK, dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, dh), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), write_idx,
      q4, k_cache, v_cache)
    return out.reshape(b, hq, dh)
