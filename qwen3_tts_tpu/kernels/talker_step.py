"""Fused talker decode-step Pallas kernel: the whole 28-layer step in ONE
launch.

The XLA decode step costs ~3.5 ms/frame against a ~1.7 ms int8 weight-stream
floor: 28 separate flash-attention launches, 112 int8 matvecs the compiler
schedules conservatively, plus per-layer KV cache glue.  This kernel runs
the full layer stack in a single pallas_call with grid=(n_layers,):

  * int8 layer weights stream HBM->VMEM with hand-rolled async DMA, ONE
    slot per matrix type (wqkv/wo/gate_up/down, ~50 MB resident): each
    matrix's next-layer copy is issued the moment the current layer is done
    with that slot, so the per-layer time approaches the 61 us aggregate
    DMA time of its ~50 MB of weights;
  * the KV cache stays in HBM in the global [L, B, Hkv, C, Dh] layout;
    per layer the LIVE prefix (slots [0, write_idx)) is streamed in
    [Hkv, CHUNK, Dh] chunks (double-buffered) with flash-style online
    softmax, and the current token's k/v are appended in-register and
    written back with one DMA per (batch, k|v);
  * the residual activation lives in VMEM scratch across grid steps;
    the final RMS norm and the 2160-row codec head run outside in XLA
    (one small matmul).

Numerics follow models/transformer.decoder_forward op-for-op (same
bf16/f32 rounding points); interpret-mode equality is tested in
tests/test_talker_kernel.py.  Like the predictor kernel, Mosaic's bf16
rounding on hardware may differ from XLA in the last ulps.

Reference parity: this replaces the per-step path of llama.cpp decode used
by the reference (engine.rs:545-642 -> llama/mod.rs); same GQA + qk-norm +
M-RoPE + SwiGLU structure.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KV_CHUNK = 512
NEG_INF = -1e30


def _blk_rotate_half(x, dh):
    """rotate_half inside each packed dh-lane head block (lane rolls +
    iota mask; Mosaic cannot reshape the lane dim)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % dh
    n = x.shape[-1]
    left = pltpu.roll(x, n - dh // 2, axis=x.ndim - 1)   # x[d + dh/2]
    right = pltpu.roll(x, dh // 2, axis=x.ndim - 1)      # x[d - dh/2]
    return jnp.where(lane < dh // 2, -left, right)


def _blk_rms(x, w_tiled, seg, dh, eps):
    """Per-head RMS norm over packed dh-lane blocks via the 0/1 segment
    matrix seg [n_lanes, n_heads]."""
    xf = x.astype(jnp.float32)
    ms = jax.lax.dot_general(xf * xf, seg, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / dh
    inv = jax.lax.rsqrt(ms + eps)
    inv_b = jax.lax.dot_general(inv, seg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return xf * inv_b * w_tiled


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                               + eps)) * w.astype(jnp.float32)


def _qmm(x_bf16, w, scale_row, w8a8: bool = False):
    """Weight matmul in one of three modes.

    int8 (legacy): cast the whole VMEM-resident int8 matrix to bf16 and
    dot — numerically identical to ops.quant.matmul, but the full-matrix
    cast unrolls into a Mosaic program whose compile time scales with
    weight bytes (~21 min for the 28-layer talker — what kept this kernel
    opt-in).  bf16: pre-dequantized weights, direct dot (compiles in ~2 min
    but doubles the HBM stream).  w8a8: quantize the ACTIVATION row to
    int8 (a [B, in] cast — trivial) and run the int8 x int8 dot on the MXU
    with int32 accumulation; int8 streaming AND a small compiled program.
    Same math class as the reference's llama.cpp Q8_0 path, which also
    quantizes activations to int8 (ggml vec_dot_q8)."""
    if w8a8 and w.dtype == jnp.int8:
        xf = x_bf16.astype(jnp.float32)
        ax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)      # [B, 1]
        sx = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)
        xq = jnp.round(xf / sx).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        return (y * sx * scale_row.astype(jnp.float32)
                ).astype(jnp.bfloat16)
    wb = w if w.dtype == jnp.bfloat16 else w.astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x_bf16, wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return y * scale_row.astype(jnp.bfloat16)


INT4_GROUP = 128


def _qmm4(x_bf16, w_ref, s):
    """w4a8 matmul: int8 activations x HALF-SPLIT packed int4 weights.

    w_ref [K/2, N] int8 VMEM ref: byte row r holds K-row r in its low
    nibble and K-row r + K/2 in its high nibble (prep_layer_weights
    packs this way so both nibble dots read CONTIGUOUS activation
    slices — no even/odd de-interleave in VMEM).  s [K/G, N] f32
    (one layer's grouped scales, loaded from the blocked ref by the
    caller): scales in K order, so byte-row block i (G rows) uses
    scale row i for its lo nibbles and row K/(2G) + i for its hi
    nibbles.  The unpack + dot runs per G-row block: Mosaic compiles
    each small block program instead of unrolling a full-matrix cast
    (the compile-ceiling lesson of the int8 mode), and the MXU still
    sees int8 x int8 dots with int32 accumulation."""
    G = INT4_GROUP
    k2, n = w_ref.shape
    nb = k2 // G
    b = x_bf16.shape[0]
    s = s.astype(jnp.float32)      # scales stream bf16 (half the bytes)
    xf = x_bf16.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)      # [B, 1]
    sx = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jnp.zeros((b, n), jnp.float32)
    for i in range(nb):
        w32 = w_ref[i * G:(i + 1) * G, :].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(jnp.int8)
        hi = jnp.right_shift(w32, 4).astype(jnp.int8)
        xe = xq[:, i * G:(i + 1) * G]
        xo = xq[:, k2 + i * G: k2 + (i + 1) * G]
        d_lo = jax.lax.dot_general(
            xe, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        d_hi = jax.lax.dot_general(
            xo, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        acc = acc + d_lo * s[i] + d_hi * s[nb + i]
    return (acc * sx).astype(jnp.bfloat16)


def _kernel(lengths_ref, start_ref,                      # scalar prefetch
            x0_ref, cos_ref, sin_ref,
            ln1_ref, ln2_ref, qn_ref, kn_ref, seg_q_ref, seg_k_ref,
            wqkv_s, wo_s, gu_s, dn_s,
            wqkv_hbm, wo_hbm, gu_hbm, dn_hbm, k_hbm, v_hbm,
            out_ref, k_tok_ref, v_tok_ref,   # per-layer new-token k/v out
            x_sc, k_sc, v_sc, q3_sc, kn3_sc, vn3_sc, ctx_sc,
            wqkv_buf, wo_buf, gu_buf, dn_buf,
            kv_sems, wsems, *sfold_scr,
            cfg_static, wmode="int8", lps=1, ablate=None,
            kv_prefetch=False, w2slot=False, sfold=False,
            batched=False, ck=KV_CHUNK, perlane=False):
    (L, B, BP, H, HKV, DH, D, EPS, CAP, PCAP) = cfg_static
    w8a8 = wmode == "w8a8"
    if sfold:
        # scale-fold mode: the w4a8 grouped scales live in HBM and stream
        # through single-slot VMEM buffers on the SAME chained schedule as
        # their weight matrices (start l+1 after layer l consumes the
        # slot), replacing Mosaic's auto-pipelined per-grid-step scale
        # blocks — part of the measured ~0.4 ms grid/machinery floor
        # (DESIGN §11 step-floor attribution).
        s_bufs = sfold_scr[:4]
        ssems = sfold_scr[4]
        s_hbms = (wqkv_s, wo_s, gu_s, dn_s)

    def sdma(which, layer):
        return pltpu.make_async_copy(s_hbms[which].at[layer],
                                     s_bufs[which], ssems.at[which])

    def qmm(x, buf, s_ref, l, li, which=0):
        if wmode == "w4a8":
            if sfold:
                return _qmm4(x, buf, s_bufs[which][...])
            # blocked scales: [lps, K/G, N] per grid step; load this
            # layer's [K/G, N] slice (dynamic untiled leading index)
            return _qmm4(x, buf, s_ref[li])
        return _qmm(x, buf[...], s_ref[l], w8a8)

    g = pl.program_id(0)                   # grid step: layers [g*lps, ...)
    rep = H // HKV
    dq = H * DH
    dkv = HKV * DH
    if perlane:
        # Per-lane cursors (continuous batching): chunk counts stream to
        # the deepest lane's cursor; validity is masked per lane below.
        start = start_ref[0]
        for _b in range(1, B):
            start = jnp.maximum(start, start_ref[_b])
    else:
        start = start_ref[0]               # uniform write cursor (slot of
    n_chunks = pl.cdiv(start, ck)          # this token); prefix = [0, start)

    def wdma(which, layer):
        hbm, buf = [(wqkv_hbm, wqkv_buf), (wo_hbm, wo_buf),
                    (gu_hbm, gu_buf), (dn_hbm, dn_buf)][which]
        if w2slot:
            # two slots per matrix type: layer l's weights live in slot
            # l % 2, so layer l+1's stream can start the moment slot
            # (l+1) % 2 was consumed (one full layer ago) instead of
            # waiting for THIS layer's matmul to free a single slot.
            sl = jax.lax.rem(layer, 2)
            return pltpu.make_async_copy(hbm.at[layer], buf.at[sl],
                                         wsems.at[which, sl])
        return pltpu.make_async_copy(hbm.at[layer], buf, wsems.at[which])

    def wbuf(which, layer):
        buf = [wqkv_buf, wo_buf, gu_buf, dn_buf][which]
        return buf.at[jax.lax.rem(layer, 2)] if w2slot else buf

    def kv_dma_at(slot, ci, b, lyr):
        """[HKV, ck, DH] chunk of lane b's cache for layer `lyr`.  In
        batched mode lane b's chunk lands in its column block
        [b*ck, (b+1)*ck) of the fused-column scratch [HKV, B*ck, DH], so
        the flash loop scores ALL lanes with ONE masked dot per chunk."""
        if batched:
            return (pltpu.make_async_copy(
                        k_hbm.at[lyr, b, :, pl.ds(ci * ck, ck), :],
                        k_sc.at[slot, :, pl.ds(b * ck, ck), :],
                        kv_sems.at[slot, b, 0]),
                    pltpu.make_async_copy(
                        v_hbm.at[lyr, b, :, pl.ds(ci * ck, ck), :],
                        v_sc.at[slot, :, pl.ds(b * ck, ck), :],
                        kv_sems.at[slot, b, 1]))
        return (pltpu.make_async_copy(
                    k_hbm.at[lyr, b, :, pl.ds(ci * ck, ck), :],
                    k_sc.at[slot, b], kv_sems.at[slot, b, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[lyr, b, :, pl.ds(ci * ck, ck), :],
                    v_sc.at[slot, b], kv_sems.at[slot, b, 1]))

    n_chunks_pf = n_chunks

    @pl.when(g == 0)
    def _():
        x_sc[...] = x0_ref[...]
        nw = {"mlp_nodma": 2, "min": 0}.get(ablate, 4)
        for w in range(nw):
            wdma(w, 0).start()
            if sfold:
                sdma(w, 0).start()
        if w2slot and L > 1:
            for w in range(nw):
                wdma(w, 1).start()
        if kv_prefetch:
            # cross-layer KV prefetch: layer 0's first chunk rides slot 2
            # (and chunk 1, when present, slot 1) so every layer's early
            # KV DMAs overlap the PREVIOUS layer's wo/MLP and its own
            # qkv.  Step-floor attribution: the per-layer chunk-0 latency
            # was fully exposed at small cursors (0.47 ms of the 1.95 ms
            # step), and chunk 1's returned at cursors past KV_CHUNK
            # (intra-layer double-buffering gave it only chunk-0's
            # near-zero compute time to transfer).
            @pl.when(n_chunks_pf > 0)
            def _():
                for b in range(B):
                    for dma in kv_dma_at(2, 0, b, 0):
                        dma.start()

            @pl.when(n_chunks_pf > 1)
            def _():
                for b in range(B):
                    for dma in kv_dma_at(1, 1, b, 0):
                        dma.start()

    def layer_iter(li, x):
        """One decoder layer; li in [0, lps), global layer l = g*lps + li.
        The weight-stream chaining (wait l, start l+1) is identical to the
        one-layer-per-grid-step schedule — the single-slot DMA pipeline
        does not care where the grid/loop boundary falls."""
        l = g * lps + li
        if ablate == "min":      # timing probe: bare grid/loop machinery
            return x

        def _mlp_tail(x, l, li):
            # ---- SwiGLU MLP (ablate == "mlp" keeps the gu/dn weight
            # streams chained but skips the compute; "mlp_nodma" removes
            # the gu/dn streams entirely — timing probes only)
            if ablate == "mlp_nodma":
                return x
            nxt = l + 2 if w2slot else l + 1
            wdma(2, l).wait()
            if sfold:
                sdma(2, l).wait()
            if ablate != "mlp":
                hn2 = _rms(x, ln2_ref[l], EPS).astype(jnp.bfloat16)
                gup = qmm(hn2, wbuf(2, l), gu_s, l, li, 2)

            @pl.when(nxt < L)
            def _():
                wdma(2, nxt).start()
                if sfold:
                    sdma(2, l + 1).start()

            if ablate != "mlp":
                f_half = gup.shape[-1] // 2
                gf = gup[:, :f_half].astype(jnp.float32)
                ff = (gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) \
                    * gup[:, f_half:]
            wdma(3, l).wait()
            if sfold:
                sdma(3, l).wait()
            if ablate != "mlp":
                x = x + qmm(ff, wbuf(3, l), dn_s, l, li, 3)

            @pl.when(nxt < L)
            def _():
                wdma(3, nxt).start()
                if sfold:
                    sdma(3, l + 1).start()
            return x

        # ---- qkv
        wdma(0, l).wait()
        if sfold:
            sdma(0, l).wait()
        hn = _rms(x, ln1_ref[l], EPS).astype(jnp.bfloat16)
        qkv = qmm(hn, wbuf(0, l), wqkv_s, l, li, 0)
        nxt = l + 2 if w2slot else l + 1

        @pl.when(nxt < L)
        def _():
            wdma(0, nxt).start()
            if sfold:
                sdma(0, l + 1).start()

        q = qkv[:, :dq]
        k = qkv[:, dq: dq + dkv]
        v = qkv[:, dq + dkv:]
        q = _blk_rms(q, qn_ref[l], seg_q_ref[...], DH,
                     EPS).astype(jnp.bfloat16)
        k = _blk_rms(k, kn_ref[l], seg_k_ref[...], DH,
                     EPS).astype(jnp.bfloat16)
        cos_q = cos_ref[...]                             # [B, dq] f32
        sin_q = sin_ref[...]
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos_q
             + _blk_rotate_half(qf, DH) * sin_q).astype(jnp.bfloat16)
        k = (kf * cos_q[:, :dkv] + _blk_rotate_half(kf, DH) * sin_q[:, :dkv]
             ).astype(jnp.bfloat16)

        # stage q/k/v into per-head layout: [HKV, rep*BP, DH] / [HKV, BP, DH]
        for j in range(HKV):
            for c in range(rep):
                h = j * rep + c
                q3_sc[j, c * BP:(c + 1) * BP] = q[:, h * DH:(h + 1) * DH]
            kn3_sc[j] = k[:, j * DH:(j + 1) * DH]
            vn3_sc[j] = v[:, j * DH:(j + 1) * DH]

        # new-token k/v leave as a per-layer output row (block [lps, ...]
        # per grid step, dynamic untiled row li); the caller scatters them
        # into the cache with one fused dynamic_update_slice (in-place
        # under donation) — VMEM sublane slicing rules out per-lane DMAs
        k_tok_ref[li] = kn3_sc[...]
        v_tok_ref[li] = vn3_sc[...]

        # ---- flash attention over the live prefix, chunked+double-buffered
        # QTTS_TALKER_ABLATE (timing probes ONLY — output is wrong):
        #   "attn"          skip KV DMAs + flash loop + ctx (ctx = 0)
        #   "attn_keepdma"  run the KV DMA chain, skip attention compute
        #   "mlp"           keep gu/dn weight streams, skip MLP compute
        # Attribution of the stream-independent step floor (DESIGN §11).
        q3 = q3_sc[...].astype(jnp.float32) * (DH ** -0.5)  # [HKV, rB, DH]

        def kv_dma(slot, ci, b):
            return kv_dma_at(slot, ci, b, l)

        if ablate in ("attn", "attn_keepdma"):
            if ablate == "attn_keepdma":
                @pl.when(n_chunks > 0)
                def _():
                    for b in range(B):
                        for dma in kv_dma(0, 0, b):
                            dma.start()

                def dma_body(ci, carry):
                    slot = jax.lax.rem(ci, 2)
                    nslot = jax.lax.rem(ci + 1, 2)

                    @pl.when(ci + 1 < n_chunks)
                    def _():
                        for b in range(B):
                            for dma in kv_dma(nslot, ci + 1, b):
                                dma.start()
                    for b in range(B):
                        for dma in kv_dma(slot, ci, b):
                            dma.wait()
                    return carry

                jax.lax.fori_loop(0, n_chunks, dma_body, jnp.int32(0))
            ctx_sc[...] = jnp.zeros_like(ctx_sc)
            ctx = ctx_sc[...]
            wdma(1, l).wait()
            if sfold:
                sdma(1, l).wait()
            x = x + qmm(ctx.astype(jnp.bfloat16), wbuf(1, l), wo_s, l, li, 1)

            @pl.when(nxt < L)
            def _():
                wdma(1, nxt).start()
                if sfold:
                    sdma(1, l + 1).start()
            return _mlp_tail(x, l, li)

        if not kv_prefetch:
            @pl.when(n_chunks > 0)
            def _():
                for b in range(B):
                    for dma in kv_dma(0, 0, b):
                        dma.start()

        if batched:
            # ---- batched flash loop: ONE masked dot over the fused-column
            # scratch per chunk (issue count independent of B), instead of
            # B unrolled per-lane dots.  Column c of lane b sits at
            # b*ck + c; rows keep the c*BP + b packing of q3.  Scores use
            # bf16 q/k with f32 MXU accumulation (each bf16 product is
            # exact in f32, so this matches the f32-dot path up to
            # accumulation order); p rounds to bf16 for the pv dot — a
            # ~2^-9 relative deviation, far under the w4a8 weight noise.
            # Compute is B-fold redundant in columns (each row masks to
            # its own lane's block), but decode attention is DMA-bound:
            # the dot overlaps the next chunk's 2B lane DMAs.
            cols = B * ck
            c_ind = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cols), 2)
            collane = c_ind // ck
            colpos0 = c_ind % ck          # + ci*ck per chunk
            lenrow = jnp.zeros((1, 1, cols), jnp.int32)
            for b in range(B):
                lenrow = jnp.where(collane == b, lengths_ref[b], lenrow)
            if perlane:
                startrow = jnp.zeros((1, 1, cols), jnp.int32)
                for b in range(B):
                    startrow = jnp.where(collane == b, start_ref[b],
                                         startrow)
            else:
                startrow = start
            rowlane = jax.lax.broadcasted_iota(
                jnp.int32, (1, rep * BP, 1), 1) % BP
            lane_match = rowlane == collane            # [1, rB, cols]
            q3b = q3_sc[...]                           # bf16 [HKV, rB, DH]
            inv_sqrt_dh = DH ** -0.5

            def chunk_body(ci, carry):
                m, s_sum, acc = carry
                slot = jax.lax.rem(ci, 2)
                nslot = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    for b in range(B):
                        for dma in kv_dma(nslot, ci + 1, b):
                            dma.start()
                for b in range(B):
                    for dma in kv_dma(slot, ci, b):
                        dma.wait()
                ks = k_sc[slot]                        # bf16 [HKV, cols, DH]
                vs = v_sc[slot]
                sb = jax.lax.dot_general(
                    q3b, ks, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * inv_sqrt_dh
                pos = ci * ck + colpos0
                valid = lane_match & ((pos < lenrow)
                                      | ((pos >= PCAP) & (pos < startrow)))
                sb = jnp.where(valid, sb, NEG_INF)     # [HKV, rB, cols]
                mb = jnp.maximum(m, jnp.max(sb, axis=2, keepdims=True))
                p = jnp.exp(sb - mb)
                alpha = jnp.exp(m - mb)
                acc_n = acc * alpha + jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vs, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [HKV, rB, DH]
                s_n = s_sum * alpha + jnp.sum(p, axis=2, keepdims=True)
                return mb, s_n, acc_n
        else:
            chunk_body = None      # defined below (per-lane unrolled form)

        def chunk_body_unrolled(ci, carry):
            m, s_sum, acc = carry
            # chunk 0 rides the cross-layer prefetch slot (2) when enabled
            slot = (jnp.where(ci == 0, 2, jax.lax.rem(ci, 2))
                    if kv_prefetch else jax.lax.rem(ci, 2))
            nslot = jax.lax.rem(ci + 1, 2)

            # chunks 0 AND 1 are cross-layer-prefetched; the intra-layer
            # pipeline only issues from chunk 2 on
            start_gate = (jnp.logical_and(ci + 1 < n_chunks, ci >= 1)
                          if kv_prefetch else ci + 1 < n_chunks)

            @pl.when(start_gate)
            def _():
                for b in range(B):
                    for dma in kv_dma(nslot, ci + 1, b):
                        dma.start()

            for b in range(B):
                for dma in kv_dma(slot, ci, b):
                    dma.wait()

            ks = k_sc[slot].astype(jnp.float32)          # [B, HKV, CK, DH]
            vs = v_sc[slot].astype(jnp.float32)
            # scores per lane b: q3 is [HKV, rep*B, DH] with lane b at rows
            # c*B + b; batched dot over HKV
            c_idx = ci * KV_CHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, KV_CHUNK), 2)          # [1, 1, CK]
            m_new, s_new, acc_new = m, s_sum, acc
            # process each batch lane's chunk (its validity differs)
            for b in range(B):
                sb = jax.lax.dot_general(
                    q3, ks[b], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [HKV, rB, CK]
                valid = (c_idx < lengths_ref[b]) | \
                    ((c_idx >= PCAP) &
                     (c_idx < (start_ref[b] if perlane else start)))
                sb = jnp.where(valid, sb, NEG_INF)
                # mask other lanes' rows so their running stats don't move
                rowb = jax.lax.broadcasted_iota(
                    jnp.int32, sb.shape, 1) % BP == b
                sb = jnp.where(rowb, sb, NEG_INF)
                mb = jnp.maximum(m, jnp.max(sb, axis=2, keepdims=True))
                p = jnp.exp(sb - mb)                     # [HKV, rB, CK]
                alpha = jnp.exp(m - mb)
                ab = acc * alpha + jax.lax.dot_general(
                    p, vs[b], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [HKV, rB, DH]
                sb_sum = s_sum * alpha + jnp.sum(p, axis=2, keepdims=True)
                m_new = jnp.where(rowb[:, :, :1], mb, m_new)
                s_new = jnp.where(rowb[:, :, :1], sb_sum, s_new)
                acc_new = jnp.where(rowb[:, :, :1], ab, acc_new)
            return m_new, s_new, acc_new

        if chunk_body is None:
            chunk_body = chunk_body_unrolled

        rB = rep * BP
        m0 = jnp.full((HKV, rB, 1), NEG_INF, jnp.float32)
        s0 = jnp.zeros((HKV, rB, 1), jnp.float32)
        a0 = jnp.zeros((HKV, rB, DH), jnp.float32)
        m, s_sum, acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                          (m0, s0, a0))
        if kv_prefetch:
            # chunks 0 and 1 of the NEXT layer start now (their slots are
            # consumed): the DMAs overlap this layer's wo + MLP and
            # l+1's qkv.
            @pl.when(jnp.logical_and(l + 1 < L, n_chunks > 0))
            def _():
                for b in range(B):
                    for dma in kv_dma_at(2, 0, b, l + 1):
                        dma.start()

            @pl.when(jnp.logical_and(l + 1 < L, n_chunks > 1))
            def _():
                for b in range(B):
                    for dma in kv_dma_at(1, 1, b, l + 1):
                        dma.start()

        # current token column (always valid, self-attention).  Row c*B + b
        # of q3 pairs with kn3 row b; select via a row%B == col mask on the
        # full [rB, B] score block (Mosaic has no tiny-sublane concat/tile).
        kn3 = kn3_sc[...].astype(jnp.float32)            # [HKV, B, DH]
        vn3 = vn3_sc[...].astype(jnp.float32)
        sc_all = jax.lax.dot_general(
            q3, kn3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [HKV, rB, B]
        rowm = jax.lax.broadcasted_iota(jnp.int32, sc_all.shape, 1) % BP
        colm = jax.lax.broadcasted_iota(jnp.int32, sc_all.shape, 2)
        sel = rowm == colm
        s_cur = jnp.sum(jnp.where(sel, sc_all, 0.0), axis=2,
                        keepdims=True)                   # [HKV, rB, 1]
        m_f = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m_f)
        p_cur = jnp.exp(s_cur - m_f)
        pv = jax.lax.dot_general(
            jnp.where(sel, p_cur, 0.0), vn3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [HKV, rB, DH]
        acc = acc * alpha + pv
        s_sum = s_sum * alpha + p_cur
        ctx3 = acc / jnp.maximum(s_sum, 1e-30)           # [HKV, rB, DH]

        # unpack back to packed lanes [B, dq] via scratch-ref lane slices
        for j in range(HKV):
            for c in range(rep):
                h = j * rep + c
                ctx_sc[:, h * DH:(h + 1) * DH] = \
                    ctx3[j, c * BP:(c + 1) * BP].astype(jnp.float32)
        ctx = ctx_sc[...]

        wdma(1, l).wait()
        if sfold:
            sdma(1, l).wait()
        x = x + qmm(ctx.astype(jnp.bfloat16), wbuf(1, l), wo_s, l, li, 1)

        @pl.when(nxt < L)
        def _():
            wdma(1, nxt).start()
            if sfold:
                sdma(1, l + 1).start()
        return _mlp_tail(x, l, li)

    x = jax.lax.fori_loop(0, lps, layer_iter, x_sc[...])
    x_sc[...] = x

    @pl.when(g == (L // lps) - 1)
    def _():
        out_ref[...] = x


@functools.partial(jax.jit,
                   static_argnames=("cfg_static", "interpret", "wmode",
                                    "lps", "ablate", "sfold", "perlane"))
def _call(x0, cos, sin, layer_w, k_cache, v_cache, lengths, start,
          cfg_static, interpret=False, wmode="int8", lps=1, ablate=None,
          sfold=False, perlane=False):
    (L, B, BP, H, HKV, DH, D, EPS, CAP, PCAP) = cfg_static
    rep = H // HKV
    dq = H * DH
    dkv = HKV * DH
    d_ff2 = layer_w["gu_q"].shape[-1]
    # row counts come from the arrays: w4a8 packs two K-rows per byte row
    rows_qkv = layer_w["wqkv_q"].shape[-2]
    rows_wo = layer_w["wo_q"].shape[-2]
    rows_gu = layer_w["gu_q"].shape[-2]
    rows_dn = layer_w["dn_q"].shape[-2]
    qkv_out = layer_w["wqkv_q"].shape[-1]
    # Batched mode (B > 4): fused-column KV scratch, one dot per chunk.
    # ck shrinks with B so the scratch stays ~2 slots x [HKV, B*ck, DH]
    # x (k+v) <= ~34 MB against the 110 MB VMEM budget.  B > 32 (r5:
    # 48/64/96-lane serving) keeps B*ck <= 4096 the same way — the dot
    # size per chunk stays constant and only the DMA issue count grows.
    batched = B > 4
    if not batched:
        ck = KV_CHUNK
    elif B <= 32:
        ck = max(128, 2048 // B)
    else:
        ck = 64 if B <= 64 else 32
    cap_pad = ((CAP + ck - 1) // ck) * ck
    k_in, v_in = k_cache, v_cache
    if cap_pad != CAP:
        pad = [(0, 0), (0, 0), (0, 0), (0, cap_pad - CAP), (0, 0)]
        k_in = jnp.pad(k_cache, pad)
        v_in = jnp.pad(v_cache, pad)

    fixed = lambda shape, space=pltpu.VMEM: pl.BlockSpec(
        shape, lambda l, *_: (0,) * len(shape), memory_space=space)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    wdt = layer_w["wqkv_q"].dtype        # int8 or bf16 (pre-dequantized)
    vmem_limit = (110 if wdt == jnp.int8 else 126) * 1024 * 1024
    import os as _os
    sfold = sfold and wmode == "w4a8"
    if wmode == "w4a8" and not sfold:
        # [L, K/G, N] grouped scales stream lps layers' blocks per grid step
        scale_spec = lambda arr: pl.BlockSpec(
            (lps,) + arr.shape[1:], lambda g, *_: (g, 0, 0),
            memory_space=pltpu.VMEM)
    elif sfold:
        scale_spec = lambda arr: hbm
    else:
        # [L, N] per-output-channel rows, whole array VMEM-resident
        scale_spec = lambda arr: fixed(arr.shape)

    # Cross-layer KV prefetch needs a third KV slot (+2 x ~0.5 MB per
    # lane); worth it at decode batches, skipped for big-batch VMEM
    # pressure and for ablation probes (their schedule must stay the
    # measured baseline).
    # attn-variants replace the KV DMA schedule outright; the other
    # ablations compose with the prefetch so probes measure the
    # production schedule minus one component.
    kv_prefetch = (not batched and B <= 8
                   and ablate not in ("attn", "attn_keepdma", "min"))
    kv_slots = 3 if kv_prefetch else 2
    # Two-slot weight streaming (w4a8 only: packed int4 keeps the doubled
    # buffers ~48 MB; other modes would blow the VMEM budget): the next
    # layer's weight DMA spans the whole previous layer instead of
    # starting after the consuming matmul.
    # B <= 2: the doubled buffers + 3-slot KV scratch + Mosaic's
    # pipelined scale blocks must fit the 110 MB VMEM budget.  Measured
    # on v5e: NO win over single-slot + KV prefetch (scan64 min 0.101 s
    # both) — the weight stream's per-transfer DMA rate, not the
    # consume-gated start, is the remaining limit — so this stays an
    # opt-in experiment for other hardware generations.
    w2slot = (kv_prefetch and wmode == "w4a8" and B <= 2
              and _os.environ.get("QTTS_TALKER_W2SLOT") == "1")
    sfold = sfold and not w2slot     # w2slot keeps the blocked-scale form
    kernel = functools.partial(_kernel, cfg_static=cfg_static, wmode=wmode,
                               lps=lps, ablate=ablate,
                               kv_prefetch=kv_prefetch, w2slot=w2slot,
                               sfold=sfold, batched=batched, ck=ck,
                               perlane=perlane)
    sfold_scratch = [
        pltpu.VMEM(layer_w[n].shape[1:], layer_w[n].dtype)
        for n in ("wqkv_s", "wo_s", "gu_s", "dn_s")
    ] + [pltpu.SemaphoreType.DMA((4,))] if sfold else []
    out, k_tok, v_tok = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L // lps,),
            in_specs=[
                fixed((BP, D)),                           # x0 bf16
                fixed((BP, dq)),                          # cos (lane-tiled)
                fixed((BP, dq)),                          # sin
                fixed((L, D)),                            # ln1
                fixed((L, D)),                            # ln2
                fixed((L, dq)),                           # q_norm tiled
                fixed((L, dkv)),                          # k_norm tiled
                fixed((dq, H)),                           # seg_q
                fixed((dkv, HKV)),                        # seg_k
                scale_spec(layer_w["wqkv_s"]),            # scales
                scale_spec(layer_w["wo_s"]),
                scale_spec(layer_w["gu_s"]),
                scale_spec(layer_w["dn_s"]),
                hbm, hbm, hbm, hbm,                       # weights int8
                hbm, hbm,                                 # k/v cache
            ],
            out_specs=[
                fixed((BP, D)),
                pl.BlockSpec((lps, HKV, BP, DH), lambda g, *_: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lps, HKV, BP, DH), lambda g, *_: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((BP, D), jnp.bfloat16),        # x residual
                (pltpu.VMEM((kv_slots, HKV, B * ck, DH), jnp.bfloat16)
                 if batched
                 else pltpu.VMEM((kv_slots, B, HKV, ck, DH), jnp.bfloat16)),
                (pltpu.VMEM((kv_slots, HKV, B * ck, DH), jnp.bfloat16)
                 if batched
                 else pltpu.VMEM((kv_slots, B, HKV, ck, DH), jnp.bfloat16)),
                pltpu.VMEM((HKV, rep * BP, DH), jnp.bfloat16),  # q3
                pltpu.VMEM((HKV, BP, DH), jnp.bfloat16),  # k new
                pltpu.VMEM((HKV, BP, DH), jnp.bfloat16),  # v new
                pltpu.VMEM((BP, dq), jnp.float32),        # ctx unpack
                (pltpu.VMEM((2, rows_qkv, qkv_out), wdt) if w2slot
                 else pltpu.VMEM((rows_qkv, qkv_out), wdt)),
                (pltpu.VMEM((2, rows_wo, D), wdt) if w2slot
                 else pltpu.VMEM((rows_wo, D), wdt)),
                (pltpu.VMEM((2, rows_gu, d_ff2), wdt) if w2slot
                 else pltpu.VMEM((rows_gu, d_ff2), wdt)),
                (pltpu.VMEM((2, rows_dn, D), wdt) if w2slot
                 else pltpu.VMEM((rows_dn, D), wdt)),
                pltpu.SemaphoreType.DMA((kv_slots, B, 2)),  # kv chunk dma
                (pltpu.SemaphoreType.DMA((4, 2)) if w2slot
                 else pltpu.SemaphoreType.DMA((4,))),     # weight streams
                *sfold_scratch,     # scale-fold: 4 scale bufs + semaphores
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BP, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, HKV, BP, DH), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, HKV, BP, DH), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(lengths.astype(jnp.int32),
      (jnp.reshape(start, (B,)) if perlane
       else jnp.reshape(start, (1,))).astype(jnp.int32),
      x0, cos, sin,
      layer_w["ln1"], layer_w["ln2"], layer_w["qn"], layer_w["kn"],
      layer_w["seg_q"], layer_w["seg_k"],
      layer_w["wqkv_s"], layer_w["wo_s"], layer_w["gu_s"], layer_w["dn_s"],
      layer_w["wqkv_q"], layer_w["wo_q"], layer_w["gu_q"], layer_w["dn_q"],
      k_in, v_in)
    # scatter the new token's k/v into the (donated, in-place) cache with
    # one fused dynamic_update_slice per cache
    if ablate == "nocache":      # timing probe: is this dus a full copy?
        return out[:B], k_cache, v_cache
    k_tok = jnp.transpose(k_tok, (0, 2, 1, 3))[:, :B]     # [L, B, HKV, DH]
    v_tok = jnp.transpose(v_tok, (0, 2, 1, 3))[:, :B]
    if perlane:
        # per-lane cursors: aligned-window RMW append (the XLA per-lane
        # scatter defeats in-place reuse — see flash_decode.append_kv_lanes)
        from .flash_decode import append_kv_lanes
        k_new, v_new = append_kv_lanes(k_cache, v_cache, k_tok, v_tok,
                                       start, interpret=interpret)
        return out[:B], k_new, v_new
    start_i = jnp.asarray(start, jnp.int32)
    k_new = jax.lax.dynamic_update_slice(
        k_cache, k_tok[:, :, :, None, :].astype(k_cache.dtype),
        (0, 0, 0, start_i, 0))
    v_new = jax.lax.dynamic_update_slice(
        v_cache, v_tok[:, :, :, None, :].astype(v_cache.dtype),
        (0, 0, 0, start_i, 0))
    return out[:B], k_new, v_new


def _seg_matrix(n_heads, dh):
    seg = np.zeros((n_heads * dh, n_heads), np.float32)
    for h in range(n_heads):
        seg[h * dh:(h + 1) * dh, h] = 1.0
    return seg


def prep_layer_weights(cfg, params, weights: str = "int8") -> Dict[str, Any]:
    """Kernel-ready form of the stacked talker layers (tiled per-head
    norms).  weights="int8": int8 + f32 scale rows, cast to bf16 in VMEM
    per layer (halves the HBM stream; the cast dominates Mosaic compile
    time).  weights="bf16": dequantized bf16 with scales folded in (2x
    stream, much smaller compiled program — the scan-compatible mode).
    No head permutation: attention runs per-kv-head with q heads addressed
    directly by lane block."""
    from ..ops.quant import is_quantized, quantize_weight
    lw = params["layers"]
    H, HKV = cfg.n_heads, cfg.n_kv_heads

    def qs4(w):
        """Grouped int4 with HALF-SPLIT packing for _qmm4: byte row r of
        [L, K/2, N] carries K-row r (low nibble) and K-row r + K/2 (high
        nibble); scales [L, K/G, N] stay in K order.  Engine weights
        usually arrive already int8-quantized, so this is a requantization
        (int8 -> int4 adds its own rounding on top — same double-quant
        class as converting a Q8_0 GGUF to Q4; loading int4 directly from
        a bf16 checkpoint avoids it)."""
        G = INT4_GROUP
        if is_quantized(w):
            wf = (w["q"].astype(jnp.float32)
                  * w["s"][:, None, :].astype(jnp.float32))
        else:
            wf = w.astype(jnp.float32)
        Lr, K, N = wf.shape
        assert K % (2 * G) == 0, (K, G)
        wg = wf.reshape(Lr, K // G, G, N)
        amax = jnp.max(jnp.abs(wg), axis=2, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
        q = q.reshape(Lr, K, N)
        loq = q[:, : K // 2]
        hiq = q[:, K // 2:]
        packed = jnp.bitwise_or(jnp.bitwise_and(loq, 0x0F),
                                jnp.left_shift(hiq, 4)).astype(jnp.int8)
        return packed, scale[:, :, 0, :].astype(jnp.float32)

    def qs(w):
        if weights == "w4a8":
            return qs4(w)
        if is_quantized(w):
            q, s = w["q"], w["s"]
        else:
            qt = quantize_weight(w, axis=-2)
            q, s = qt["q"], qt["s"]
        if weights == "bf16":
            deq = (q.astype(jnp.float32) * s[:, None, :].astype(jnp.float32)
                   ).astype(jnp.bfloat16)
            return deq, jnp.ones_like(s)
        return q, s          # "int8" and "w8a8" both stream int8

    _sdt = jnp.bfloat16 if weights == "w4a8" else jnp.float32
    wqkv_q, wqkv_s = qs(lw["wqkv"])
    wo_q, wo_s = qs(lw["wo"])
    gu_q, gu_s = qs(lw["w_gate_up"])
    dn_q, dn_s = qs(lw["w_down"])
    return {
        "ln1": lw["ln1"].astype(jnp.float32),
        "ln2": lw["ln2"].astype(jnp.float32),
        "qn": jnp.tile(lw["q_norm"].astype(jnp.float32), (1, H)),
        "kn": jnp.tile(lw["k_norm"].astype(jnp.float32), (1, HKV)),
        "seg_q": jnp.asarray(_seg_matrix(H, cfg.head_dim)),
        "seg_k": jnp.asarray(_seg_matrix(HKV, cfg.head_dim)),
        # w4a8 grouped scales stream as bf16: the f32 form was 86 MB of
        # the ~440 MB/step DMA demand; bf16 halves it for <=0.2% extra
        # scale rounding on top of int4's own group quantization.
        "wqkv_q": wqkv_q, "wqkv_s": wqkv_s.astype(_sdt),
        "wo_q": wo_q, "wo_s": wo_s.astype(_sdt),
        "gu_q": gu_q, "gu_s": gu_s.astype(_sdt),
        "dn_q": dn_q, "dn_s": dn_s.astype(_sdt),
    }


def fused_mode() -> Optional[str]:
    """Resolve QTTS_FUSED_TALKER into a weight mode, or None (XLA path).

    Default (env unset) is **"w4a8"** on TPU backends: measured the fastest
    end-to-end mode on v5e (bulk 3.63 ms/frame vs 4.78 for the XLA carry-KV
    path, scan64 step 1.97 ms vs ~2.6) with llama.cpp Q4-class weight
    numerics — the same quantization class as the reference's default
    Q4/Q5_K_M GGUFs (`/root/reference/README.md:27`).  Set
    QTTS_FUSED_TALKER=0 for the exact-int8 XLA path, or w8a8/bf16/int8 for
    the other kernel modes (see decoder_forward's gate comment).
    """
    import os
    raw = os.environ.get("QTTS_FUSED_TALKER")
    if raw in ("", "0"):
        return None
    if raw is None:
        # default-on only where the kernel can actually run
        from .flash_decode import use_flash_decode
        return "w4a8" if use_flash_decode() else None
    if raw in ("bf16", "w8a8", "w4a8"):
        return raw
    return "int8"


def supported(cfg, batch: int, weights: str = "int8") -> bool:
    """Decode-shaped batches with standard dims: 1-4 lanes run the
    per-lane-unrolled flash loop; multiples of 8 up to 96 run the batched
    fused-column flash loop (serving batches share ONE weight stream —
    the round-4 verdict's top item; r5 extends 32 -> 96: B*ck stays
    <= 4096 columns and lps is clamped to 4 past b=32, so the program
    holds ~75 MB at b=64 against the 110 MB budget).  The kernel unconditionally applies
    per-head RMS q/k-norm, so a config with qk_norm=False must take the
    XLA path (the production talker always sets it; this just hardens the
    gate).  w4a8 additionally needs every contraction dim to split into
    whole 2*G-row nibble groups."""
    ok = ((batch <= 4 or (batch % 8 == 0 and batch <= 96))
          and cfg.qk_norm
          and cfg.head_dim == 128
          and cfg.d_model % 128 == 0
          and cfg.n_heads % cfg.n_kv_heads == 0)
    if ok and weights == "w4a8":
        g2 = 2 * INT4_GROUP
        dq = cfg.n_heads * cfg.head_dim
        ok = (cfg.d_model % g2 == 0 and dq % g2 == 0
              and cfg.d_ff % g2 == 0)
    return ok


def layers_per_step(n_layers: int) -> int:
    """Layers per grid step (QTTS_TALKER_LPS).  lps > 1 runs several
    layers inside one grid iteration via lax.fori_loop — same ops, same
    single-slot weight-DMA chaining, fewer Mosaic grid-iteration fixed
    costs (the predictor kernel's grid 96 -> 16 restructure measured this
    overhead as its dominant term).  Must divide n_layers; invalid values
    fall back to 1.

    Default (env unset): the largest divisor of n_layers <= 7.  The v5e
    sweep (DESIGN §10: scan64 warm, w4a8, 28 layers) measured lps
    1/2/4/7/14/28 -> 126/121/121/122/124/123 ms — lps 2-7 tie ~3-4%
    ahead of lps=1, and lps=7 also compiles 8x faster (14.2 s vs
    115 s), so 7 is the production point for the 28-layer talker."""
    import os
    raw = os.environ.get("QTTS_TALKER_LPS")
    if raw is not None:
        try:
            v = int(raw)
        except ValueError:
            v = 1
        return v if v >= 1 and n_layers % v == 0 else 1
    for v in (7, 6, 5, 4, 3, 2):
        if n_layers % v == 0:
            return v
    return 1


def talker_step_fused(cfg, params, x, cos, sin, cache_k, cache_v,
                      lengths, write_idx, prompt_cap: int,
                      interpret: bool = False, weights: str = "int8",
                      lps: Optional[int] = None,
                      sfold: Optional[bool] = None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step over all layers.

    x [B, D] bf16 feedback embedding (already rms-normed? no — raw input);
    cos/sin [B, 1, DH] rope tables for the current position (uniform across
    batch is NOT required — but the kernel tiles lane-wise, so pass the
    per-head-identical [DH] row); cache_k/v [L, B, HKV, C, DH];
    lengths [B]; write_idx scalar (uniform cursor) OR [B] per-lane cursors
    (continuous batching: validity masks go lane-wise and the append runs
    through flash_decode.append_kv_lanes; requires cache capacity % 8).
    Returns (hidden [B, D] BEFORE final norm, k_cache, v_cache updated).
    """
    L = cfg.n_layers
    B = x.shape[0]
    BP = B + (B % 2)        # bf16 sublane slices need 2-alignment
    cfg_static = (L, B, BP, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                  cfg.d_model, cfg.rms_eps, cache_k.shape[3], prompt_cap)
    # cos/sin arrive [B, 1, DH] (per-lane position rows, identical across
    # heads); tile across the packed q lanes -> [BP, dq]
    cos_t = jnp.tile(cos.reshape(B, cfg.head_dim), (1, cfg.n_heads))
    sin_t = jnp.tile(sin.reshape(B, cfg.head_dim), (1, cfg.n_heads))
    x = x.astype(jnp.bfloat16)
    if BP != B:
        pad = ((0, BP - B), (0, 0))
        x = jnp.pad(x, pad)
        cos_t = jnp.pad(cos_t, pad)
        sin_t = jnp.pad(sin_t, pad)
    # Pre-packed kernel weights (Generator computes them ONCE at startup)
    # ride in params["fused_<mode>"]; without them the prep runs inside the
    # traced program — free for int8/w8a8 (pass-through), but bf16/w4a8
    # would re-derive packed weights per call unless XLA hoists the
    # loop-invariant chain, so callers in hot loops should pre-pack.
    layer_w = params.get("fused_" + weights)
    if layer_w is None:
        layer_w = prep_layer_weights(cfg, params, weights=weights)
    if lps is None:
        lps = layers_per_step(L)
    elif L % lps != 0:
        lps = 1
    if B > 32 and lps > 4:
        # b=48/64/96: Mosaic double-buffers (lps, ...) scale blocks per
        # grid step — clamp so the blocks shrink with the bigger
        # fused-column KV scratch
        lps = next((v for v in (4, 3, 2) if L % v == 0), 1)
    from qwen3_tts_tpu.utils.debug import ablate_mode
    ablate = ablate_mode("QTTS_TALKER_ABLATE")
    if sfold is None:
        # Scale-fold (w4a8 only): stream the grouped scales from HBM with
        # manual DMAs chained to their weight matrices, instead of
        # Mosaic's auto-pipelined per-grid-step scale blocks (part of the
        # measured ~0.4 ms machinery floor — DESIGN §11).  Opt-in
        # QTTS_TALKER_SFOLD=1 until the hardware A/B lands.
        import os
        sfold = os.environ.get("QTTS_TALKER_SFOLD") == "1"
    perlane = jnp.ndim(write_idx) > 0
    if perlane and cache_k.shape[3] % 8 != 0:
        raise ValueError("per-lane cursors need cache capacity % 8 == 0, "
                         f"got {cache_k.shape[3]}")
    return _call(x, cos_t.astype(jnp.float32),
                 sin_t.astype(jnp.float32), layer_w, cache_k, cache_v,
                 lengths, write_idx, cfg_static=cfg_static,
                 interpret=interpret, wmode=weights, lps=lps,
                 ablate=ablate, sfold=sfold, perlane=perlane)
