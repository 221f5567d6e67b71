"""Chunk-level megakernel: N whole frames — talker step + code_0 sampling +
predictor 15-code expansion + feedback assembly — in ONE Pallas launch.

The round-3 frame was 2.96 ms: talker step ~1.46 ms (near its weight-stream
bound) + predictor ~1.33 ms + glue, where the predictor's cost was measured
(QTTS_PRED_ABLATE, docs/DESIGN.md §11) as ~0.5 ms per-launch machinery +
0.66 ms serial op floor, and the talker kernel pays a ~0.4 ms grid-entry
floor per launch.  Fusing the whole 4-frame chunk into one launch removes
7 of the 8 kernel entries per chunk and ALL of the XLA glue between them
(sampling, projection, feedback gathers, head matmul each ran as separate
XLA ops with their own scheduling bubbles).

Grid = (n_frames, n_talker_phases + 1); per frame:

  phase 0 ("expand"):
    * sample code_0 from the carried codec logits in-kernel: greedy argmax,
      or temperature/top-k/top-p with a PRE-DRAWN uniform (u ~ U[0,1) comes
      from jax.random OUTSIDE the kernel, so PRNG key semantics stay the
      engine's; the kernel does threshold-search top-k/top-p and an
      inverse-CDF draw — distribution-equivalent to ops.sampling, not
      draw-identical: categorical uses Gumbel noise, this uses inverse CDF);
    * project hidden 2048->1024 (f32, matches the XLA path exactly);
    * run the predictor's 16-token inner loop with its weights RESIDENT in
      VMEM as w4a8 (packed int4 halves the footprint so talker buffers +
      predictor weights coexist; Q4-class numerics like the reference's
      GGUFs, /root/reference/README.md:27) — lm-head codebook windows are
      double-buffer DMA'd per token (kernels/predictor_frame.py semantics);
    * assemble the feedback embedding: sum of 16 codec-table rows (aligned
      8-row window DMAs) + tts_pad (engine.rs:622-631).
  phases 1..G: the talker layer stack, lps layers per phase — the SAME
    schedule as kernels/talker_step.py (single-slot weight streaming,
    chunked flash attention with cross-layer KV prefetch), except the
    weight/KV DMA chains WRAP across frames (layer 0 of frame f+1 streams
    during frame f's expand phase), and chunk-local tokens (frames 0..f-1,
    not yet in the HBM cache) are attended from a VMEM side-cache.
    The final norm + 2160-row codec head run in-kernel at the last phase,
    leaving the next frame's logits in scratch.

Replaces the per-frame hot loop of the reference (engine.rs:545-642) and
of runtime/generate.gen_frames; outputs (codes, final logits/hidden, new
k/v rows) feed the same GenState plumbing.  Opt-out QTTS_FUSED_CHUNK=0
restores the per-kernel schedule; interpret-mode parity is tested in
tests/test_chunk_kernel.py (greedy codes exact vs the XLA chain on the
same quantized weights).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .talker_step import (INT4_GROUP, KV_CHUNK, NEG_INF, _blk_rms,
                          _blk_rotate_half, _qmm4, _rms, layers_per_step,
                          prep_layer_weights)

N_TOKENS = 16
V_CODEC = 2160                 # sampled logit range [0, 2160), prompt.rs:5-16
VP = 2176                      # padded to a lane multiple; cols >= 2160 masked


# --------------------------------------------------------------------------
# in-kernel sampling (see module docstring for the equivalence class)
# --------------------------------------------------------------------------
def _sample_inkernel(lg, u_col, temp, top_k, top_p):
    """lg [BP, VP] f32 with dead columns at NEG_INF; u_col [BP, 1] f32 in
    [0,1).  Returns [BP, 1] int32 codes.  Greedy (temp <= 0) matches
    jnp.argmax exactly (lowest-index tie-break); sampled mode draws from
    the temperature/top-k/top-p distribution of ops.sampling.sample_logits
    (threshold ties keep supersets; draw via inverse CDF)."""
    bp, vp = lg.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bp, vp), 1)
    m = jnp.max(lg, axis=1, keepdims=True)                       # [BP, 1]
    greedy = jnp.min(jnp.where(lg >= m, col, vp), axis=1,
                     keepdims=True)                              # [BP, 1]

    # top-k cut: bisect the k-th largest value (24 steps of f32 bisection)
    lo = jnp.full((bp, 1), -1e5, jnp.float32)
    hi = m
    top_kf = jnp.asarray(top_k, jnp.float32)
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((lg >= mid).astype(jnp.float32), axis=1,
                      keepdims=True)
        ge = cnt >= top_kf
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid)
    # logical-or instead of a boolean select: Mosaic has no legalization
    # for arith.select on i1 vectors (hardware-only failure)
    keep_k = (lg >= lo) | (top_kf <= 0)

    temp_c = jnp.maximum(jnp.asarray(temp, jnp.float32), 1e-6)
    scaled = jnp.where(keep_k, (lg - m) / temp_c, NEG_INF)
    e = jnp.exp(scaled)                       # top logit -> exp(0) = 1
    z = jnp.sum(e, axis=1, keepdims=True)
    p = e / z

    # nucleus cut: bisect the prob threshold where mass(p > q) crosses P
    plo = jnp.zeros((bp, 1), jnp.float32)
    phi = jnp.max(p, axis=1, keepdims=True)
    top_pf = jnp.asarray(top_p, jnp.float32)
    for _ in range(24):
        qmid = 0.5 * (plo + phi)
        mass = jnp.sum(jnp.where(p > qmid, p, 0.0), axis=1, keepdims=True)
        ge = mass >= top_pf
        plo = jnp.where(ge, qmid, plo)
        phi = jnp.where(ge, phi, qmid)
    final = jnp.where(keep_k & (p > plo), p, 0.0)

    tot = jnp.sum(final, axis=1, keepdims=True)
    target = u_col * tot
    # inverse CDF by bisection on the column index (prefix sums on demand)
    ilo = jnp.zeros((bp, 1), jnp.int32)            # invariant: cdf(ilo-1) <= t
    ihi = jnp.full((bp, 1), vp - 1, jnp.int32)     # cdf(ihi) > t
    for _ in range(12):                            # 2^12 > VP
        imid = (ilo + ihi) // 2
        pref = jnp.sum(jnp.where(col <= imid, final, 0.0), axis=1,
                       keepdims=True)
        gt = pref > target
        ihi = jnp.where(gt, imid, ihi)
        ilo = jnp.where(gt, ilo, imid + 1)
    sampled = ihi
    t_neg = jnp.asarray(temp, jnp.float32) <= 0.0
    return jnp.where(t_neg, greedy, sampled).astype(jnp.int32)


# --------------------------------------------------------------------------
# kernel body
# --------------------------------------------------------------------------
def _kernel(lengths_ref, start_ref,
            # SMEM
            sampler_ref, u_ref,
            # VMEM fixed
            logits0_ref, hidden0_ref, cos_ref, sin_ref,
            tln1, tln2, tqn, tkn, tseg_q, tseg_k,
            twqkv_s, two_s, tgu_s, tdn_s,          # streamed scale blocks
            tfn_ref, chead_q, chead_s, proj_w, proj_b, tts_pad_ref,
            pln1, pln2, pqn, pkn, pseg_q, pseg_k,
            pwqkv_s, pwo_s, pgu_s, pdn_s, pfn_ref, phead_s,
            pcos_ref, psin_ref,
            pwqkv_w, pwo_w, pgu_w, pdn_w,          # predictor w4a8 resident
            # ANY (HBM)
            twqkv_hbm, two_hbm, tgu_hbm, tdn_hbm,
            phead_hbm, ctab_fb_hbm, ctab_pred_hbm, k_hbm, v_hbm,
            # outputs
            codes_ref, logits_out, hidden_out, ktok_out, vtok_out,
            plog_out, pxt_out,
            # scratch
            x_sc, logits_sc, hidden_sc,
            k_sc, v_sc, q3_sc, kn3_sc, vn3_sc, ctx_sc,
            ck_sc, cv_sc,
            wqkv_buf, wo_buf, gu_buf, dn_buf,
            px_sc, pk_sc, pv_sc, pwin_sc, phw_sc, fbwin_sc, pcodes_sc,
            kv_sems, wsems, phsem, ptsem, fbsem,
            *, cfg_static, batched=False, ck=KV_CHUNK):
    (LT, B, BP, HT, HKVT, DHT, DT, EPS, CAP, PCAP,
     LP, PB, HP, HKVP, DHP, DP, F, lps, R_FB, R_PD) = cfg_static

    f = pl.program_id(0)
    p = pl.program_id(1)
    GT = LT // lps
    PT = 8 if B >= 24 else PB    # debug-tap lanes (must match _call)
    # Feedback-gather pipelining (r5): with a per-(lane, code) window
    # buffer, each code's 8-row feedback-table DMA issues the moment that
    # code is decided (q=0 after sampling, q>=1 inside the predictor token
    # loop), so the predictor's serial tail hides all B*16 gather
    # latencies and the assembly tail is waits + sums only.  Gated to
    # B <= 8: the [B, 16, 8, D] buffer costs B/2 MB of VMEM.
    fb_inloop = B <= 8

    rep = HT // HKVT
    dq = HT * DHT
    dkv = HKVT * DHT
    prep = HP // HKVP
    pdq = HP * DHP
    pdkv = HKVP * DHP

    start = start_ref[0]
    n_chunks = pl.cdiv(start, ck)

    # ---------------- talker weight / KV DMA plumbing (talker_step.py) ----
    def wdma(which, layer):
        hbm, buf = [(twqkv_hbm, wqkv_buf), (two_hbm, wo_buf),
                    (tgu_hbm, gu_buf), (tdn_hbm, dn_buf)][which]
        return pltpu.make_async_copy(hbm.at[layer], buf, wsems.at[which])

    def kv_dma_at(slot, ci, b, lyr):
        """Batched mode: lane b's chunk lands in its column block
        [b*ck, (b+1)*ck) of the fused-column scratch [HKV, B*ck, DH] —
        the flash loop scores ALL lanes with ONE masked dot per chunk
        (talker_step.py batched schedule)."""
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

    # ======================================================================
    # phase 0: sample + predictor + feedback  (also kicks the DMA chains)
    # ======================================================================
    @pl.when(p == 0)
    def _expand():
        # ---- chain starts: frame 0 boots the talker weight stream and the
        # KV prefetch; later frames' layer-0 DMAs were issued at the end of
        # the previous frame's last layer and span this whole phase.
        @pl.when(f == 0)
        def _():
            logits_sc[...] = logits0_ref[...]
            hidden_sc[...] = hidden0_ref[...]
            for w in range(4):
                wdma(w, 0).start()
            px_sc[...] = jnp.zeros_like(px_sc)
            # future frames' chunk-local KV columns are read (masked) by
            # earlier frames' correction loop — uninitialized VMEM would
            # poison the masked dots (0 * NaN)
            ck_sc[...] = jnp.zeros_like(ck_sc)
            cv_sc[...] = jnp.zeros_like(cv_sc)

            @pl.when(n_chunks > 0)
            def _():
                for b in range(B):
                    for dma in kv_dma_at(0 if batched else 2, 0, b, 0):
                        dma.start()

            @pl.when(n_chunks > 1)
            def _():
                for b in range(B):
                    for dma in kv_dma_at(1, 1, b, 0):
                        dma.start()

        # ---- sample code_0 (uniform u drawn outside; see module doc)
        lg = logits_sc[...]
        u_col = jnp.zeros((BP, 1), jnp.float32)
        bidx = jax.lax.broadcasted_iota(jnp.int32, (BP, 1), 0)
        for b in range(B):
            u_col = jnp.where(bidx == b, u_ref[f, b], u_col)
        c0 = _sample_inkernel(lg, u_col, sampler_ref[0, 0],
                              sampler_ref[0, 1], sampler_ref[0, 2])
        for b in range(B):
            codes_ref[b, f, 0] = c0[b, 0]
            pcodes_sc[b, 0] = c0[b, 0]
        if fb_inloop:
            for b in range(B):
                ci0 = jnp.clip(pcodes_sc[b, 0], 0, R_FB - 1)
                pltpu.make_async_copy(
                    ctab_fb_hbm.at[0, pl.ds((ci0 // 8) * 8, 8), :],
                    fbwin_sc.at[b, 0], fbsem.at[b, 0]).start()

        # ---- projection 2048 -> 1024 (f32 exact below b=24, matching
        # gen_frames; b >= 24 holds the 2048x1024 matrix as bf16 — half
        # the VMEM window, f32 accumulation, error ~1e-2 on h1024 which
        # is far above the model's own int4 weight quantization floor)
        pw = proj_w[...]
        if pw.dtype == jnp.float32:
            h1024 = jax.lax.dot_general(
                hidden_sc[...], pw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + proj_b[...]
        else:
            h1024 = jax.lax.dot_general(
                hidden_sc[...].astype(jnp.bfloat16), pw,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + proj_b[...]
        px = jnp.zeros((PB, DP), jnp.float32)
        pb_idx = jax.lax.broadcasted_iota(jnp.int32, (PB, DP), 0)
        for b in range(B):
            # static slice: b is a Python int; lax.dynamic_slice has no
            # Mosaic TC lowering (hardware-only failure, interpret passes)
            row = jax.lax.slice_in_dim(h1024, b, b + 1, axis=0)
            px = jnp.where(pb_idx == b, row, px)
        px_sc[...] = px.astype(jnp.bfloat16)

        # ---- predictor inner loop (kernels/predictor_frame.py semantics,
        # weights resident as w4a8, head windows double-buffer DMA'd)
        pk_sc[...] = jnp.zeros_like(pk_sc)
        pv_sc[...] = jnp.zeros_like(pv_sc)
        pltpu.make_async_copy(phead_hbm.at[pl.ds(0, 2048), :],
                              phw_sc.at[0], phsem.at[0]).start()

        def p_token(t, _):
            def p_layer(l, x):
                hn = _rms(x, pln1[l, 0], EPS).astype(jnp.bfloat16)
                qkv = _qmm4(hn, pwqkv_w.at[l], pwqkv_s[l])
                q = qkv[:, :pdq]
                k = qkv[:, pdq: pdq + pdkv]
                v = qkv[:, pdq + pdkv:]
                q = _blk_rms(q, pqn[l, 0], pseg_q[...], DHP,
                             EPS).astype(jnp.bfloat16)
                k = _blk_rms(k, pkn[l, 0], pseg_k[...], DHP,
                             EPS).astype(jnp.bfloat16)
                cos_q = pcos_ref[pl.ds(t, 1), :pdq]
                sin_q = psin_ref[pl.ds(t, 1), :pdq]
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                q = (qf * cos_q
                     + _blk_rotate_half(qf, DHP) * sin_q
                     ).astype(jnp.bfloat16)
                k = (kf * cos_q[:, :pdkv]
                     + _blk_rotate_half(kf, DHP) * sin_q[:, :pdkv]
                     ).astype(jnp.bfloat16)
                pk_sc[l, t] = k
                pv_sc[l, t] = v
                ks = pk_sc[l].astype(jnp.float32)          # [S, PB, pdkv]
                vs = pv_sc[l].astype(jnp.float32)
                kh = jnp.concatenate([ks] * prep, axis=-1)  # [S, PB, pdq]
                vh = jnp.concatenate([vs] * prep, axis=-1)
                prod = q.astype(jnp.float32)[None, :, :] * kh
                scores = jax.lax.dot_general(
                    prod, pseg_q[...], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * (DHP ** -0.5)
                s_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                scores = jnp.where(s_ids <= t, scores, -1e30)
                probs = jax.nn.softmax(scores, axis=0)
                pexp = jax.lax.dot_general(
                    probs, pseg_q[...], (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ctx = jnp.sum(pexp * vh, axis=0)
                x = x + _qmm4(ctx.astype(jnp.bfloat16), pwo_w.at[l],
                              pwo_s[l])
                hn2 = _rms(x, pln2[l, 0], EPS).astype(jnp.bfloat16)
                gup = _qmm4(hn2, pgu_w.at[l], pgu_s[l])
                f_half = gup.shape[-1] // 2
                gf = gup[:, :f_half].astype(jnp.float32)
                ff = (gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) \
                    * gup[:, f_half:]
                x = x + _qmm4(ff, pdn_w.at[l], pdn_s[l])
                return x

            x = jax.lax.fori_loop(0, LP, p_layer, px_sc[...])
            px_after = x
            # debug tap (PT <= PB lanes: b >= 24 slims the f32 tap windows
            # to the first 8 lanes — 6.4 MB of VMEM at PB=32 otherwise)
            pxt_out[t] = x[:PT].astype(jnp.float32)

            @pl.when(t >= 1)
            def _():
                # logits for codebook window t-1 (slot parity (t-1) % 2)
                pltpu.make_async_copy(
                    phead_hbm.at[pl.ds(0, 2048), :],
                    phw_sc.at[jax.lax.rem(t - 1, 2)],
                    phsem.at[jax.lax.rem(t - 1, 2)]).wait()
                hf = _rms(px_after, pfn_ref[0], EPS).astype(jnp.bfloat16)
                win = phw_sc[jax.lax.rem(t - 1, 2)]
                logits = jax.lax.dot_general(
                    hf, win.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    * phead_s[t - 1, 0].astype(jnp.float32)   # [PB, 2048]
                ccol = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                cm = jnp.max(logits, axis=1, keepdims=True)
                carg = jnp.min(jnp.where(logits >= cm, ccol, 2048), axis=1)
                for b in range(B):
                    codes_ref[b, f, t] = carg[b]
                for b in range(PB):
                    pcodes_sc[b, t] = carg[b]
                if fb_inloop:
                    for b in range(B):
                        ci = jnp.clip(pcodes_sc[b, t], 0, R_FB - 1)
                        pltpu.make_async_copy(
                            ctab_fb_hbm.at[t, pl.ds((ci // 8) * 8, 8), :],
                            fbwin_sc.at[b, t], fbsem.at[b, t]).start()
                plog_out[t] = logits[:PT]              # debug tap

                @pl.when(t < N_TOKENS - 1)
                def _():
                    pltpu.make_async_copy(
                        phead_hbm.at[pl.ds(t * 2048, 2048), :],
                        phw_sc.at[jax.lax.rem(t, 2)],
                        phsem.at[jax.lax.rem(t, 2)]).start()

            # next token embedding from tables[t][code_t]
            @pl.when(t < N_TOKENS - 1)
            def _():
                for b in range(PB):
                    ci = jnp.clip(pcodes_sc[b, t], 0, R_PD - 1)
                    aligned = (ci // 8) * 8
                    pltpu.make_async_copy(
                        ctab_pred_hbm.at[t, pl.ds(aligned, 8), :],
                        pwin_sc.at[b], ptsem.at[b]).start()
                for b in range(PB):
                    pltpu.make_async_copy(
                        ctab_pred_hbm.at[t, pl.ds(0, 8), :],
                        pwin_sc.at[b], ptsem.at[b]).wait()
                row = jax.lax.broadcasted_iota(jnp.int32, (PB, 8, DP), 1)
                off = jnp.zeros((PB, 1, 1), jnp.int32)
                bi3 = jax.lax.broadcasted_iota(jnp.int32, (PB, 1, 1), 0)
                for b in range(PB):
                    off = jnp.where(bi3 == b,
                                    jnp.clip(pcodes_sc[b, t], 0,
                                             R_PD - 1) % 8, off)
                sel = jnp.where(row == off,
                                pwin_sc[...].astype(jnp.float32), 0.0)
                px_sc[...] = jnp.sum(sel, axis=1).astype(px_sc.dtype)
            return 0

        jax.lax.fori_loop(0, N_TOKENS, p_token, 0)

        # ---- feedback = sum_q ctab_fb[q][code_q] + tts_pad  (per lane)
        if fb_inloop:
            # windows were DMA'd as the codes were decided (above); only
            # the waits and masked sums remain here
            for b in range(B):
                for q in range(N_TOKENS):
                    pltpu.make_async_copy(
                        ctab_fb_hbm.at[q, pl.ds(0, 8), :],
                        fbwin_sc.at[b, q], fbsem.at[b, q]).wait()
            for b in range(B):
                row = jax.lax.broadcasted_iota(jnp.int32,
                                               (N_TOKENS, 8, DT), 1)
                off = jnp.zeros((N_TOKENS, 1, 1), jnp.int32)
                qi3 = jax.lax.broadcasted_iota(jnp.int32,
                                               (N_TOKENS, 1, 1), 0)
                for q in range(N_TOKENS):
                    off = jnp.where(qi3 == q,
                                    jnp.clip(pcodes_sc[b, q], 0,
                                             R_FB - 1) % 8,
                                    off)
                sel = jnp.where(row == off,
                                fbwin_sc[b].astype(jnp.float32), 0.0)
                fb = jnp.sum(sel, axis=(0, 1)) + tts_pad_ref[0]
                # static per-row store (see the relayout note below)
                if b == 0:
                    x_sc[...] = jnp.zeros((BP, DT), jnp.bfloat16)
                x_sc[b, :] = fb.astype(jnp.bfloat16)
        else:
            for b in range(B):
                for q in range(N_TOKENS):
                    ci = jnp.clip(pcodes_sc[b, q], 0, R_FB - 1)
                    aligned = (ci // 8) * 8
                    pltpu.make_async_copy(
                        ctab_fb_hbm.at[q, pl.ds(aligned, 8), :],
                        fbwin_sc.at[q], fbsem.at[q]).start()
                for q in range(N_TOKENS):
                    pltpu.make_async_copy(
                        ctab_fb_hbm.at[q, pl.ds(0, 8), :],
                        fbwin_sc.at[q], fbsem.at[q]).wait()
                row = jax.lax.broadcasted_iota(jnp.int32,
                                               (N_TOKENS, 8, DT), 1)
                off = jnp.zeros((N_TOKENS, 1, 1), jnp.int32)
                qi3 = jax.lax.broadcasted_iota(jnp.int32,
                                               (N_TOKENS, 1, 1), 0)
                for q in range(N_TOKENS):
                    off = jnp.where(qi3 == q,
                                    jnp.clip(pcodes_sc[b, q], 0,
                                             R_FB - 1) % 8,
                                    off)
                sel = jnp.where(row == off,
                                fbwin_sc[...].astype(jnp.float32), 0.0)
                fb = jnp.sum(sel, axis=(0, 1)) + tts_pad_ref[0]   # [DT] f32
                # static per-row store: a bf16 jnp.where with a broadcast
                # i1 mask hits an unimplemented Mosaic relayout on
                # hardware ("replicated in destination but not in
                # source", (8,128) i1 -> (16,128)); interpret mode can't
                # see it.  b is a Python int, so write the one row
                # directly.
                if b == 0:
                    x_sc[...] = jnp.zeros((BP, DT), jnp.bfloat16)
                x_sc[b, :] = fb.astype(jnp.bfloat16)

    # ======================================================================
    # phases 1..GT: talker layers (talker_step.py schedule + chunk-local KV)
    # ======================================================================
    @pl.when(p > 0)
    def _talker():
        g = p - 1

        def layer_iter(li, x):
            l = g * lps + li

            def _mlp_tail(x, l, li):
                wdma(2, l).wait()
                hn2 = _rms(x, tln2[l], EPS).astype(jnp.bfloat16)
                gup = _qmm4(hn2, gu_buf, tgu_s[li])
                nl = jax.lax.rem(l + 1, LT)

                @pl.when((l + 1 < LT) | (f < F - 1))
                def _():
                    wdma(2, nl).start()

                f_half = gup.shape[-1] // 2
                gf = gup[:, :f_half].astype(jnp.float32)
                ff = (gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) \
                    * gup[:, f_half:]
                wdma(3, l).wait()
                x = x + _qmm4(ff, dn_buf, tdn_s[li])

                @pl.when((l + 1 < LT) | (f < F - 1))
                def _():
                    wdma(3, nl).start()
                return x

            # ---- qkv
            wdma(0, l).wait()
            hn = _rms(x, tln1[l], EPS).astype(jnp.bfloat16)
            qkv = _qmm4(hn, wqkv_buf, twqkv_s[li])
            nl = jax.lax.rem(l + 1, LT)

            @pl.when((l + 1 < LT) | (f < F - 1))
            def _():
                wdma(0, nl).start()

            q = qkv[:, :dq]
            k = qkv[:, dq: dq + dkv]
            v = qkv[:, dq + dkv:]
            q = _blk_rms(q, tqn[l], tseg_q[...], DHT,
                         EPS).astype(jnp.bfloat16)
            k = _blk_rms(k, tkn[l], tseg_k[...], DHT,
                         EPS).astype(jnp.bfloat16)
            # [BP, dq]; f32 below b=24, bf16 window at b >= 24 (VMEM)
            cos_q = cos_ref[f].astype(jnp.float32)
            sin_q = sin_ref[f].astype(jnp.float32)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos_q
                 + _blk_rotate_half(qf, DHT) * sin_q).astype(jnp.bfloat16)
            k = (kf * cos_q[:, :dkv]
                 + _blk_rotate_half(kf, DHT) * sin_q[:, :dkv]
                 ).astype(jnp.bfloat16)

            for j in range(HKVT):
                for c in range(rep):
                    h = j * rep + c
                    q3_sc[j, c * BP:(c + 1) * BP] = q[:, h * DHT:(h + 1) * DHT]
                kn3_sc[j] = k[:, j * DHT:(j + 1) * DHT]
                vn3_sc[j] = v[:, j * DHT:(j + 1) * DHT]

            # this frame's k/v: per-layer kernel output + chunk-local cache
            ktok_out[0, li] = kn3_sc[...]
            vtok_out[0, li] = vn3_sc[...]
            ck_sc[l, f] = kn3_sc[...]
            cv_sc[l, f] = vn3_sc[...]

            q3 = q3_sc[...].astype(jnp.float32) * (DHT ** -0.5)

            if batched:
                # ---- batched flash loop (talker_step.py): ONE masked dot
                # over the fused-column scratch per chunk; bf16 q/k with
                # f32 MXU accumulation, p rounds to bf16 for the pv dot.
                cols = B * ck
                c_ind = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cols), 2)
                collane = c_ind // ck
                colpos0 = c_ind % ck
                lenrow = jnp.zeros((1, 1, cols), jnp.int32)
                for b in range(B):
                    lenrow = jnp.where(collane == b, lengths_ref[b], lenrow)
                rowlane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, rep * BP, 1), 1) % BP
                lane_match = rowlane == collane
                q3b = q3_sc[...]                       # bf16 [HKVT, rB, DHT]
                inv_sqrt_dh = DHT ** -0.5

                def chunk_body(ci, carry):
                    m, s_sum, acc = carry
                    slot = jax.lax.rem(ci, 2)
                    nslot = jax.lax.rem(ci + 1, 2)

                    # chunks 0 AND 1 are cross-layer-prefetched (the 2B
                    # per-chunk DMA issues are the dominant per-layer
                    # fixed cost at batch — issue them a whole layer
                    # early); the intra-layer pipeline starts at chunk 2
                    @pl.when(jnp.logical_and(ci + 1 < n_chunks, ci >= 1))
                    def _():
                        for b in range(B):
                            for dma in kv_dma_at(nslot, ci + 1, b, l):
                                dma.start()
                    for b in range(B):
                        for dma in kv_dma_at(slot, ci, b, l):
                            dma.wait()
                    ks = k_sc[slot]                    # bf16 [HKVT, cols, DHT]
                    vs = v_sc[slot]
                    sb = jax.lax.dot_general(
                        q3b, ks, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) * inv_sqrt_dh
                    cpos = ci * ck + colpos0
                    valid = lane_match & ((cpos < lenrow)
                                          | ((cpos >= PCAP) & (cpos < start)))
                    sb = jnp.where(valid, sb, NEG_INF)
                    mb = jnp.maximum(m, jnp.max(sb, axis=2, keepdims=True))
                    pe = jnp.exp(sb - mb)
                    alpha = jnp.exp(m - mb)
                    acc_n = acc * alpha + jax.lax.dot_general(
                        pe.astype(jnp.bfloat16), vs,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s_n = s_sum * alpha + jnp.sum(pe, axis=2, keepdims=True)
                    return mb, s_n, acc_n
            else:
                def chunk_body(ci, carry):
                    m, s_sum, acc = carry
                    slot = jnp.where(ci == 0, 2, jax.lax.rem(ci, 2))
                    nslot = jax.lax.rem(ci + 1, 2)

                    @pl.when(jnp.logical_and(ci + 1 < n_chunks, ci >= 1))
                    def _():
                        for b in range(B):
                            for dma in kv_dma_at(nslot, ci + 1, b, l):
                                dma.start()

                    for b in range(B):
                        for dma in kv_dma_at(slot, ci, b, l):
                            dma.wait()

                    ks = k_sc[slot].astype(jnp.float32)
                    vs = v_sc[slot].astype(jnp.float32)
                    c_idx = ci * ck + jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, ck), 2)
                    m_new, s_new, acc_new = m, s_sum, acc
                    for b in range(B):
                        sb = jax.lax.dot_general(
                            q3, ks[b], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        valid = (c_idx < lengths_ref[b]) | \
                            ((c_idx >= PCAP) & (c_idx < start))
                        sb = jnp.where(valid, sb, NEG_INF)
                        rowb = jax.lax.broadcasted_iota(
                            jnp.int32, sb.shape, 1) % BP == b
                        sb = jnp.where(rowb, sb, NEG_INF)
                        mb = jnp.maximum(m, jnp.max(sb, axis=2,
                                                    keepdims=True))
                        pe = jnp.exp(sb - mb)
                        alpha = jnp.exp(m - mb)
                        ab = acc * alpha + jax.lax.dot_general(
                            pe, vs[b], (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        sb_sum = s_sum * alpha + jnp.sum(pe, axis=2,
                                                         keepdims=True)
                        m_new = jnp.where(rowb[:, :, :1], mb, m_new)
                        s_new = jnp.where(rowb[:, :, :1], sb_sum, s_new)
                        acc_new = jnp.where(rowb[:, :, :1], ab, acc_new)
                    return m_new, s_new, acc_new

            rB = rep * BP
            m0 = jnp.full((HKVT, rB, 1), NEG_INF, jnp.float32)
            s0 = jnp.zeros((HKVT, rB, 1), jnp.float32)
            a0 = jnp.zeros((HKVT, rB, DHT), jnp.float32)
            m, s_sum, acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                              (m0, s0, a0))

            # cross-layer/frame KV prefetch for the NEXT layer (wraps to
            # layer 0 of the next frame; the wrapped DMAs span the whole
            # expand phase of frame f+1).  Batched mode has 2 KV slots:
            # only chunk 0 crosses layers (slot 0 is free once the loop
            # above has consumed every chunk).
            nxt_exists = (l + 1 < LT) | (f < F - 1)

            @pl.when(jnp.logical_and(nxt_exists, n_chunks > 0))
            def _():
                for b in range(B):
                    for dma in kv_dma_at(0 if batched else 2, 0, b, nl):
                        dma.start()

            @pl.when(jnp.logical_and(nxt_exists, n_chunks > 1))
            def _():
                for b in range(B):
                    for dma in kv_dma_at(1, 1, b, nl):
                        dma.start()

            # chunk-local columns: frames 0..f of THIS chunk (frame f's own
            # token was written above — always self-visible; earlier frames
            # gated by ff <= f).  ONE masked dot over all F frames' tokens
            # + ONE online-softmax merge (r5: the per-ff loop ran F separate
            # dot/mask/exp/merge passes per layer — 28*(F-1) extra serial
            # vector-op groups per frame; column c = ff*BP + lane).
            kn_all = jnp.concatenate(
                [ck_sc[l, ff] for ff in range(F)],
                axis=1).astype(jnp.float32)              # [HKVT, F*BP, DHT]
            vn_all = jnp.concatenate(
                [cv_sc[l, ff] for ff in range(F)],
                axis=1).astype(jnp.float32)
            sc_all = jax.lax.dot_general(
                q3, kn_all, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [HKVT, rB, F*BP]
            rowm = jax.lax.broadcasted_iota(jnp.int32, sc_all.shape, 1) % BP
            colm = jax.lax.broadcasted_iota(jnp.int32, sc_all.shape, 2)
            sel = (rowm == colm % BP) & ((colm // BP) <= f)
            sc_all = jnp.where(sel, sc_all, NEG_INF)
            m_f = jnp.maximum(m, jnp.max(sc_all, axis=2, keepdims=True))
            p_cur = jnp.exp(sc_all - m_f)                # masked cols -> 0
            alpha = jnp.exp(m - m_f)
            pv = jax.lax.dot_general(
                p_cur, vn_all, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
            s_sum = s_sum * alpha + jnp.sum(p_cur, axis=2, keepdims=True)
            ctx3 = acc / jnp.maximum(s_sum, 1e-30)

            for j in range(HKVT):
                for c in range(rep):
                    h = j * rep + c
                    ctx_sc[:, h * DHT:(h + 1) * DHT] = \
                        ctx3[j, c * BP:(c + 1) * BP].astype(jnp.float32)
            ctx = ctx_sc[...]

            wdma(1, l).wait()
            x = x + _qmm4(ctx.astype(jnp.bfloat16), wo_buf, two_s[li])

            @pl.when((l + 1 < LT) | (f < F - 1))
            def _():
                wdma(1, nl).start()
            return _mlp_tail(x, l, li)

        x = jax.lax.fori_loop(0, lps, layer_iter, x_sc[...])
        x_sc[...] = x

        # ---- tail: final norm + codec head -> next frame's logits
        @pl.when(p == GT)
        def _():
            hpost = _rms(x, tfn_ref[0], EPS)                 # [BP, DT] f32
            hidden_sc[...] = hpost
            lg = jax.lax.dot_general(
                hpost.astype(jnp.bfloat16), chead_q[...].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) \
                * chead_s[...].astype(jnp.float32)           # [BP, VP]
            ccol = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
            logits_sc[...] = jnp.where(ccol < V_CODEC, lg, NEG_INF)

            @pl.when(f == F - 1)
            def _():
                logits_out[...] = logits_sc[...]
                hidden_out[...] = hidden_sc[...]


# --------------------------------------------------------------------------
# pallas_call plumbing
# --------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("cfg_static", "interpret"))
def _call(logits0, hidden0, cos, sin, layer_w, pred_w, extras,
          k_cache, v_cache, lengths, start, u, sampler_vec,
          cfg_static, interpret=False):
    (LT, B, BP, HT, HKVT, DHT, DT, EPS, CAP, PCAP,
     LP, PB, HP, HKVP, DHP, DP, F, lps, R_FB, R_PD) = cfg_static
    GT = LT // lps
    PT = 8 if B >= 24 else PB    # debug-tap lanes (must match _kernel)
    rep = HT // HKVT
    dq = HT * DHT
    dkv = HKVT * DHT
    pdq = HP * DHP
    d_ff2 = layer_w["gu_q"].shape[-1]
    rows_qkv = layer_w["wqkv_q"].shape[-2]
    rows_wo = layer_w["wo_q"].shape[-2]
    rows_gu = layer_w["gu_q"].shape[-2]
    rows_dn = layer_w["dn_q"].shape[-2]
    qkv_out = layer_w["wqkv_q"].shape[-1]
    pd_ff2 = pred_w["gu_q"].shape[-1]
    p_rows_qkv = pred_w["wqkv_q"].shape[-2]
    p_rows_wo = pred_w["wo_q"].shape[-2]
    p_rows_gu = pred_w["gu_q"].shape[-2]
    p_rows_dn = pred_w["dn_q"].shape[-2]
    p_qkv_out = pred_w["wqkv_q"].shape[-1]

    # Batched mode (B > 4): fused-column KV scratch (2 slots), one masked
    # dot per chunk; ck shrinks with B to hold the VMEM budget
    # (talker_step.py batched schedule).  The chunk program carries more
    # VMEM residents than the lone talker kernel (predictor stack, chunk-
    # local KV, Mosaic's double-buffered scale blocks — measured b=8 OOM
    # at 120.7 MB with ck=256/lps=7), so batched mode uses the smaller
    # 1024//B chunk and the caller clamps lps (gen_chunk_fused).
    batched = B > 4
    ck = max(128, 2048 // B) if batched else KV_CHUNK
    if batched and B >= 24:
        # b=24/32: ck=128 would put B*ck=4096 fused columns = 32 MB of KV
        # slots — measured 150.9 MB total at F=1, 22.9 over the 128 MB
        # ceiling; ck=64 still left the F=4 serving program 5.7 MB over.
        # ck=32 (8 MB of slots) fits with the bf16 proj/rope windows; the
        # per-chunk DMA issue count doubles twice vs b=16, which the
        # measured number absorbs (QTTS_CHUNK_CK probes the tradeoff).
        ck = int(os.environ.get("QTTS_CHUNK_CK", "32"))
    kv_slots = 2 if batched else 3
    cap_pad = ((CAP + ck - 1) // ck) * ck
    k_in, v_in = k_cache, v_cache
    if cap_pad != CAP:
        pad = [(0, 0), (0, 0), (0, 0), (0, cap_pad - CAP), (0, 0)]
        k_in = jnp.pad(k_cache, pad)
        v_in = jnp.pad(v_cache, pad)

    fixed = lambda shape, space=pltpu.VMEM: pl.BlockSpec(
        shape, lambda f_, p_, *_: (0,) * len(shape), memory_space=space)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    # talker scale blocks stream per phase (same block for p=0 and p=1)
    tscale = lambda arr: pl.BlockSpec(
        (lps,) + arr.shape[1:],
        lambda f_, p_, *_: (jnp.maximum(p_ - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    tokblk = lambda: pl.BlockSpec(
        (1, lps, HKVT, BP, DHT),
        lambda f_, p_, *_: (f_, jnp.maximum(p_ - 1, 0), 0, 0, 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, cfg_static=cfg_static,
                               batched=batched, ck=ck)

    codes, logits_out, hidden_out, k_tok, v_tok, plog, pxt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(F, GT + 1),
            in_specs=[
                fixed((1, 4), pltpu.SMEM),                # sampler
                fixed((F, B), pltpu.SMEM),                # u
                fixed((BP, VP)),                          # logits0
                fixed((BP, DT)),                          # hidden0
                fixed((F, BP, dq)),                       # cos
                fixed((F, BP, dq)),                       # sin
                fixed((LT, DT)),                          # tln1
                fixed((LT, DT)),                          # tln2
                fixed((LT, dq)),                          # tqn
                fixed((LT, dkv)),                         # tkn
                fixed((dq, HT)),                          # tseg_q
                fixed((dkv, HKVT)),                       # tseg_k
                tscale(layer_w["wqkv_s"]),
                tscale(layer_w["wo_s"]),
                tscale(layer_w["gu_s"]),
                tscale(layer_w["dn_s"]),
                fixed((1, DT)),                           # talker final norm
                fixed((VP, DT)),                          # codec head int8
                fixed((1, VP)),                           # codec head scales
                fixed((DT, DP)),                          # proj (f32/bf16)
                fixed((1, DP)),                           # proj bias
                fixed((1, DT)),                           # tts_pad
                fixed((LP, 1, DP)),                       # pln1
                fixed((LP, 1, DP)),                       # pln2
                fixed((LP, 1, pdq)),                      # pqn
                fixed((LP, 1, HKVP * DHP)),               # pkn
                fixed((pdq, HP)),                         # pseg_q
                fixed((HKVP * DHP, HKVP)),                # pseg_k
                fixed(pred_w["wqkv_s"].shape),            # predictor scales
                fixed(pred_w["wo_s"].shape),
                fixed(pred_w["gu_s"].shape),
                fixed(pred_w["dn_s"].shape),
                fixed((1, DP)),                           # predictor f-norm
                fixed((15, 1, 2048)),                     # predictor head s
                fixed((N_TOKENS, pdq)),                   # pcos
                fixed((N_TOKENS, pdq)),                   # psin
                fixed((LP, p_rows_qkv, p_qkv_out)),       # pred w4a8 resident
                fixed((LP, p_rows_wo, DP)),
                fixed((LP, p_rows_gu, pd_ff2)),
                fixed((LP, p_rows_dn, DP)),
                hbm, hbm, hbm, hbm,                       # talker weights
                hbm,                                      # predictor head
                hbm,                                      # feedback tables
                hbm,                                      # predictor tables
                hbm, hbm,                                 # k/v cache
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),    # codes
                fixed((BP, VP)),                          # final logits
                fixed((BP, DT)),                          # final hidden
                tokblk(),                                 # k_tok
                tokblk(),                                 # v_tok
                fixed((N_TOKENS, PT, 2048)),              # predictor taps
                fixed((N_TOKENS, PT, DP)),                # x-after-layers taps
            ],
            scratch_shapes=[
                pltpu.VMEM((BP, DT), jnp.bfloat16),       # x residual
                pltpu.VMEM((BP, VP), jnp.float32),        # logits carry
                pltpu.VMEM((BP, DT), jnp.float32),        # hidden carry
                (pltpu.VMEM((kv_slots, HKVT, B * ck, DHT), jnp.bfloat16)
                 if batched
                 else pltpu.VMEM((kv_slots, B, HKVT, ck, DHT),
                                 jnp.bfloat16)),
                (pltpu.VMEM((kv_slots, HKVT, B * ck, DHT), jnp.bfloat16)
                 if batched
                 else pltpu.VMEM((kv_slots, B, HKVT, ck, DHT),
                                 jnp.bfloat16)),
                pltpu.VMEM((HKVT, rep * BP, DHT), jnp.bfloat16),   # q3
                pltpu.VMEM((HKVT, BP, DHT), jnp.bfloat16),         # k new
                pltpu.VMEM((HKVT, BP, DHT), jnp.bfloat16),         # v new
                pltpu.VMEM((BP, dq), jnp.float32),                 # ctx
                pltpu.VMEM((LT, F, HKVT, BP, DHT), jnp.bfloat16),  # chunk K
                pltpu.VMEM((LT, F, HKVT, BP, DHT), jnp.bfloat16),  # chunk V
                pltpu.VMEM((rows_qkv, qkv_out), jnp.int8),
                pltpu.VMEM((rows_wo, DT), jnp.int8),
                pltpu.VMEM((rows_gu, d_ff2), jnp.int8),
                pltpu.VMEM((rows_dn, DT), jnp.int8),
                pltpu.VMEM((PB, DP), jnp.bfloat16),       # predictor x
                pltpu.VMEM((LP, N_TOKENS, PB, HKVP * DHP), jnp.bfloat16),
                pltpu.VMEM((LP, N_TOKENS, PB, HKVP * DHP), jnp.bfloat16),
                pltpu.VMEM((PB, 8, DP), jnp.bfloat16),    # pred table window
                pltpu.VMEM((2, 2048, DP), jnp.int8),      # pred head slots
                (pltpu.VMEM((B, N_TOKENS, 8, DT), extras["ctab_fb"].dtype)
                 if B <= 8 else
                 pltpu.VMEM((N_TOKENS, 8, DT),
                            extras["ctab_fb"].dtype)),    # feedback windows
                pltpu.SMEM((PB, N_TOKENS), jnp.int32),    # frame codes
                pltpu.SemaphoreType.DMA((kv_slots, B, 2)),  # talker KV
                pltpu.SemaphoreType.DMA((4,)),            # talker weights
                pltpu.SemaphoreType.DMA((2,)),            # pred head slots
                pltpu.SemaphoreType.DMA((PB,)),           # pred tables
                (pltpu.SemaphoreType.DMA((B, N_TOKENS)) if B <= 8
                 else pltpu.SemaphoreType.DMA((N_TOKENS,))),  # fb tables
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, F, N_TOKENS), jnp.int32),
            jax.ShapeDtypeStruct((BP, VP), jnp.float32),
            jax.ShapeDtypeStruct((BP, DT), jnp.float32),
            jax.ShapeDtypeStruct((F, LT, HKVT, BP, DHT), jnp.bfloat16),
            jax.ShapeDtypeStruct((F, LT, HKVT, BP, DHT), jnp.bfloat16),
            jax.ShapeDtypeStruct((N_TOKENS, PT, 2048), jnp.float32),
            jax.ShapeDtypeStruct((N_TOKENS, PT, DP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(126 if batched else 120) * 1024 * 1024),
        interpret=interpret,
    )(lengths.astype(jnp.int32), jnp.reshape(start, (1,)).astype(jnp.int32),
      sampler_vec, u,
      logits0, hidden0,
      cos.astype(jnp.bfloat16) if B >= 24 else cos,
      sin.astype(jnp.bfloat16) if B >= 24 else sin,
      layer_w["ln1"], layer_w["ln2"], layer_w["qn"], layer_w["kn"],
      layer_w["seg_q"], layer_w["seg_k"],
      layer_w["wqkv_s"], layer_w["wo_s"], layer_w["gu_s"], layer_w["dn_s"],
      extras["tfn"], extras["chead_q"], extras["chead_s"],
      (extras["proj_w"].astype(jnp.bfloat16) if B >= 24
       else extras["proj_w"]),
      extras["proj_b"], extras["tts_pad"],
      pred_w["ln1"], pred_w["ln2"], pred_w["qn"], pred_w["kn"],
      pred_w["seg_q"], pred_w["seg_k"],
      pred_w["wqkv_s"], pred_w["wo_s"], pred_w["gu_s"], pred_w["dn_s"],
      extras["pfn"], extras["phead_s"], extras["pcos"], extras["psin"],
      pred_w["wqkv_q"], pred_w["wo_q"], pred_w["gu_q"], pred_w["dn_q"],
      layer_w["wqkv_q"], layer_w["wo_q"], layer_w["gu_q"], layer_w["dn_q"],
      extras["phead_q"], extras["ctab_fb"], extras["ctab_pred"],
      k_in, v_in)

    # scatter the F new tokens' k/v into the cache (one fused slice update)
    k_tok = jnp.transpose(k_tok, (1, 3, 2, 0, 4))[:, :B]   # [L, B, HKV, F, DH]
    v_tok = jnp.transpose(v_tok, (1, 3, 2, 0, 4))[:, :B]
    start_i = jnp.asarray(start, jnp.int32)
    k_new = jax.lax.dynamic_update_slice(
        k_cache, k_tok.astype(k_cache.dtype), (0, 0, 0, start_i, 0))
    v_new = jax.lax.dynamic_update_slice(
        v_cache, v_tok.astype(v_cache.dtype), (0, 0, 0, start_i, 0))
    return codes, logits_out[:B], hidden_out[:B], k_new, v_new, (plog, pxt)


# --------------------------------------------------------------------------
# weight prep
# --------------------------------------------------------------------------
def _head_perm(H, HKV, DH):
    rep = H // HKV
    heads = [rep * (i % HKV) + (i // HKV) for i in range(H)]
    return np.concatenate([np.arange(DH) + h * DH for h in heads])


def _seg_matrix(n_heads, dh):
    seg = np.zeros((n_heads * dh, n_heads), np.float32)
    for h in range(n_heads):
        seg[h * dh:(h + 1) * dh, h] = 1.0
    return seg


def _pack_w4(w):
    """[L, K, N] (f32/int8-quantized) -> half-split packed int4 + grouped
    f32 scales, exactly like talker_step.prep_layer_weights's qs4."""
    from ..ops.quant import is_quantized
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
    packed = jnp.bitwise_or(jnp.bitwise_and(q[:, : K // 2], 0x0F),
                            jnp.left_shift(q[:, K // 2:], 4)).astype(jnp.int8)
    return packed, scale[:, :, 0, :].astype(jnp.float32)


def prep_predictor_w4(cfg, params) -> Dict[str, Any]:
    """Predictor layer stack in the chunk kernel's resident form: q-head
    permuted (grouped GQA order, see kernels/predictor_frame.py), w4a8
    half-split packed weights + grouped scales, tiled per-head norms."""
    lw = params["layers"]
    H, HKV, DH = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    dq = H * DH
    perm = jnp.asarray(_head_perm(H, HKV, DH))
    from ..ops.quant import is_quantized

    def deq(w):
        if is_quantized(w):
            return (w["q"].astype(jnp.float32)
                    * w["s"][:, None, :].astype(jnp.float32))
        return w.astype(jnp.float32)

    wqkv = deq(lw["wqkv"])
    wqkv = jnp.concatenate([wqkv[..., :, perm], wqkv[..., dq:]], -1)
    wo = deq(lw["wo"])[..., perm, :]

    wqkv_q, wqkv_s = _pack_w4(wqkv)
    wo_q, wo_s = _pack_w4(wo)
    gu_q, gu_s = _pack_w4(lw["w_gate_up"])
    dn_q, dn_s = _pack_w4(lw["w_down"])

    def mid(a):
        return a[:, None, :]

    return {
        "ln1": mid(lw["ln1"].astype(jnp.float32)),
        "ln2": mid(lw["ln2"].astype(jnp.float32)),
        "qn": mid(jnp.tile(lw["q_norm"].astype(jnp.float32), (1, H))),
        "kn": mid(jnp.tile(lw["k_norm"].astype(jnp.float32), (1, HKV))),
        "seg_q": jnp.asarray(_seg_matrix(H, DH)),
        "seg_k": jnp.asarray(_seg_matrix(HKV, DH)),
        "wqkv_q": wqkv_q, "wqkv_s": wqkv_s,
        "wo_q": wo_q, "wo_s": wo_s,
        "gu_q": gu_q, "gu_s": gu_s,
        "dn_q": dn_q, "dn_s": dn_s,
    }


def prep_chunk_extras(tcfg, pcfg, talker_params, predictor_params,
                      assets_pack) -> Dict[str, Any]:
    """Static (per-engine) kernel inputs beyond the two layer stacks."""
    from ..ops.quant import is_quantized, quantize_head
    from ..ops.rope import inv_frequencies

    head = talker_params["codec_head"]
    if not is_quantized(head):
        head = quantize_head(head)
    hq, hs = head["q"], head["s"]
    v = hq.shape[0]
    assert v >= V_CODEC, v
    hq = hq[:V_CODEC]
    hs = hs[:V_CODEC]
    if VP != V_CODEC:
        hq = jnp.pad(hq, ((0, VP - V_CODEC), (0, 0)))
        hs = jnp.pad(hs, ((0, VP - V_CODEC),))

    phead = predictor_params["lm_head"]
    if not is_quantized(phead):
        phead = quantize_head(phead)
    phs = phead["s"].astype(jnp.float32)
    n_vocab = phead["q"].shape[0]

    inv = np.asarray(inv_frequencies(pcfg.head_dim, pcfg.rope_theta))
    pos = np.arange(N_TOKENS, dtype=np.float32)
    ang = pos[:, None] * inv[None, :]
    cos1 = np.concatenate([np.cos(ang), np.cos(ang)], -1)
    sin1 = np.concatenate([np.sin(ang), np.sin(ang)], -1)

    return {
        "tfn": talker_params["final_norm"].astype(jnp.float32)[None, :],
        "chead_q": hq,
        "chead_s": hs.astype(jnp.float32)[None, :],
        "proj_w": assets_pack["proj_w"].astype(jnp.float32).T,  # [DT, DP]
        "proj_b": assets_pack["proj_b"].astype(jnp.float32)[None, :],
        "tts_pad": assets_pack["tts_pad"].astype(jnp.float32)[None, :],
        "pfn": predictor_params["final_norm"].astype(jnp.float32)[None, :],
        "phead_q": phead["q"],                      # [n_vocab, DP] int8 HBM
        "phead_s": phs.reshape(n_vocab // 2048, 1, 2048),
        "pcos": jnp.asarray(np.tile(cos1, (1, pcfg.n_heads)), jnp.float32),
        "psin": jnp.asarray(np.tile(sin1, (1, pcfg.n_heads)), jnp.float32),
        "ctab_fb": assets_pack["codec_tables"],     # [16, R, 2048] HBM
        "ctab_pred": assets_pack["codec_tables_1024"][:N_TOKENS - 1]
        .astype(jnp.bfloat16),                      # [15, R, 1024] HBM
    }


def _blk_rotate_half_ref(x, dh):
    """Plain-array twin of talker_step._blk_rotate_half (pltpu.roll has no
    eager evaluation rule outside a pallas trace)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % dh
    n = x.shape[-1]
    left = jnp.roll(x, n - dh // 2, axis=x.ndim - 1)
    right = jnp.roll(x, dh // 2, axis=x.ndim - 1)
    return jnp.where(lane < dh // 2, -left, right)


def reference_predict_frame_w4(pcfg, pred_w, pfn, phead_q, phead_s,
                               ctab_pred, px0, code0, taps=None):
    """Specification of the kernel's predictor phase in plain arrays: the
    same packed w4a8 weights through the same op sequence (_qmm4 slices
    arrays exactly like refs).  Used by tests to pin the in-kernel phase,
    and as a debugging oracle.  px0 [PB, DP] bf16 (projected hidden, rows
    >= B zero); code0 [B] int32.  Returns codes [B, 16] int32 (PB rows,
    caller slices)."""
    LP = pcfg.n_layers
    PB = px0.shape[0]
    DP = pcfg.d_model
    HP, HKVP, DHP = pcfg.n_heads, pcfg.n_kv_heads, pcfg.head_dim
    prep = HP // HKVP
    pdq = HP * DHP
    pdkv = HKVP * DHP
    EPS = pcfg.rms_eps
    from ..ops.rope import inv_frequencies
    inv = np.asarray(inv_frequencies(DHP, pcfg.rope_theta))
    ang = np.arange(N_TOKENS, dtype=np.float32)[:, None] * inv[None, :]
    cos1 = np.tile(np.concatenate([np.cos(ang), np.cos(ang)], -1),
                   (1, HP)).astype(np.float32)
    sin1 = np.tile(np.concatenate([np.sin(ang), np.sin(ang)], -1),
                   (1, HP)).astype(np.float32)

    pk = jnp.zeros((LP, N_TOKENS, PB, pdkv), jnp.bfloat16)
    pv = jnp.zeros((LP, N_TOKENS, PB, pdkv), jnp.bfloat16)
    codes = [jnp.broadcast_to(jnp.asarray(code0, jnp.int32), (PB,))]
    x = px0.astype(jnp.bfloat16)
    seg_q = pred_w["seg_q"]
    seg_k = pred_w["seg_k"]
    R_PD = ctab_pred.shape[1]
    for t in range(N_TOKENS):
        for l in range(LP):
            hn = _rms(x, pred_w["ln1"][l, 0], EPS).astype(jnp.bfloat16)
            qkv = _qmm4(hn, pred_w["wqkv_q"][l], pred_w["wqkv_s"][l])
            q = qkv[:, :pdq]
            k = qkv[:, pdq: pdq + pdkv]
            v = qkv[:, pdq + pdkv:]
            q = _blk_rms(q, pred_w["qn"][l, 0], seg_q, DHP,
                         EPS).astype(jnp.bfloat16)
            k = _blk_rms(k, pred_w["kn"][l, 0], seg_k, DHP,
                         EPS).astype(jnp.bfloat16)
            cos_q = cos1[t:t + 1]
            sin_q = sin1[t:t + 1]
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos_q
                 + _blk_rotate_half_ref(qf, DHP) * sin_q
                 ).astype(jnp.bfloat16)
            k = (kf * cos_q[:, :pdkv]
                 + _blk_rotate_half_ref(kf, DHP) * sin_q[:, :pdkv]
                 ).astype(jnp.bfloat16)
            pk = pk.at[l, t].set(k)
            pv = pv.at[l, t].set(v)
            ks = pk[l].astype(jnp.float32)
            vs = pv[l].astype(jnp.float32)
            kh = jnp.concatenate([ks] * prep, axis=-1)
            vh = jnp.concatenate([vs] * prep, axis=-1)
            prod = q.astype(jnp.float32)[None, :, :] * kh
            scores = jax.lax.dot_general(
                prod, seg_q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * (DHP ** -0.5)
            s_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            scores = jnp.where(s_ids <= t, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=0)
            pexp = jax.lax.dot_general(
                probs, seg_q, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ctx = jnp.sum(pexp * vh, axis=0)
            x = x + _qmm4(ctx.astype(jnp.bfloat16), pred_w["wo_q"][l],
                          pred_w["wo_s"][l])
            hn2 = _rms(x, pred_w["ln2"][l, 0], EPS).astype(jnp.bfloat16)
            gup = _qmm4(hn2, pred_w["gu_q"][l], pred_w["gu_s"][l])
            f_half = gup.shape[-1] // 2
            gf = gup[:, :f_half].astype(jnp.float32)
            ff = (gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) \
                * gup[:, f_half:]
            x = x + _qmm4(ff, pred_w["dn_q"][l], pred_w["dn_s"][l])
        if t >= 1:
            hf = _rms(x, pfn[0], EPS).astype(jnp.bfloat16)
            win = phead_q[(t - 1) * 2048: t * 2048]
            logits = jax.lax.dot_general(
                hf, win.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) \
                * phead_s[t - 1, 0].astype(jnp.float32)
            if taps is not None:
                taps.append(logits)
            codes.append(jnp.argmax(logits, axis=1).astype(jnp.int32))
        if t < N_TOKENS - 1:
            ci = jnp.clip(codes[t], 0, R_PD - 1)
            x = jnp.take(ctab_pred[t], ci, axis=0).astype(jnp.bfloat16)
    return jnp.stack(codes, axis=1)                     # [PB, 16]


# --------------------------------------------------------------------------
# gates + public wrapper
# --------------------------------------------------------------------------
def chunk_mode() -> bool:
    """QTTS_FUSED_CHUNK gate.  Default ON on TPU backends (opt-out
    QTTS_FUSED_CHUNK=0): measured on the v5e bulk path (b=1, 96 frames,
    scripts/bench_chunk_bulk.py) the chunk kernel runs 2.63 ms/frame vs
    2.96 for the per-kernel schedule — the per-launch machinery the fuse
    removes (7 of 8 kernel entries per 4-frame chunk plus the XLA glue)
    is worth ~0.33 ms/frame.  Same backend gate as the fused talker
    kernel; greedy parity with the XLA chain is pinned in interpret mode
    (tests/test_chunk_kernel.py)."""
    import os
    if os.environ.get("QTTS_FUSED_CHUNK", "1") != "1":
        return False
    from .flash_decode import use_flash_decode
    return use_flash_decode()


def supported(tcfg, pcfg, batch: int, n_frames: int) -> bool:
    """batch 1 runs the per-lane-unrolled flash loop; 8/16 run the batched
    fused-column loop (2 KV slots + per-batch chunk size hold the whole
    program ~86-92 MB against the 120 MB VMEM budget).  24/32 lanes fit
    only at the serving chunk shape (n_frames <= 4 halves the chunk-local
    KV scratch, lps is clamped to 2 by gen_chunk_fused so Mosaic's
    double-buffered scale blocks shrink) — larger frame counts at b >= 24
    ride the per-step talker megakernel instead."""
    from . import talker_step as _ts
    from . import predictor_frame as _pf
    g2 = 2 * INT4_GROUP
    return ((batch == 1 or batch in (8, 16)
             or (batch in (24, 32) and n_frames <= 4))
            and 1 <= n_frames <= 8
            and _ts.supported(tcfg, batch, "w4a8")
            and _pf.supported(pcfg, batch)
            and pcfg.d_model % g2 == 0
            and (pcfg.n_heads * pcfg.head_dim) % g2 == 0
            and pcfg.d_ff % g2 == 0
            and pcfg.n_residual_codebooks == 15)


def gen_chunk_fused(tcfg, pcfg, talker_params, pred_w, extras,
                    logits, hidden, cache_k, cache_v, lengths, write_idx,
                    pos, u, sampler_vec, n_frames: int, prompt_cap: int,
                    interpret: bool = False, lps: Optional[int] = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray, jnp.ndarray]:
    """Run n_frames fused frames.

    logits [B, V>=2160] f32 (current codec logits); hidden [B, 2048] f32;
    pos [B] logical positions of the first new token; u [n_frames, B] f32
    uniforms; sampler_vec [1, 4] f32 (temp, top_k, top_p, 0).
    Returns (codes [B, n_frames, 16] i32, logits' [B, VP], hidden' [B, D],
    k_cache', v_cache').  Gate with supported() + chunk_mode().
    """
    from ..models.talker import _rope_tables

    B = hidden.shape[0]
    BP = B + (B % 2)
    F = int(n_frames)
    layer_w = talker_params.get("fused_w4a8")
    if layer_w is None:
        layer_w = prep_layer_weights(tcfg, talker_params, weights="w4a8")
    if lps is None:
        lps = layers_per_step(tcfg.n_layers)
    elif tcfg.n_layers % lps != 0:
        lps = 1
    if B > 4 and lps > 4:
        # batched mode: Mosaic double-buffers (lps, ...) scale blocks per
        # grid step (~2 x 11 MB at lps=7) — clamp to the largest divisor
        # <= 4 to keep the whole program under the VMEM limit
        lps = next((v for v in (4, 3, 2) if tcfg.n_layers % v == 0), 1)
    if B >= 24 and lps > 2:
        # b=24/32: the fused-column KV slots grow with B*ck — buy the
        # headroom back from the scale double-buffers
        lps = 2 if tcfg.n_layers % 2 == 0 else 1

    # per-frame rope rows, tiled across packed q lanes (talker_step layout)
    p_f = (pos.astype(jnp.int32)[:, None]
           + jnp.arange(F, dtype=jnp.int32)[None, :])     # [B, F]
    pos4 = jnp.stack([p_f, p_f, p_f, jnp.zeros_like(p_f)], axis=-1)
    cos, sin = _rope_tables(tcfg, pos4)                   # [B, F, DH]
    cos = jnp.transpose(jnp.tile(cos, (1, 1, tcfg.n_heads)), (1, 0, 2))
    sin = jnp.transpose(jnp.tile(sin, (1, 1, tcfg.n_heads)), (1, 0, 2))
    if BP != B:
        cos = jnp.pad(cos, ((0, 0), (0, BP - B), (0, 0)))
        sin = jnp.pad(sin, ((0, 0), (0, BP - B), (0, 0)))

    lg0 = logits.astype(jnp.float32)
    v0 = lg0.shape[-1]
    if v0 < VP:
        lg0 = jnp.pad(lg0, ((0, 0), (0, VP - v0)), constant_values=NEG_INF)
    else:
        lg0 = lg0[:, :VP]
    col = jnp.arange(VP)[None, :]
    lg0 = jnp.where(col < V_CODEC, lg0, NEG_INF)
    h0 = hidden.astype(jnp.float32)
    if BP != B:
        lg0 = jnp.pad(lg0, ((0, BP - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, BP - B), (0, 0)))

    R_FB = int(extras["ctab_fb"].shape[1])
    R_PD = int(extras["ctab_pred"].shape[1])
    cfg_static = (tcfg.n_layers, B, BP, tcfg.n_heads, tcfg.n_kv_heads,
                  tcfg.head_dim, tcfg.d_model, tcfg.rms_eps,
                  cache_k.shape[3], prompt_cap,
                  pcfg.n_layers, max(8, B), pcfg.n_heads, pcfg.n_kv_heads,
                  pcfg.head_dim, pcfg.d_model, F, lps, R_FB, R_PD)
    codes, lg_out, hid_out, k_new, v_new, plog = _call(
        lg0, h0, cos.astype(jnp.float32), sin.astype(jnp.float32),
        layer_w, pred_w, extras, cache_k, cache_v,
        lengths, write_idx, u.astype(jnp.float32),
        sampler_vec.astype(jnp.float32),
        cfg_static=cfg_static, interpret=interpret)
    gen_chunk_fused.last_plog = plog     # debug tap (predictor logits)
    return codes, lg_out, hid_out, k_new, v_new
