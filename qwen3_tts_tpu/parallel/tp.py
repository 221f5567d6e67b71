"""Explicit-SPMD (shard_map) tensor-parallel decoder path.

The default multi-chip path shards with jit + NamedSharding annotations
(GSPMD, parallel.mesh) and lets XLA insert collectives.  GSPMD's
sharding propagation, however, is free to INVENT reshards — measured on
this model it adds collective-permutes inside the layer scan for the
fused-weight slices, which is avoidable ICI traffic on real meshes and
deadlocks jax 0.8's XLA:CPU in-process collective runtime on small
hosts (cross-collective rendezvous starvation — see
parallel.mesh.decoder_param_specs).  This module instead expresses the
schedule explicitly with jax.shard_map:

  * every projection weight shards its CONTRACTION dim over "model"
    (the same layout decoder_param_specs declares), each matmul is
    x[.., local-slice] @ w_local followed by one psum("model");
  * q/kv heads, attention, and the KV cache stay HEAD-SHARDED over
    "model" with zero resharding: the contiguous head blocks of the
    fused qkv output and of wo's input rows line up with the shard
    index by construction;
  * batch shards over "data"; the ONLY collective in the whole program
    is psum over "model" — a uniform, deterministic schedule.

Numerics match models.transformer.decoder_forward to fp32 reduction
noise (psum reassociates the contraction); tests/test_tp.py pins parity
on an 8-virtual-device CPU mesh.  The multichip dryrun
(__graft_entry__.dryrun_multichip) runs this path end-to-end:
prefill -> talker step -> code-0 sampling -> predictor frame ->
feedback, jitted once with lax.scan over frames.

Reference scope: this covers the decode stack the reference runs
single-stream on CUDA (engine.rs:457-641) — redesigned for multi-chip
TPU serving.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import gqa_attend, history_mask, update_cache
from ..ops.norms import rms_norm
from .mesh import DATA_AXIS, MODEL_AXIS, kv_cache_spec

P = jax.sharding.PartitionSpec


def _n_model(mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def _tp_mm(x: jnp.ndarray, w_local: jnp.ndarray) -> jnp.ndarray:
    """x [..., D_full] @ row-sharded w [D_local, out] -> psum over model."""
    dloc = w_local.shape[-2]
    i = jax.lax.axis_index(MODEL_AXIS)
    xs = jax.lax.dynamic_slice_in_dim(x, i * dloc, dloc, axis=-1)
    return jax.lax.psum(xs @ w_local, MODEL_AXIS)


def _local_heads(t: jnp.ndarray, n_local: int, dh: int) -> jnp.ndarray:
    """Slice this shard's contiguous head block from [..., H_full*Dh]."""
    i = jax.lax.axis_index(MODEL_AXIS)
    return jax.lax.dynamic_slice_in_dim(t, i * n_local * dh, n_local * dh,
                                        axis=-1)


def _rope(x, cos, sin):
    from ..ops.rope import apply_rope
    return apply_rope(x, cos, sin)


def tp_decoder_forward_local(cfg, params_local: Dict[str, Any],
                             x: jnp.ndarray, cos: jnp.ndarray,
                             sin: jnp.ndarray, k_all: jnp.ndarray,
                             v_all: jnp.ndarray, lengths: jnp.ndarray,
                             write_at, prompt_cap: int, n_model: int,
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decoder forward on ONE shard (runs inside shard_map).

    x: [B_loc, S, D] (replicated over model); k_all/v_all:
    [L, B_loc, Hkv_loc, C, Dh] this shard's kv heads; lengths [B_loc].
    Returns (hidden [B_loc, S, D] after final norm, k_all, v_all).
    """
    b, s, d = x.shape
    h, hkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h_loc, hkv_loc = h // n_model, hkv // n_model
    f_loc_in = params_local["layers"]["w_down"].shape[1]
    cap = k_all.shape[3]
    attn_win = min(max(prompt_cap, s), cap) if s > 1 else cap
    start = jnp.broadcast_to(jnp.asarray(write_at, jnp.int32), (b,))
    mask = history_mask(lengths, prompt_cap, start, s, attn_win)

    def layer_fn(carry, inputs):
        xx, k_all, v_all = carry
        l, p = inputs
        hn = rms_norm(xx, p["ln1"], cfg.rms_eps)
        qkv = _tp_mm(hn, p["wqkv"])                       # full [B,S,(h+2hkv)dh]
        q = _local_heads(qkv[..., : h * dh], h_loc, dh)
        kk = _local_heads(qkv[..., h * dh: (h + hkv) * dh], hkv_loc, dh)
        vv = _local_heads(qkv[..., (h + hkv) * dh:], hkv_loc, dh)
        q = q.reshape(b, s, h_loc, dh)
        kk = kk.reshape(b, s, hkv_loc, dh)
        vv = vv.reshape(b, s, hkv_loc, dh)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            kk = rms_norm(kk, p["k_norm"], cfg.rms_eps)
        q = _rope(q, cos, sin)
        kk = _rope(kk, cos, sin)
        k_layer = update_cache(k_all[l], kk, write_at)
        v_layer = update_cache(v_all[l], vv, write_at)
        k_all = k_all.at[l].set(k_layer)
        v_all = v_all.at[l].set(v_layer)
        attn = gqa_attend(q, k_layer[:, :, :attn_win],
                          v_layer[:, :, :attn_win],
                          mask).reshape(b, s, h_loc * dh)
        # wo rows are head-major, so this shard's row block IS its head
        # block: partial product + psum reconstructs the full output.
        xx = xx + jax.lax.psum(attn @ p["wo"], MODEL_AXIS)
        hn = rms_norm(xx, p["ln2"], cfg.rms_eps)
        gu = _tp_mm(hn, p["w_gate_up"])                   # full [B,S,2f]
        f_half = gu.shape[-1] // 2
        ff = jax.nn.silu(gu[..., :f_half]) * gu[..., f_half:]
        i = jax.lax.axis_index(MODEL_AXIS)
        ff_loc = jax.lax.dynamic_slice_in_dim(ff, i * f_loc_in, f_loc_in,
                                              axis=-1)
        xx = xx + jax.lax.psum(ff_loc @ p["w_down"], MODEL_AXIS)
        return (xx, k_all, v_all), None

    L = cfg.n_layers
    (x, k_all, v_all), _ = jax.lax.scan(
        layer_fn, (x, k_all, v_all),
        (jnp.arange(L, dtype=jnp.int32), params_local["layers"]))
    hidden = rms_norm(x, params_local["final_norm"], cfg.rms_eps)
    return hidden, k_all, v_all


def decoder_param_in_specs() -> Dict[str, Any]:
    """shard_map in_specs matching parallel.mesh.decoder_param_specs."""
    return {
        "ln1": P(), "ln2": P(),
        "wqkv": P(None, MODEL_AXIS, None),
        "wo": P(None, MODEL_AXIS, None),
        "q_norm": P(), "k_norm": P(),
        "w_gate_up": P(None, MODEL_AXIS, None),
        "w_down": P(None, MODEL_AXIS, None),
    }


def talker_in_specs() -> Dict[str, Any]:
    return {"layers": decoder_param_in_specs(), "final_norm": P(),
            "codec_head": P()}


def predictor_in_specs() -> Dict[str, Any]:
    return {"layers": decoder_param_in_specs(), "final_norm": P(),
            "lm_head": P()}


def tp_talker_prefill(cfg, mesh, talker_params, embeds: jnp.ndarray,
                      lengths: jnp.ndarray, capacity: int):
    """Sharded prompt prefill: embeds [B@data, S, 2048] -> (logits
    [B@data, V], hidden [B@data, D], k/v [L, B@data, Hkv@model, C, Dh])."""
    from ..models.talker import _codec_logits, _rope_tables
    n_model = _n_model(mesh)

    def local(params, embeds, lengths):
        b, s, _ = embeds.shape
        pos = jnp.arange(s, dtype=jnp.int32)[None, :].repeat(b, 0)
        pos4 = jnp.stack([pos, pos, pos, jnp.zeros_like(pos)], axis=-1)
        cos, sin = _rope_tables(cfg.talker, pos4)
        shape = (cfg.talker.n_layers, b, cfg.talker.n_kv_heads // n_model,
                 capacity, cfg.talker.head_dim)
        dt = jnp.dtype(cfg.talker.dtype)
        k_all = jnp.zeros(shape, dt)
        v_all = jnp.zeros(shape, dt)
        hidden_all, k_all, v_all = tp_decoder_forward_local(
            cfg.talker, params, embeds.astype(dt), cos, sin, k_all, v_all,
            lengths.astype(jnp.int32), jnp.int32(0), s, n_model)
        last = jnp.clip(lengths - 1, 0, s - 1)
        hidden = jnp.take_along_axis(hidden_all, last[:, None, None],
                                     axis=1)[:, 0]
        logits = _codec_logits(params, hidden)
        return logits, hidden, k_all, v_all

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(talker_in_specs(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), kv_cache_spec(),
                   kv_cache_spec()),
        check_vma=False)
    return fn(talker_params, embeds, lengths)


def tp_talker_step(cfg, mesh, talker_params, embed: jnp.ndarray,
                   pos: jnp.ndarray, k_all, v_all, lengths, write_at,
                   prompt_cap: int):
    """One sharded decode step: embed [B@data, 2048] -> (logits, hidden,
    k_all, v_all).  write_at: scalar (uniform cursor) or [B] per-lane
    write cursors (continuous batching: refilled lanes restart at their
    prompt boundary while others keep decoding)."""
    from ..models.talker import _codec_logits, _rope_tables
    n_model = _n_model(mesh)

    def local(params, embed, pos, k_all, v_all, lengths, write_at):
        p = pos.astype(jnp.int32)[:, None]
        pos4 = jnp.stack([p, p, p, jnp.zeros_like(p)], axis=-1)
        cos, sin = _rope_tables(cfg.talker, pos4)
        dt = jnp.dtype(cfg.talker.dtype)
        hidden_all, k_all, v_all = tp_decoder_forward_local(
            cfg.talker, params, embed[:, None, :].astype(dt), cos, sin,
            k_all, v_all, lengths, write_at, prompt_cap, n_model)
        hidden = hidden_all[:, 0]
        return _codec_logits(params, hidden), hidden, k_all, v_all

    b = embed.shape[0]
    write_at = jnp.broadcast_to(jnp.asarray(write_at, jnp.int32), (b,))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(talker_in_specs(), P(DATA_AXIS), P(DATA_AXIS),
                  kv_cache_spec(), kv_cache_spec(), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), kv_cache_spec(),
                   kv_cache_spec()),
        check_vma=False)
    return fn(talker_params, embed, pos, k_all, v_all, lengths, write_at)


def tp_predict_frame(cfg, mesh, predictor_params, h1024: jnp.ndarray,
                     code0: jnp.ndarray, tables_1024: jnp.ndarray):
    """Sharded residual-codebook expansion of one frame.

    h1024 [B@data, 1024], code0 [B@data] -> codes [B@data, 16].  Mirrors
    models.predictor.predict_frame (15-step scan, window logits) with the
    TP layer forward."""
    from ..models.predictor import _window_logits
    from ..ops.rope import inv_frequencies, rope_cos_sin
    pcfg = cfg.predictor
    n_model = _n_model(mesh)
    inv = jnp.asarray(inv_frequencies(pcfg.head_dim, pcfg.rope_theta))
    capacity = 2 + pcfg.n_residual_codebooks

    def local(params, h1024, code0, tables):
        b = h1024.shape[0]
        dt = jnp.dtype(pcfg.dtype)
        shape = (pcfg.n_layers, b, pcfg.n_kv_heads // n_model, capacity,
                 pcfg.head_dim)
        k_all = jnp.zeros(shape, dt)
        v_all = jnp.zeros(shape, dt)
        zlen = jnp.zeros((b,), jnp.int32)

        emb0 = tables[0][code0]
        x = jnp.stack([h1024, emb0], axis=1).astype(dt)
        pos = jnp.arange(2, dtype=jnp.int32)[None, :].repeat(b, 0)
        cos, sin = rope_cos_sin(pos, inv)
        hidden, k_all, v_all = tp_decoder_forward_local(
            pcfg, params, x, cos, sin, k_all, v_all, zlen, jnp.int32(0), 0,
            n_model)
        w_logits = _window_logits(params, hidden[:, -1], 0,
                                  pcfg.codebook_size)

        def step(carry, q):
            w_logits, k_all, v_all = carry
            code_q = jnp.argmax(w_logits, axis=-1).astype(jnp.int32)
            emb_q = tables[q][code_q].astype(dt)
            pq = jnp.full((b, 1), q + 1, jnp.int32)
            cos, sin = rope_cos_sin(pq, inv)
            hidden, k_all, v_all = tp_decoder_forward_local(
                pcfg, params, emb_q[:, None, :], cos, sin, k_all, v_all,
                zlen, q + 1, 0, n_model)
            w_logits = _window_logits(params, hidden[:, 0],
                                      q * pcfg.codebook_size,
                                      pcfg.codebook_size)
            return (w_logits, k_all, v_all), code_q

        n_res = pcfg.n_residual_codebooks
        qs = jnp.arange(1, n_res, dtype=jnp.int32)
        (w_logits, _, _), residual = jax.lax.scan(
            step, (w_logits, k_all, v_all), qs)
        code_last = jnp.argmax(w_logits, axis=-1).astype(jnp.int32)
        return jnp.concatenate([code0[:, None],
                                jnp.transpose(residual, (1, 0)),
                                code_last[:, None]], axis=1).astype(jnp.int32)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(predictor_in_specs(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    return fn(predictor_params, h1024, code0, tables_1024)


def tp_gen_frames(cfg, mesh, talker_params, predictor_params,
                  assets_pack: Dict[str, Any], logits, hidden, k_all, v_all,
                  lengths, pos, write_at0, key, sampler, n_frames: int,
                  prompt_cap: int):
    """Sharded frame loop mirroring runtime.generate.gen_frames: sample
    code 0 -> predictor frame -> feedback embedding -> talker step, with
    lax.scan over `n_frames`.  Sampling / table gathers run data-parallel
    in the surrounding jit (batch-sharded, no collectives); the
    transformer forwards go through the shard_map TP path.  Returns
    (codes [B, n, 16], valid [B, n], final (logits, hidden, k, v))."""
    from ..core import protocol as P_
    from ..ops.sampling import sample_logits
    from ..runtime.generate import _frame_emb_sum
    tables_1024 = assets_pack["codec_tables_1024"]
    proj_w = assets_pack["proj_w"].astype(jnp.float32)
    proj_b = assets_pack["proj_b"].astype(jnp.float32)
    tts_pad = assets_pack["tts_pad"].astype(jnp.float32)

    def frame(carry, _):
        logits, hidden, k_all, v_all, pos, widx, done, key = carry
        key, sub = jax.random.split(key)
        code0 = sample_logits(logits, sub, sampler.temperature,
                              sampler.top_k, sampler.top_p)
        done = done | (code0 == P_.EOS)
        h1024 = hidden.astype(jnp.float32) @ proj_w.T + proj_b
        codes = tp_predict_frame(cfg, mesh, predictor_params, h1024, code0,
                                 tables_1024)
        feedback = _frame_emb_sum(assets_pack["codec_tables"],
                                  codes) + tts_pad
        logits, hidden, k_all, v_all = tp_talker_step(
            cfg, mesh, talker_params, feedback, pos, k_all, v_all, lengths,
            widx, prompt_cap)
        return (logits, hidden, k_all, v_all, pos + 1, widx + 1, done,
                key), (codes, ~done)

    b = logits.shape[0]
    done0 = jnp.zeros((b,), bool)
    carry0 = (logits, hidden, k_all, v_all, pos.astype(jnp.int32),
              jnp.broadcast_to(jnp.asarray(write_at0, jnp.int32), (b,)),
              done0, key)
    carry, (codes, valid) = jax.lax.scan(frame, carry0, None,
                                         length=n_frames)
    return (jnp.transpose(codes, (1, 0, 2)), jnp.transpose(valid, (1, 0)),
            carry[:4])


def tp_gen_bulk(cfg, mesh, talker_params, predictor_params, assets_pack,
                logits, hidden, k_all, v_all, lengths, pos, write_at0,
                done0, key, sampler, budgets, max_frames: int, chunk: int,
                prompt_cap: int):
    """Whole-request bulk generation under the TP mesh: a `lax.while_loop`
    over `chunk`-frame groups with per-lane frame budgets and EOS
    early-exit — the sharded counterpart of runtime.generate._gen_bulk
    (the serving path's one-dispatch-per-request program).  pos/write_at0
    may be per-lane [B] (continuous batching after refills).

    Returns (codes [B, F, 16], valid [B, F], saw_eos [B],
    (logits, hidden, k_all, v_all, pos, widx, done)) with F = max_frames
    rounded up to whole chunks.
    """
    from ..core import protocol as P_

    b = logits.shape[0]
    budgets = jnp.broadcast_to(jnp.asarray(budgets, jnp.int32), (b,))
    n_chunks = -(-max_frames // chunk)
    f_cap = n_chunks * chunk
    codes_buf = jnp.zeros((b, f_cap, P_.NUM_CODEBOOKS), jnp.int32)
    valid_buf = jnp.zeros((b, f_cap), bool)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b,))
    widx = jnp.broadcast_to(jnp.asarray(write_at0, jnp.int32), (b,))
    saw_eos0 = jnp.zeros((b,), bool)
    frames_in = jnp.zeros((b,), jnp.int32)

    def cond(carry):
        ci, done = carry[0], carry[-1]
        return (ci < n_chunks) & ~jnp.all(done)

    def body(carry):
        (ci, logits, hidden, k_all, v_all, pos, widx, key, codes_buf,
         valid_buf, saw_eos, frames_in, done) = carry
        key, sub = jax.random.split(key)
        prev_done = done
        # One chunk of frames through the sharded frame loop.  done lanes
        # keep generating dead frames (masked by `valid`), same contract
        # as the unsharded bulk body.
        codes, valid_c, (logits, hidden, k_all, v_all) = tp_gen_frames(
            cfg, mesh, talker_params, predictor_params, assets_pack,
            logits, hidden, k_all, v_all, lengths, pos, widx, sub, sampler,
            n_frames=chunk, prompt_cap=prompt_cap)
        eos_c = codes[:, :, 0] == P_.EOS                       # [B, chunk]
        cum = jnp.cumsum(eos_c.astype(jnp.int32), axis=1) > 0
        # frame column index within the whole request, per lane
        col = frames_in[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None]
        in_budget = col < budgets[:, None]
        valid_c = valid_c & ~prev_done[:, None] & ~cum & in_budget
        new_eos = ~prev_done & cum[:, -1]
        saw_eos = saw_eos | new_eos
        done = prev_done | cum[:, -1] | (col[:, -1] + 1 >= budgets)
        codes_buf = jax.lax.dynamic_update_slice(
            codes_buf, codes, (0, ci * chunk, 0))
        valid_buf = jax.lax.dynamic_update_slice(
            valid_buf, valid_c, (0, ci * chunk))
        return (ci + 1, logits, hidden, k_all, v_all, pos + chunk,
                widx + chunk, key, codes_buf, valid_buf, saw_eos,
                frames_in + chunk, done)

    carry0 = (jnp.int32(0), logits, hidden, k_all, v_all, pos, widx, key,
              codes_buf, valid_buf, saw_eos0, frames_in,
              jnp.asarray(done0, bool))
    carry = jax.lax.while_loop(cond, body, carry0)
    (_, logits, hidden, k_all, v_all, pos, widx, _, codes_buf, valid_buf,
     saw_eos, _, done) = carry
    return (codes_buf, valid_buf, saw_eos,
            (logits, hidden, k_all, v_all, pos, widx, done))


def tp_prefill_lanes(cfg, mesh, talker_params, embeds: jnp.ndarray,
                     new_lengths: jnp.ndarray, lanes: jnp.ndarray,
                     logits, hidden, k_all, v_all, lengths, pos, widx,
                     done):
    """Refill R lanes of a running TP-sharded batch with fresh prompts
    (continuous batching's batched lane refill under the mesh,
    runtime.generate.prefill_lanes counterpart).

    embeds [R, S, 2048]; new_lengths/lanes [R] (distinct lanes).  Prefills
    a COMPACT [R]-lane cache through the shard_map TP path, then scatters
    the R lanes into the big state with data-sharded GSPMD updates (batch
    axis only — no model collective is introduced; the kv head axis stays
    untouched).  Returns the updated
    (logits, hidden, k_all, v_all, lengths, pos, widx, done).
    """
    r, s, _ = embeds.shape
    new_lengths = jnp.asarray(new_lengths, jnp.int32)
    lanes = jnp.asarray(lanes, jnp.int32)
    # Pad the refill group to a multiple of the data axis (shard_map needs
    # the batch divisible): repeat row 0 — duplicate lane writes of
    # identical data are benign, same contract as serve.continuous.
    n_data = mesh.shape[DATA_AXIS]
    r_pad = -(-r // n_data) * n_data
    if r_pad != r:
        pad = r_pad - r
        embeds = jnp.concatenate(
            [embeds, jnp.broadcast_to(embeds[:1], (pad,) + embeds.shape[1:])])
        new_lengths = jnp.concatenate(
            [new_lengths, jnp.broadcast_to(new_lengths[:1], (pad,))])
        lanes = jnp.concatenate(
            [lanes, jnp.broadcast_to(lanes[:1], (pad,))])
    lg, hd, k_r, v_r = tp_talker_prefill(cfg, mesh, talker_params, embeds,
                                         new_lengths, capacity=s)
    # Layout-preserving lane scatter: the jnp advanced-indexing form
    # (`.at[:, lanes, :, :s].set`) transposes the advanced axis to the
    # front and copies the FULL cache per refill round (~1.4 s at b=32
    # unsharded — the exact pattern prefill_lanes replaced with a DMA
    # kernel).  A raw lax.scatter whose window is (L, Hkv, s, Dh) and
    # whose only scattered dim is the lane axis keeps the big cache's
    # layout, so XLA updates the donated buffer in place; the batch axis
    # stays data-sharded and no model collective is introduced.
    # unique_indices=False: the padding above may repeat lane 0
    # (identical rows, so any write order is the same data).
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,))
    k_upd = jnp.transpose(k_r, (1, 0, 2, 3, 4)).astype(k_all.dtype)
    v_upd = jnp.transpose(v_r, (1, 0, 2, 3, 4)).astype(v_all.dtype)
    idx = lanes[:, None]
    k_all = jax.lax.scatter(
        k_all, idx, k_upd, dnums, indices_are_sorted=False,
        unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    v_all = jax.lax.scatter(
        v_all, idx, v_upd, dnums, indices_are_sorted=False,
        unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return (logits.at[lanes].set(lg.astype(logits.dtype)),
            hidden.at[lanes].set(hd.astype(hidden.dtype)),
            k_all, v_all,
            lengths.at[lanes].set(new_lengths),
            pos.at[lanes].set(new_lengths),
            widx.at[lanes].set(jnp.int32(s)),
            done.at[lanes].set(False))
