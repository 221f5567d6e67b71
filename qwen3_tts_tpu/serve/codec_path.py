"""Uniform codec path for the batch schedulers.

The engine has two waveform backends: the fused native decoder (codec
decode inside the same XLA program as the LM chunk — fastest, used in dev
and once native weights are imported) and the published-ONNX decoder
(io.onnx_exec — exact graph, batch-1 state signature, onnx.rs:342-458).

Round-1 gap: the serving loops called `chunk_with_audio` unconditionally,
so a real-weights install (ONNX present, native npz absent) would still
synthesize through the random-weight native codec in serving.  LaneCodec
gives batch.py / continuous.py / online.py one interface over both:

    codec = LaneCodec(engine, batch)
    state, codes_np, valid_np = codec.run_chunk(state, sampler, ...)
    samples = codec.lane_audio(lane, codes_np[lane], k, eos)  # k clamped
    codec.reset_lanes(mask)                                   # on refill
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.codec import decoder as codec_decoder


class LaneCodec:
    def __init__(self, engine, batch: int):
        self.eng = engine
        self.b = int(batch)
        self.spf = engine.config.codec_decoder.samples_per_frame
        self.use_onnx = getattr(engine, "onnx_decoder", None) is not None
        self._wav_np: Optional[np.ndarray] = None
        if self.use_onnx:
            self.states: List[dict] = [engine.onnx_decoder.create_state()
                                       for _ in range(self.b)]
            self.dec_state = None
        else:
            self.dec_state = codec_decoder.init_decoder_state(
                engine.config.codec_decoder, engine.codec_decoder_params,
                batch=self.b)
            self._reset_fn = jax.jit(codec_decoder.reset_lanes)

    # ---------------------------------------------------------------- chunk
    def run_chunk(self, state, sampler, *, prompt_cap: int, n_frames: int,
                  uniform_cursor: bool = True):
        """One LM chunk.  Returns (state, codes_np [B,n,16], valid_np [B,n])."""
        eng = self.eng
        if self.use_onnx:
            state, codes, valid = eng.generator.chunk(
                state, sampler, prompt_cap=prompt_cap, n_frames=n_frames,
                uniform_cursor=uniform_cursor)
            self._wav_np = None
            return state, np.asarray(codes), np.asarray(valid)
        state, self.dec_state, codes, valid, wav = \
            eng.generator.chunk_with_audio(
                state, self.dec_state, sampler, prompt_cap=prompt_cap,
                n_frames=n_frames, uniform_cursor=uniform_cursor)
        self._wav_np = np.asarray(wav)
        return state, np.asarray(codes), np.asarray(valid)

    # ---------------------------------------------------------------- group
    def run_group(self, state, sampler, *, prompt_cap: int, n_frames: int,
                  max_frames: int, budgets, uniform_cursor: bool = False):
        """A multi-chunk group in ONE device program (runtime._gen_bulk):
        up to max_frames//n_frames chunks, early-exiting when every lane is
        done (EOS or its per-lane `budgets` entry, relative to group start).
        The continuous scheduler dispatches once per GROUP instead of once
        per 4-frame chunk — the host-dispatch bound that capped ragged
        traffic at ~64 frames/s.  Returns (state, codes_np [B,F,16],
        valid_np [B,F], saw_eos_np [B])."""
        eng = self.eng
        bj = jnp.asarray(np.asarray(budgets, np.int32))
        if self.use_onnx:
            state, codes, valid, _, saw_eos = eng.generator.run_bulk_codes(
                state, sampler, prompt_cap=prompt_cap, max_frames=max_frames,
                n_frames=n_frames, budgets=bj,
                uniform_cursor=uniform_cursor)
            self._wav_np = None
        else:
            state, self.dec_state, codes, valid, wav, _, saw_eos = \
                eng.generator.run_bulk(
                    state, self.dec_state, sampler, prompt_cap=prompt_cap,
                    max_frames=max_frames, n_frames=n_frames, budgets=bj,
                    uniform_cursor=uniform_cursor)
            self._wav_np = np.asarray(wav)
        return (state, np.asarray(codes), np.asarray(valid),
                np.asarray(saw_eos))

    # ----------------------------------------------------------- chunk audio
    def chunk_audio(self, codes_np: np.ndarray, ks: np.ndarray,
                    finals: np.ndarray) -> List[np.ndarray]:
        """Waveforms for a whole chunk at once.

        ks: [B] frames to keep per lane (<= 0 = inactive/no audio);
        finals: [B] bool, lane receives its flush this chunk.
        Returns a list of B f32 arrays (empty for inactive lanes).

        On the ONNX path, lanes that decode in LOCKSTEP — same k and
        identically-shaped carried states (the steady state of wave
        batching and bucket-grouped continuous batching) — run as ONE
        vmapped graph execution (decode_batch) instead of B sequential
        ones; stragglers fall back to the per-lane path.
        """
        out: List[np.ndarray] = [np.zeros(0, np.float32)] * self.b
        act = [i for i in range(self.b) if int(ks[i]) > 0]
        if not act:
            return out
        if not self.use_onnx:
            for i in act:
                out[i] = self._wav_np[i, : int(ks[i]) * self.spf]
            return out
        k0 = int(ks[act[0]])
        shapes0 = {n: np.shape(v) for n, v in self.states[act[0]].items()}
        lockstep = (len(act) > 1
                    and all(int(ks[i]) == k0 for i in act)
                    and all({n: np.shape(v)
                             for n, v in self.states[i].items()} == shapes0
                            for i in act[1:]))
        if lockstep:
            wavs, new_states = self.eng.onnx_decoder.decode_batch(
                np.stack([np.asarray(codes_np[i][:k0]) for i in act]),
                [self.states[i] for i in act],
                is_final=np.asarray([bool(finals[i]) for i in act]))
            for j, i in enumerate(act):
                out[i] = np.asarray(wavs[j], np.float32)
                self.states[i] = new_states[j]
            return out
        for i in act:
            out[i] = self.lane_audio(i, np.asarray(codes_np[i]),
                                     int(ks[i]), bool(finals[i]))
        return out

    # ---------------------------------------------------------------- audio
    def lane_audio(self, lane: int, lane_codes: np.ndarray, k: int,
                   is_final: bool) -> np.ndarray:
        """Waveform for the first k (budget-clamped) frames of this lane's
        chunk.  lane_codes: [n, 16] from run_chunk's codes_np."""
        if k <= 0:
            return np.zeros(0, np.float32)
        if self.use_onnx:
            wav, self.states[lane] = self.eng.onnx_decoder.decode(
                np.asarray(lane_codes[:k]), self.states[lane],
                is_final=is_final)
            return np.asarray(wav, np.float32)
        return self._wav_np[lane, : k * self.spf]

    # ---------------------------------------------------------------- reset
    def reset_lanes(self, mask: np.ndarray) -> None:
        if not mask.any():
            return
        if self.use_onnx:
            for lane in np.nonzero(mask)[0]:
                self.states[int(lane)] = self.eng.onnx_decoder.create_state()
        else:
            self.dec_state = self._reset_fn(self.dec_state,
                                            jnp.asarray(mask))
