"""Multi-stream batched serving.

The reference is strictly single-stream (SURVEY.md §2.4).  Here the whole
generation stack is batch-native, so serving N concurrent streams is the same
compiled program with B=N — and with a device mesh, the batch dim shards over
the "data" axis so streams scale across chips with zero cross-chip traffic
(each stream's KV cache and codec state live on its own shard).

Wave scheduling: requests are grouped into fixed-size waves; every stream in
a wave prefills together (right-padded to a shared bucket), decodes together,
and finishes independently via per-stream EOS masks (runtime.generate flags
frames after EOS invalid).  A finished stream stops contributing audio but
its lane keeps computing until the wave drains — the standard static-batching
tradeoff; continuous batching (lane refill at chunk boundaries) is the
planned next step and the state layout (per-slot lengths + masks) already
supports it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import protocol as P_
from ..io.audio import AudioSample
from ..io.voice_file import VoiceFile
from ..parallel import mesh as mesh_lib
from ..runtime.generate import SamplerParams


@dataclass
class BatchRequest:
    text: str
    voice: VoiceFile
    instruct: Optional[str] = None
    max_frames: Optional[int] = None   # per-request frame budget (None = engine default)
    plan: object = None                # pre-built PromptPlan (router fills it so
    #                                    the batcher doesn't rebuild the prompt)


@dataclass
class BatchResult:
    audio: AudioSample
    frames: int
    eos: bool
    # Wall-clock ms from scheduler start to this request's FIRST audio
    # chunk (continuous batching fills it; wave scheduling's bulk path
    # reports wave completion — audio is not incremental there).  None
    # when the scheduler doesn't track it.
    ttft_ms: Optional[float] = None


class BatchSynthesizer:
    """Synthesizes waves of `batch_size` streams on one engine's weights."""

    def __init__(self, engine, batch_size: int = 8, mesh=None):
        self.engine = engine
        self.batch_size = int(batch_size)
        self.mesh = mesh
        if mesh is not None and mesh.size > 1:
            eng = engine
            eng.talker_params = mesh_lib.place_params(
                eng.talker_params, mesh, mesh_lib.talker_param_specs())
            eng.predictor_params = mesh_lib.place_params(
                eng.predictor_params, mesh, mesh_lib.predictor_param_specs())
            # Rebind the generator so it closes over the sharded params.
            from ..runtime.generate import Generator
            eng.generator = Generator(eng.config, eng.talker_params,
                                      eng.predictor_params,
                                      eng.assets.pack(),
                                      codec_params=eng.codec_decoder_params)

    def synthesize(self, requests: Sequence[BatchRequest],
                   ) -> List[BatchResult]:
        out: List[BatchResult] = []
        for lo in range(0, len(requests), self.batch_size):
            out.extend(self._run_wave(requests[lo:lo + self.batch_size]))
        return out

    # ------------------------------------------------------------------
    def _run_wave(self, wave: Sequence[BatchRequest]) -> List[BatchResult]:
        eng = self.engine
        cfg = eng.config
        n_real = len(wave)
        b = self.batch_size
        n_chunk = cfg.runtime.frames_per_chunk

        plans = [r.plan if r.plan is not None
                 else eng._build_voice_prompt(r.text, r.voice, r.instruct)
                 for r in wave]
        # pad lanes repeat the first plan
        plans = plans + [plans[0]] * (b - n_real)
        bucket = eng._bucket(max(p.length for p in plans))
        seed = eng.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        if self.mesh is not None and self.mesh.size > 1:
            embeds_j, lens = eng.prompt_to_device(plans, bucket)
            embeds_j = jax.device_put(embeds_j,
                                      mesh_lib.batch_sharding(self.mesh))
            state = eng.generator.start(embeds_j, jnp.asarray(lens),
                                        jax.random.PRNGKey(seed))
        else:
            # fused assembly + prefill: one program per wave
            state, lens, bucket = eng.start_plans(
                plans, bucket, jax.random.PRNGKey(seed))
        sampler = SamplerParams.make(eng.sampler_config)
        budgets = np.asarray(
            [(wave[i].max_frames if i < n_real and wave[i].max_frames
              else eng.max_steps) for i in range(n_real)]
            + [eng.max_steps] * (b - n_real), np.int64)
        # Clamp to the engine/runtime cap: an over-budget request must not
        # push the bulk program's static max_frames past the KV capacity the
        # warmup compiled for (the chunked loop below bounds at max_steps
        # anyway; this keeps the bulk path identical).
        budgets = np.minimum(budgets,
                             min(eng.max_steps, cfg.runtime.max_steps))

        import os
        if os.environ.get("QTTS_BULK", "1") != "0":
            return self._run_wave_bulk(state, sampler, bucket, budgets,
                                       n_real)

        from .codec_path import LaneCodec
        codec = LaneCodec(eng, b)
        wavs: List[List[np.ndarray]] = [[] for _ in range(b)]
        n_frames = np.zeros(b, np.int64)
        saw_eos = np.zeros(b, bool)
        finished = np.zeros(b, bool)
        steps = 0
        while steps < eng.max_steps:
            n = min(n_chunk, eng.max_steps - steps)
            state, codes_np, valid_np = codec.run_chunk(
                state, sampler, prompt_cap=bucket, n_frames=n)
            steps += n
            ks = np.zeros(b, np.int64)
            finals = np.zeros(b, bool)
            eos_now = np.zeros(b, bool)
            for i in range(b):
                if finished[i]:
                    continue
                k = int(valid_np[i].sum())
                eos_now[i] = k < n
                ks[i] = min(k, int(budgets[i] - n_frames[i]))
                finals[i] = eos_now[i] or (n_frames[i] + ks[i] >= budgets[i])
            samples_all = codec.chunk_audio(codes_np, ks, finals)
            for i in range(b):
                if finished[i]:
                    continue
                if ks[i] > 0:
                    wavs[i].append(samples_all[i])
                    n_frames[i] += ks[i]
                if eos_now[i]:
                    saw_eos[i] = True
                    finished[i] = True
                elif n_frames[i] >= budgets[i]:
                    finished[i] = True
            if finished.all():
                break

        results = []
        for i in range(n_real):
            samples = (np.concatenate(wavs[i]) if wavs[i]
                       else np.zeros(0, np.float32))
            results.append(BatchResult(
                audio=AudioSample(samples=samples.astype(np.float32),
                                  sample_rate=P_.SAMPLE_RATE, channels=1),
                frames=int(n_frames[i]), eos=bool(saw_eos[i])))
        return results

    def _run_wave_bulk(self, state, sampler, bucket: int,
                       budgets: np.ndarray, n_real: int) -> List[BatchResult]:
        """Whole wave in ONE device program (runtime.generate._gen_bulk with
        per-lane budgets): no host sync per chunk — at high transport
        latency the chunked wave loop pays ~2 round-trips per 4 frames.
        A lane is done at EOS or its own budget; the program exits when all
        lanes are."""
        eng = self.engine
        cfg = eng.config
        spf = cfg.codec_decoder.samples_per_frame
        max_frames = int(budgets.max())
        bj = jnp.asarray(budgets, jnp.int32)

        if eng.onnx_decoder is not None:
            state, codes, valid, _, saw_eos = eng.generator.run_bulk_codes(
                state, sampler, prompt_cap=bucket, max_frames=max_frames,
                budgets=bj)
            eos_np = np.asarray(saw_eos)
            codes_np = np.asarray(codes)
            valid_np = np.asarray(valid)
            ks = [int(valid_np[i].sum()) for i in range(n_real)]
            wavs: dict = {}
            # lanes with equal frame counts decode in lockstep through ONE
            # vmapped graph execution (decode_batch); stragglers go solo
            groups: dict = {}
            for i in range(n_real):
                groups.setdefault(ks[i], []).append(i)
            for k, lanes in groups.items():
                if k == 0:
                    for i in lanes:
                        wavs[i] = np.zeros(0, np.float32)
                elif len(lanes) > 1:
                    batch_codes = np.stack([codes_np[i, :k] for i in lanes])
                    outs, _ = eng.onnx_decoder.decode_batch(
                        batch_codes,
                        [eng.onnx_decoder.create_state() for _ in lanes],
                        is_final=True)
                    for i, w in zip(lanes, outs):
                        wavs[i] = np.asarray(w, np.float32)
                else:
                    w, _ = eng.onnx_decoder.decode(
                        codes_np[lanes[0], :k],
                        eng.onnx_decoder.create_state(), is_final=True)
                    wavs[lanes[0]] = np.asarray(w, np.float32)
            return [BatchResult(
                audio=AudioSample(samples=wavs[i],
                                  sample_rate=P_.SAMPLE_RATE, channels=1),
                frames=ks[i], eos=bool(eos_np[i]))
                for i in range(n_real)]

        from ..models.codec import decoder as codec_decoder
        dec_state = codec_decoder.init_decoder_state(
            cfg.codec_decoder, eng.codec_decoder_params,
            batch=self.batch_size)
        state, dec_state, codes, valid, wav, _, saw_eos = (
            eng.generator.run_bulk(
                state, dec_state, sampler, prompt_cap=bucket,
                max_frames=max_frames, budgets=bj))
        wav_np = np.asarray(wav)
        valid_np = np.asarray(valid)
        eos_np = np.asarray(saw_eos)
        results = []
        for i in range(n_real):
            k = int(valid_np[i].sum())
            results.append(BatchResult(
                audio=AudioSample(samples=wav_np[i, : k * spf].astype(
                    np.float32), sample_rate=P_.SAMPLE_RATE, channels=1),
                frames=k, eos=bool(eos_np[i])))
        return results
