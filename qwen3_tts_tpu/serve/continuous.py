"""Continuous batching: lanes refill with queued requests at chunk
boundaries instead of waiting for the whole wave to drain.

Compared to wave scheduling (serve.batch), a finished stream's lane is
immediately re-prefilled with the next queued prompt (`Generator.refill_lane`)
while the other lanes keep decoding — throughput stays at full batch
utilization under mixed-length traffic.  Correctness of lane isolation:

  * the refilled lane's prompt overwrites cache slots [0, bucket) of its own
    batch row only;
  * its stale decode slots are unreachable (slot > the restarted per-lane
    cursor) in both the XLA mask and the Pallas flash kernel, and get
    overwritten as the new stream decodes;
  * codec streaming state for the lane is zeroed (codec.decoder.reset_lanes).

Per-lane write cursors (models.transformer.KVCache) make refills free: a
refilled lane restarts its cursor at the prompt boundary and overwrites its
own previous decode slots, so the cache capacity bounds ONE stream's budget,
not the whole session — the batcher runs any queue length in one generation
state.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import protocol as P_
from ..runtime.generate import SamplerParams
from .batch import BatchRequest, BatchResult
from ..io.audio import AudioSample


class ContinuousBatcher:
    """Schedules a request queue over `batch_size` lanes with lane refill."""

    def __init__(self, engine, batch_size: int = 8,
                 max_frames_per_stream: Optional[int] = None):
        self.engine = engine
        self.batch_size = int(batch_size)
        self.max_frames = max_frames_per_stream or engine.max_steps

    def run(self, requests: Sequence[BatchRequest]) -> List[BatchResult]:
        results: List[Optional[BatchResult]] = [None] * len(requests)
        self._t0 = time.perf_counter()     # TTFT reference for this queue
        self._ttft = {}                    # request index -> ms of first audio
        eng = self.engine
        # Bucket routing: group requests by prompt bucket so a short prompt
        # never pays a long prompt's prefill padding (round-1 known gap:
        # one global bucket per queue).
        plans = {}
        buckets = {}
        for i, r in enumerate(requests):
            plans[i] = eng._build_voice_prompt(r.text, r.voice, r.instruct)
            buckets.setdefault(eng._bucket(plans[i].length), []).append(i)
        for bucket in sorted(buckets):
            queue = buckets[bucket]
            while queue:
                queue = self._run_generation(requests, results, queue,
                                             plans, bucket)
        return [r if r is not None else
                BatchResult(audio=AudioSample(np.zeros(0, np.float32),
                                              P_.SAMPLE_RATE, 1),
                            frames=0, eos=False)
                for r in results]

    # ------------------------------------------------------------------
    def _run_generation(self, requests, results, queue: List[int],
                        plans, bucket: int) -> List[int]:
        """One generation state: fill lanes, decode with refill until the
        cache budget is exhausted or the queue + lanes drain.  Returns the
        remaining queue."""
        eng = self.engine
        cfg = eng.config
        b = self.batch_size
        n_chunk = cfg.runtime.frames_per_chunk

        # Initial lane assignment.
        lane_req: List[Optional[int]] = [None] * b
        first = queue[: b]
        queue = queue[b:]
        init_plans = [plans[i] for i in first]
        while len(init_plans) < b:          # pad idle lanes with plan 0
            init_plans.append(init_plans[0])
        embeds, lens = eng.prompt_to_device(init_plans, bucket)
        for slot, req in enumerate(first):
            lane_req[slot] = req

        seed = eng.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        state = eng.generator.start(embeds, jnp.asarray(lens),
                                    jax.random.PRNGKey(seed))
        # Idle lanes start done so they emit nothing.
        done_init = np.asarray([lane_req[i] is None for i in range(b)])
        state = state.replace(done=jnp.asarray(done_init))
        sampler = SamplerParams.make(eng.sampler_config)
        from .codec_path import LaneCodec
        codec = LaneCodec(eng, b)

        wavs = {i: [] for i in queue + first}
        frames = {i: 0 for i in queue + first}

        set_done = jax.jit(lambda s, lane: s.replace(
            done=s.done.at[lane].set(True)))
        while True:
            active = [i for i in range(b) if lane_req[i] is not None]
            if not active:
                break

            state, codes_np, valid_np = codec.run_chunk(
                state, sampler, prompt_cap=bucket,
                n_frames=n_chunk, uniform_cursor=False)

            refill_mask = np.zeros(b, bool)
            ks = np.zeros(b, np.int64)
            finals = np.zeros(b, bool)
            eos_now = np.zeros(b, bool)
            for lane in range(b):
                req = lane_req[lane]
                if req is None:
                    continue
                k = int(valid_np[lane].sum())
                eos_now[lane] = k < n_chunk
                budget = requests[req].max_frames or self.max_frames
                ks[lane] = min(k, budget - frames[req])
                finals[lane] = eos_now[lane] or frames[req] + ks[lane] >= budget
            samples_all = codec.chunk_audio(codes_np, ks, finals)
            for lane in range(b):
                req = lane_req[lane]
                if req is None:
                    continue
                k = int(ks[lane])
                hit_eos = bool(eos_now[lane])
                budget = requests[req].max_frames or self.max_frames
                if k > 0:
                    if req not in self._ttft:
                        self._ttft[req] = round(
                            (time.perf_counter() - self._t0) * 1e3, 1)
                    wavs[req].append(samples_all[lane])
                    frames[req] += k
                out_of_budget = frames[req] >= budget
                if hit_eos or out_of_budget:
                    samples = (np.concatenate(wavs[req]) if wavs[req]
                               else np.zeros(0, np.float32))
                    results[req] = BatchResult(
                        audio=AudioSample(samples.astype(np.float32),
                                          P_.SAMPLE_RATE, 1),
                        frames=frames[req], eos=hit_eos,
                        ttft_ms=self._ttft.get(req))
                    lane_req[lane] = None
                    if not hit_eos:
                        state = set_done(state, lane)
                    # Refill from the queue.
                    if queue:
                        nxt = queue.pop(0)
                        lane_embeds, _ = eng.prompt_to_device(
                            plans[nxt], bucket)
                        state = eng.generator.refill_lane(
                            state, lane_embeds[0],
                            min(plans[nxt].length, bucket), lane)
                        lane_req[lane] = nxt
                        refill_mask[lane] = True
            codec.reset_lanes(refill_mask)

        # Finalize any lane that ran out of loop (should not happen: lanes
        # end by EOS or budget above); keep collected audio.
        for lane in range(b):
            req = lane_req[lane]
            if req is None:
                continue
            samples = (np.concatenate(wavs[req]) if wavs[req]
                       else np.zeros(0, np.float32))
            results[req] = BatchResult(
                audio=AudioSample(samples.astype(np.float32),
                                  P_.SAMPLE_RATE, 1),
                frames=frames[req], eos=False,
                ttft_ms=self._ttft.get(req))
        return queue
