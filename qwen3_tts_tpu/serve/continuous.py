"""Continuous batching: lanes refill with queued requests at chunk
boundaries instead of waiting for the whole wave to drain.

Compared to wave scheduling (serve.batch), a finished stream's lane is
immediately re-prefilled with the next queued prompt while the other lanes
keep decoding — throughput stays at full batch utilization under
mixed-length traffic.  Correctness of lane isolation:

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

Dispatch schedule (round 4): the round-3 scheduler paid one host round-trip
per 4-frame chunk plus one per refilled lane, which capped ragged traffic at
~64 frames/s on a remote-TPU transport (vs ~1900 for the one-program bulk
path) — a 96-request burst on 32 lanes saw p50 TTFT ~23 s.  Now each host
round-trip dispatches (a) ONE multi-chunk group (runtime._gen_bulk with
per-lane remaining budgets, early-exit when all lanes are done) sized to the
soonest-finishing lane, and (b) ONE batched refill program for every lane
freed this round (runtime.prefill_lanes).  A single-chunk group follows
every refill round so fresh streams still get first audio at chunk
granularity (TTFT), then group sizes grow back up to `group_chunks`.
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


def _floor_pow2(x: int) -> int:
    return 1 << (max(1, int(x)).bit_length() - 1)


class ContinuousBatcher:
    """Schedules a request queue over `batch_size` lanes with lane refill.

    group_chunks: max chunks per dispatched group (power of two).  Groups
    are sized adaptively: 1 chunk right after a refill (fresh streams'
    TTFT), otherwise the largest power of two <= the soonest-finishing
    active lane's remaining chunks, capped here.
    """

    def __init__(self, engine, batch_size: int = 8,
                 max_frames_per_stream: Optional[int] = None,
                 group_chunks: int = 8, mesh=None):
        self.engine = engine
        self.batch_size = int(batch_size)
        self.max_frames = max_frames_per_stream or engine.max_steps
        self.group_chunks = _floor_pow2(group_chunks)
        self.mesh = mesh
        if mesh is not None and mesh.size > 1:
            # Same placement contract as serve.batch.BatchSynthesizer:
            # weights follow the param specs (replicated at n_model=1, TP
            # row-sharded otherwise), activations/KV shard their batch dim
            # over "data" because prefill follows its embeds operand.
            from ..parallel import mesh as mesh_lib
            engine.talker_params = mesh_lib.place_params(
                engine.talker_params, mesh, mesh_lib.talker_param_specs())
            engine.predictor_params = mesh_lib.place_params(
                engine.predictor_params, mesh,
                mesh_lib.predictor_param_specs())
            from ..runtime.generate import Generator
            engine.generator = Generator(engine.config, engine.talker_params,
                                         engine.predictor_params,
                                         engine.assets.pack(),
                                         codec_params=engine.codec_decoder_params)

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
            plans[i] = (r.plan if r.plan is not None
                        else eng._build_voice_prompt(r.text, r.voice,
                                                     r.instruct))
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
        """One generation state: fill lanes, decode groups with batched
        refill until the queue + lanes drain.  Returns the remaining
        queue."""
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
        if self.mesh is not None and self.mesh.size > 1:
            from ..parallel import mesh as mesh_lib
            embeds = jax.device_put(embeds,
                                    mesh_lib.batch_sharding(self.mesh))
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

        import os
        trace = os.environ.get("QTTS_SCHED_TRACE") == "1"
        fresh = True
        while True:
            t_round = time.perf_counter()
            active = [i for i in range(b) if lane_req[i] is not None]
            if not active:
                break

            # Per-lane frames remaining (relative to this group's start).
            rem = np.zeros(b, np.int32)
            for lane in active:
                req = lane_req[lane]
                budget = requests[req].max_frames or self.max_frames
                rem[lane] = max(0, budget - frames[req])
            # Group size: sized to the soonest-finishing active lane's
            # remaining chunks but floored at 4 — measured sweep on the
            # 96-on-32 burst: pure min-sizing + 1-chunk-after-every-refill
            # fragments the schedule (174 frames/s, p90 20 s) while pure
            # 8-chunk groups idle finished lanes a whole group before
            # refill (p50 4.8 s); the floor bounds a finished lane's idle
            # at 3 chunks (~100 ms) without giving up group amortization.
            # A single 1-chunk group right after the initial prefill gives
            # the first wave chunk-granularity first audio.
            min_chunks = max(1, int(rem[active].min()) // n_chunk)
            # Queue-aware floor (r5): while requests wait for a lane, a
            # finished lane idling to group end delays THEIR first audio,
            # so refill opportunities come every 2 chunks instead of 4;
            # once the queue drains, the 4-chunk floor's amortization wins
            # (measured r4 sweep in the comment above).
            floor_c = 2 if queue else 4
            g = 1 if fresh else min(self.group_chunks,
                                    max(floor_c, _floor_pow2(min_chunks)))

            state, codes_np, valid_np, saw_eos_np = codec.run_group(
                state, sampler, prompt_cap=bucket, n_frames=n_chunk,
                max_frames=g * n_chunk, budgets=rem, uniform_cursor=False)
            t_group = time.perf_counter() - t_round

            ks = np.zeros(b, np.int64)
            finals = np.zeros(b, bool)
            eos_now = np.zeros(b, bool)
            for lane in active:
                req = lane_req[lane]
                # valid is already EOS- and budget-masked inside the program
                ks[lane] = int(valid_np[lane].sum())
                eos_now[lane] = bool(saw_eos_np[lane])
                budget = requests[req].max_frames or self.max_frames
                finals[lane] = (eos_now[lane]
                                or frames[req] + ks[lane] >= budget)
            samples_all = codec.chunk_audio(codes_np, ks, finals)

            refill_mask = np.zeros(b, bool)
            refills: List[tuple] = []       # (lane, request index)
            for lane in active:
                req = lane_req[lane]
                k = int(ks[lane])
                if k > 0:
                    if req not in self._ttft:
                        self._ttft[req] = round(
                            (time.perf_counter() - self._t0) * 1e3, 1)
                    wavs[req].append(samples_all[lane])
                    frames[req] += k
                if finals[lane]:
                    samples = (np.concatenate(wavs[req]) if wavs[req]
                               else np.zeros(0, np.float32))
                    results[req] = BatchResult(
                        audio=AudioSample(samples.astype(np.float32),
                                          P_.SAMPLE_RATE, 1),
                        frames=frames[req], eos=bool(eos_now[lane]),
                        ttft_ms=self._ttft.get(req))
                    lane_req[lane] = None
                    if queue:
                        nxt = queue.pop(0)
                        lane_req[lane] = nxt
                        refill_mask[lane] = True
                        refills.append((lane, nxt))
            # ONE batched refill program for every lane freed this round
            # (the round-3 scheduler paid a dispatch per lane), then ONE
            # codec-state reset.  Lanes done inside the group (EOS or
            # budget) already carry done=True in-device; the refill resets
            # its lanes' done flags, and non-refilled finished lanes simply
            # stay done.
            fresh = False
            if refills:
                # Pad the refill group to a power-of-two width floored at
                # 8 BEFORE prompt assembly (repeat entry 0 — duplicate
                # lane writes of identical data are safe): bounded compile
                # signatures ({8, 16, b} widths, ~1.5 s each on a
                # remote-compile tunnel, warmed by any run that refills)
                # while a typical 1-4-lane refill pays an 8-row prefill
                # (~25 ms) instead of the full b=32 width (~90 ms) the
                # one-signature r4 scheme charged every round (r5: the
                # refill prefill was the largest per-round overhead in the
                # 96-on-32 burst trace).
                lanes_r = [l for l, _ in refills]
                plans_r = [plans[n] for _, n in refills]
                rp = min(b, max(8, 1 << (len(lanes_r) - 1).bit_length()))
                while len(lanes_r) < rp:
                    lanes_r.append(lanes_r[0])
                    plans_r.append(plans_r[0])
                lens_r = [min(p.length, bucket) for p in plans_r]
                embeds_r, _ = eng.prompt_to_device(plans_r, bucket)
                if self.mesh is not None and self.mesh.size > 1:
                    from ..parallel import mesh as mesh_lib
                    embeds_r = jax.device_put(
                        embeds_r, mesh_lib.batch_sharding(self.mesh))
                state = eng.generator.refill_lanes(state, embeds_r, lens_r,
                                                   lanes_r, pad_to=rp)
                codec.reset_lanes(refill_mask)
            if trace:
                print(f"[sched] g={g} active={len(active)} "
                      f"refills={len(refills)} kept={int(ks.sum())} "
                      f"group={t_group*1e3:.0f}ms "
                      f"round={(time.perf_counter()-t_round)*1e3:.0f}ms",
                      flush=True)

        return queue
