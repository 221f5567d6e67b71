"""Online continuous-batching scheduler: a long-lived worker that owns the
device generation state and serves requests submitted at any time.

`ContinuousBatcher` (serve.continuous) drains a fixed queue; this scheduler
is its production form: callers `submit()` from any thread and get a Future;
the worker keeps one fixed-bucket generation state warm, refills lanes as
streams finish OR as new requests arrive, and parks when idle.  One chunk of
work per loop iteration keeps submit latency bounded at ~1 chunk (~333 ms of
audio time, a few tens of ms wall).

Design constraints inherited from the static-shape batch model:
  * one prompt bucket per scheduler; a prompt longer than `bucket` fails
    that request's future with PromptTooLongError (the scheduler keeps
    serving — no silent truncation, no drain);
  * `batch_size` lanes; a request occupies one lane until EOS or its frame
    budget; per-lane KV cursors (models.transformer.KVCache) make refills
    free.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import protocol as P_
from ..io.audio import AudioSample
from ..runtime.generate import SamplerParams
from ..utils.logging import get_logger
from .batch import BatchRequest, BatchResult

log = get_logger()


class OnlineBatcher:
    """Thread-backed continuous batching with ad-hoc request submission."""

    def __init__(self, engine, batch_size: int = 8, bucket: int = 128,
                 max_frames_per_stream: Optional[int] = None,
                 idle_poll_s: float = 0.05):
        self.engine = engine
        self.batch_size = int(batch_size)
        self.bucket = int(bucket)
        self.max_frames = max_frames_per_stream or engine.max_steps
        self.idle_poll_s = idle_poll_s
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._started = False

    # ------------------------------------------------------------- public
    def start(self) -> "OnlineBatcher":
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def submit(self, request: BatchRequest) -> "Future[BatchResult]":
        """Queue a request; returns a Future resolving to a BatchResult."""
        fut: "Future[BatchResult]" = Future()
        self._queue.put((request, fut))
        if not self._started:
            self.start()
        return fut

    def synthesize(self, text: str, voice, instruct=None,
                   max_frames=None) -> "Future[BatchResult]":
        return self.submit(BatchRequest(text, voice, instruct,
                                        max_frames=max_frames))

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        if self._started:
            self._thread.join(timeout=timeout)

    # ------------------------------------------------------------- worker
    def _loop(self) -> None:
        eng = self.engine
        cfg = eng.config
        b = self.batch_size
        n_chunk = cfg.runtime.frames_per_chunk
        sampler = SamplerParams.make(eng.sampler_config)

        from .codec_path import LaneCodec
        state = None
        codec = LaneCodec(eng, b)
        lane_fut: List[Optional[Future]] = [None] * b
        lane_req: List[Optional[BatchRequest]] = [None] * b
        lane_wavs: List[List[np.ndarray]] = [[] for _ in range(b)]
        lane_frames = [0] * b
        set_done = jax.jit(lambda s, lane: s.replace(
            done=s.done.at[lane].set(True)))

        def try_fill_lanes():
            nonlocal state
            refill_mask = np.zeros(b, bool)
            for lane in range(b):
                if lane_fut[lane] is not None:
                    continue
                try:
                    req, fut = self._queue.get_nowait()
                except queue.Empty:
                    break
                if fut.cancelled():
                    continue
                try:
                    plan = (req.plan if req.plan is not None else
                            eng._build_voice_prompt(req.text, req.voice,
                                                    req.instruct))
                    if state is None:
                        # Cold start: prefill this first request into its
                        # lane; the other lanes get a 1-row zero prompt (not
                        # copies of the request — no host-side plan
                        # replication, and a single valid zero row keeps the
                        # attention softmax away from the all-masked NaN
                        # case).
                        embeds1, lens1 = eng.prompt_to_device(
                            [plan], self.bucket)
                        embeds = jnp.zeros(
                            (b,) + embeds1.shape[1:], embeds1.dtype
                        ).at[lane].set(embeds1[0])
                        lens = np.ones(b, np.int32)
                        lens[lane] = int(lens1[0])
                        seed = eng.sampler_config.seed
                        if seed is None:
                            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
                        state = eng.generator.start(
                            embeds, jnp.asarray(lens),
                            jax.random.PRNGKey(seed))
                        done0 = np.ones(b, bool)
                        done0[lane] = False
                        state = state.replace(done=jnp.asarray(done0))
                    else:
                        embeds, _ = eng.prompt_to_device(plan, self.bucket)
                        state = eng.generator.refill_lane(
                            state, embeds[0], plan.length, lane)
                        refill_mask[lane] = True
                except Exception as e:
                    # Per-request isolation: an oversized or malformed
                    # prompt fails its own future, never the scheduler.
                    if not fut.cancelled():
                        fut.set_exception(e)
                    continue
                lane_fut[lane] = fut
                lane_req[lane] = req
                lane_wavs[lane] = []
                lane_frames[lane] = 0
            codec.reset_lanes(refill_mask)

        def finish(lane: int, eos: bool):
            fut = lane_fut[lane]
            samples = (np.concatenate(lane_wavs[lane]) if lane_wavs[lane]
                       else np.zeros(0, np.float32))
            result = BatchResult(
                audio=AudioSample(samples.astype(np.float32),
                                  P_.SAMPLE_RATE, 1),
                frames=lane_frames[lane], eos=eos)
            lane_fut[lane] = None
            lane_req[lane] = None
            if fut is not None and not fut.cancelled():
                fut.set_result(result)

        try:
            while not self._stop.is_set():
                try_fill_lanes()
                active = [i for i in range(b) if lane_fut[i] is not None]
                if not active:
                    time.sleep(self.idle_poll_s)
                    continue

                state, codes_np, valid_np = codec.run_chunk(
                    state, sampler, prompt_cap=self.bucket,
                    n_frames=n_chunk, uniform_cursor=False)
                ks = np.zeros(b, np.int64)
                finals = np.zeros(b, bool)
                eos_now = np.zeros(b, bool)
                for lane in active:
                    budget = (lane_req[lane].max_frames or self.max_frames)
                    k = int(valid_np[lane].sum())
                    eos_now[lane] = k < n_chunk
                    ks[lane] = min(k, budget - lane_frames[lane])
                    finals[lane] = (eos_now[lane]
                                    or lane_frames[lane] + ks[lane] >= budget)
                samples_all = codec.chunk_audio(codes_np, ks, finals)
                for lane in active:
                    budget = (lane_req[lane].max_frames or self.max_frames)
                    hit_eos = bool(eos_now[lane])
                    if ks[lane] > 0:
                        lane_wavs[lane].append(samples_all[lane])
                        lane_frames[lane] += int(ks[lane])
                    if hit_eos or lane_frames[lane] >= budget:
                        if not hit_eos:
                            state = set_done(state, lane)
                        finish(lane, hit_eos)
        except Exception as e:  # scheduler crash: fail every pending future
            # rather than leaving clients blocked forever on futures that
            # will never resolve (failure-isolation posture, SURVEY §5).
            log.exception("scheduler loop crashed: %s", e)
            self._stop.set()
            for lane in range(b):
                fut = lane_fut[lane]
                lane_fut[lane] = None
                lane_req[lane] = None
                if fut is not None and not fut.cancelled():
                    fut.set_exception(e)

        # Drain on stop: fail pending futures cleanly.
        for lane in range(b):
            if lane_fut[lane] is not None:
                finish(lane, eos=False)
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.cancelled():
                fut.set_exception(RuntimeError("scheduler stopped"))


class OnlineRouter:
    """Multi-bucket continuous batching: one OnlineBatcher per prompt
    bucket, each request routed to the smallest bucket that fits.

    Closes the single-bucket constraint of OnlineBatcher (PARITY known
    gap): short prompts never pay a long prompt's prefill padding or
    attention window, and long prompts get a bigger bucket instead of a
    failed future.  Batchers start lazily — a bucket that never sees
    traffic never compiles its programs or allocates its KV state.

    Memory note: each active bucket owns `batch_size` lanes of KV
    (bucket + max_steps slots); size `buckets`/`batch_size` to the HBM
    budget.  Prompts longer than max(buckets) still fail their own future
    with PromptTooLongError — the router keeps serving.
    """

    def __init__(self, engine, batch_size: int = 4,
                 buckets=(64, 128, 256), **batcher_kw):
        self.engine = engine
        self.buckets = tuple(sorted(int(x) for x in buckets))
        self.batch_size = int(batch_size)
        self._kw = batcher_kw
        self._batchers: dict = {}
        self._lock = threading.Lock()

    def _batcher_for(self, bucket: int) -> OnlineBatcher:
        with self._lock:
            batcher = self._batchers.get(bucket)
            if batcher is None:
                batcher = OnlineBatcher(self.engine, self.batch_size,
                                        bucket=bucket, **self._kw)
                self._batchers[bucket] = batcher
            return batcher

    def submit(self, request: BatchRequest) -> "Future[BatchResult]":
        try:
            plan = self.engine._build_voice_prompt(
                request.text, request.voice, request.instruct)
            length = plan.length
            # Hand the built plan to the batcher so prompt/tokenizer work
            # runs once, on this thread, not again inside the worker loop.
            request.plan = plan
        except Exception as e:
            fut: "Future[BatchResult]" = Future()
            fut.set_exception(e)
            return fut
        for bucket in self.buckets:
            if length <= bucket:
                return self._batcher_for(bucket).submit(request)
        from ..engine import PromptTooLongError
        fut = Future()
        fut.set_exception(PromptTooLongError(
            f"prompt is {length} rows but the largest serving bucket is "
            f"{self.buckets[-1]}; raise `buckets` or use stream_long"))
        return fut

    def synthesize(self, text: str, voice, instruct=None,
                   max_frames=None) -> "Future[BatchResult]":
        return self.submit(BatchRequest(text, voice, instruct,
                                        max_frames=max_frames))

    def stop(self, timeout: float = 30.0) -> None:
        for batcher in list(self._batchers.values()):
            batcher.stop(timeout=timeout)
