"""Online batcher: ad-hoc submission, concurrent clients, idle re-entry,
clean shutdown."""

import threading

import numpy as np
import pytest

from qwen3_tts_tpu.core.config import SamplerConfig
from qwen3_tts_tpu.serve.batch import BatchRequest
from qwen3_tts_tpu.serve.online import OnlineBatcher


@pytest.fixture()
def batcher(tiny_engine):
    tiny_engine.set_max_steps(8)
    tiny_engine.set_sampler_config(SamplerConfig(seed=4))
    ob = OnlineBatcher(tiny_engine, batch_size=2, bucket=32,
                       max_frames_per_stream=4, idle_poll_s=0.01).start()
    yield ob
    ob.stop()


def test_submit_and_complete(batcher, tiny_engine):
    voice = tiny_engine.get_speaker("vivian")
    futs = [batcher.submit(BatchRequest(f"text {i}", voice, max_frames=3))
            for i in range(5)]
    spf = tiny_engine.config.codec_decoder.samples_per_frame
    for f in futs:
        r = f.result(timeout=300)
        assert r.frames <= 3
        assert len(r.audio.samples) == r.frames * spf
        assert np.isfinite(r.audio.samples).all()


def test_idle_then_resubmit(batcher, tiny_engine):
    voice = tiny_engine.get_speaker("vivian")
    r1 = batcher.submit(BatchRequest("first", voice, max_frames=2)
                        ).result(timeout=300)
    # scheduler goes idle, then accepts more work
    r2 = batcher.submit(BatchRequest("second", voice, max_frames=2)
                        ).result(timeout=300)
    assert r1.frames <= 2 and r2.frames <= 2


def test_concurrent_clients(batcher, tiny_engine):
    voice = tiny_engine.get_speaker("vivian")
    results = {}

    def client(i):
        results[i] = batcher.submit(
            BatchRequest(f"client {i}", voice, max_frames=2)).result(timeout=300)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for r in results.values():
        assert np.isfinite(r.audio.samples).all()


def test_stop_fails_pending(tiny_engine):
    tiny_engine.set_sampler_config(SamplerConfig(seed=1))
    ob = OnlineBatcher(tiny_engine, batch_size=2, bucket=32,
                       max_frames_per_stream=2)
    # not started: submit starts it; then stop and check queued-after-stop
    voice = tiny_engine.get_speaker("vivian")
    f1 = ob.submit(BatchRequest("a", voice, max_frames=2))
    f1.result(timeout=300)
    ob.stop()
    assert not ob._thread.is_alive()


def test_oversized_prompt_fails_future_not_scheduler(batcher, tiny_engine):
    """An over-bucket prompt fails its own future with PromptTooLongError;
    the scheduler keeps serving later requests (per-request isolation)."""
    from qwen3_tts_tpu import PromptTooLongError
    voice = tiny_engine.get_speaker("vivian")
    f_bad = batcher.submit(BatchRequest("y" * 500, voice, max_frames=2))
    f_ok = batcher.submit(BatchRequest("short", voice, max_frames=2))
    with pytest.raises(PromptTooLongError):
        f_bad.result(timeout=300)
    r = f_ok.result(timeout=300)
    assert np.isfinite(r.audio.samples).all()


def test_scheduler_crash_fails_inflight_futures(tiny_engine, monkeypatch):
    """If the chunk loop itself dies (e.g. a backend compile error), every
    in-flight future must receive the exception instead of blocking its
    client forever."""
    from qwen3_tts_tpu.serve.codec_path import LaneCodec

    def boom(self, *a, **kw):
        raise RuntimeError("backend exploded")

    monkeypatch.setattr(LaneCodec, "run_chunk", boom)
    tiny_engine.set_sampler_config(SamplerConfig(seed=9))
    ob = OnlineBatcher(tiny_engine, batch_size=2, bucket=32,
                       max_frames_per_stream=2, idle_poll_s=0.01).start()
    voice = tiny_engine.get_speaker("vivian")
    fut = ob.submit(BatchRequest("crash", voice, max_frames=2))
    with pytest.raises(RuntimeError, match="backend exploded"):
        fut.result(timeout=60)
    ob.stop()
    assert not ob._thread.is_alive()


# ---------------------------------------------------------------- router
def test_router_routes_to_smallest_bucket(tiny_engine):
    """Short prompts run in the small bucket; longer ones in the bigger;
    too-long fails its own future with PromptTooLongError."""
    from qwen3_tts_tpu.engine import PromptTooLongError
    from qwen3_tts_tpu.serve.online import OnlineRouter

    tiny_engine.set_max_steps(8)
    tiny_engine.set_sampler_config(SamplerConfig(seed=9))
    voice = tiny_engine.get_speaker("vivian")
    router = OnlineRouter(tiny_engine, batch_size=2, buckets=(32, 64),
                          max_frames_per_stream=3, idle_poll_s=0.01)
    try:
        short = router.submit(BatchRequest("hi", voice, max_frames=2))
        long_text = "word " * 8                        # > 32 rows padded
        longer = router.submit(BatchRequest(long_text, voice, max_frames=2))
        r1 = short.result(timeout=300)
        r2 = longer.result(timeout=300)
        assert r1.frames <= 2 and r2.frames <= 2
        assert np.isfinite(r1.audio.samples).all()
        assert np.isfinite(r2.audio.samples).all()
        # lazy per-bucket batchers: at least the small bucket exists, and
        # no batcher was created for a bucket that saw no traffic
        assert set(router._batchers) <= {32, 64}
        assert len(router._batchers) >= 1

        hopeless = router.submit(
            BatchRequest("x " * 200, voice, max_frames=2))
        with pytest.raises(PromptTooLongError):
            hopeless.result(timeout=60)
    finally:
        router.stop()


def test_router_concurrent_mixed_lengths(tiny_engine):
    from qwen3_tts_tpu.serve.online import OnlineRouter

    tiny_engine.set_max_steps(8)
    tiny_engine.set_sampler_config(SamplerConfig(seed=10))
    voice = tiny_engine.get_speaker("vivian")
    router = OnlineRouter(tiny_engine, batch_size=2, buckets=(32, 64),
                          max_frames_per_stream=3, idle_poll_s=0.01)
    try:
        futs = [router.submit(BatchRequest(
            ("t " * (1 + 4 * (i % 4))).strip(), voice, max_frames=2))
            for i in range(6)]
        spf = tiny_engine.config.codec_decoder.samples_per_frame
        for f in futs:
            r = f.result(timeout=300)
            assert len(r.audio.samples) == r.frames * spf
    finally:
        router.stop()
