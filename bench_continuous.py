"""Continuous vs wave batching under mixed-length traffic.

24 requests with frame budgets cycling 8..40 on 8 lanes: wave scheduling
holds every lane until the longest stream in the wave finishes; continuous
batching refills lanes as streams end.  Reports wall time and total frames/s
for both schedulers (one JSON line each).

Run: python bench_continuous.py
"""

import json
import time

import numpy as np


def main():
    from qwen3_tts_tpu.core.config import EngineConfig, SamplerConfig
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.io.voice_file import VoiceFile
    from qwen3_tts_tpu.serve.batch import BatchRequest, BatchSynthesizer
    from qwen3_tts_tpu.serve.continuous import ContinuousBatcher
    import tempfile, pathlib

    tmp = pathlib.Path(tempfile.mkdtemp())
    (tmp / "preset_speakers").mkdir()
    rng = np.random.default_rng(0)
    vf = VoiceFile.new("", [], rng.standard_normal(2048).astype(np.float32) * 0.02)
    vf.name = "vivian"
    vf.save(tmp / "preset_speakers" / "vivian.json")

    cfg = EngineConfig(int8_weights=True)
    eng = TtsEngine(model_dir=tmp, config=cfg)
    eng.set_max_steps(64)
    eng.set_sampler_config(SamplerConfig(seed=0))
    voice = eng.get_speaker("vivian")

    budgets = [(i % 5) * 8 + 8 for i in range(24)]   # 8,16,24,32,40,...
    reqs = [BatchRequest(f"request {i}", voice, max_frames=budgets[i])
            for i in range(24)]
    total_frames = sum(budgets)

    for name, run in [
        ("wave", lambda: BatchSynthesizer(eng, batch_size=8).synthesize(reqs)),
        ("continuous", lambda: ContinuousBatcher(eng, batch_size=8).run(reqs)),
    ]:
        run()  # warm/compile
        t0 = time.perf_counter()
        results = run()
        dt = time.perf_counter() - t0
        frames = sum(r.frames for r in results)
        print(json.dumps({
            "scheduler": name, "wall_s": round(dt, 3),
            "frames": frames,
            "frames_per_s": round(frames / dt, 1),
            "audio_s_per_s": round(frames / 12.0 / dt, 2)}))

    # Saturated-queue TTFT distribution: 96 requests on 32 lanes.
    # Measured on the axon tunnel this is NOT the way to serve a cold
    # 96-stream burst: the chunked scheduler is host-dispatch-bound
    # (~64 frames/s vs ~1900 frames/s for the one-program bulk batch-96
    # path), so queued requests see multi-second TTFT (p50 ~23 s) while
    # the fused 96-lane start gives EVERYONE ~380 ms.  Use big fused
    # waves for bursts; continuous admission is for ragged arrivals.
    # The scheduler's per-chunk host round-trips (per-lane codec finals,
    # refill prefills) are the round-4 fix if low-latency transports
    # ever stop being the deployment default.
    reqs96 = [BatchRequest(f"stream {i}", voice,
                           max_frames=(i % 3) * 16 + 32)   # 32/48/64
              for i in range(96)]
    batcher = ContinuousBatcher(eng, batch_size=32)
    # warm/compile the 32-lane programs INCLUDING the refill path (48 on
    # 32 lanes forces lane refills, so the batched-refill program and the
    # group-size signatures compile here, not inside the timed run)
    batcher.run(reqs96[:48])
    t0 = time.perf_counter()
    results = batcher.run(reqs96)
    dt = time.perf_counter() - t0
    frames = sum(r.frames for r in results)
    ttfts = sorted(r.ttft_ms for r in results if r.ttft_ms is not None)
    pct = (lambda q: ttfts[min(len(ttfts) - 1,
                               round(q * (len(ttfts) - 1)))]) if ttfts else \
        (lambda q: None)
    print(json.dumps({
        "scheduler": "continuous-96on32", "wall_s": round(dt, 3),
        "frames": frames, "frames_per_s": round(frames / dt, 1),
        "audio_s_per_s": round(frames / 12.0 / dt, 2),
        "ttft_ms_p50": pct(0.5), "ttft_ms_p90": pct(0.9),
        "ttft_ms_max": ttfts[-1] if ttfts else None,
        "n_with_ttft": len(ttfts)}))


if __name__ == "__main__":
    main()
