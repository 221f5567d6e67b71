"""Continuous batching: lane refill isolation and queue completion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.core.config import SamplerConfig
from qwen3_tts_tpu.serve.batch import BatchRequest
from qwen3_tts_tpu.serve.continuous import ContinuousBatcher


def test_refill_lane_logits_match_fresh_prefill(tiny_engine):
    """A refilled lane's prefill logits must equal a solo prefill of the
    same prompt — stale cache contents of the previous occupant must be
    invisible (gen_start masking)."""
    eng = tiny_engine
    from qwen3_tts_tpu.runtime.generate import SamplerParams

    voice = eng.get_speaker("vivian")
    plan_a = eng._build_voice_prompt("first occupant text", voice, None)
    plan_b = eng._build_voice_prompt("the replacement", voice, None)
    bucket = eng._bucket(max(plan_a.length, plan_b.length))

    # Batch of 2: both lanes run prompt A, decode 3 chunks.
    embeds, lens = eng.prompt_to_device([plan_a, plan_a], bucket)
    state = eng.generator.start(embeds, jnp.asarray(lens),
                                jax.random.PRNGKey(0))
    sampler = SamplerParams.make(SamplerConfig(seed=1))
    for _ in range(3):
        state, codes, valid = eng.generator.chunk(
            state, sampler, prompt_cap=bucket, n_frames=2)

    # Refill lane 1 with prompt B.
    embeds_b, lens_b = eng.prompt_to_device(plan_b, bucket)
    state = eng.generator.refill_lane(state, embeds_b[0],
                                      min(plan_b.length, bucket), 1)

    # Reference: solo prefill of B.
    solo = eng.generator.start(embeds_b, jnp.asarray(lens_b),
                               jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(state.logits[1]),
                               np.asarray(solo.logits[0]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.hidden[1]),
                               np.asarray(solo.hidden[0]),
                               rtol=2e-4, atol=2e-3)
    assert not bool(np.asarray(state.done)[1])
    # lane 0 untouched
    assert int(np.asarray(state.pos)[0]) == lens[0] + 6


def test_continuous_batcher_completes_queue(tiny_engine):
    eng = tiny_engine
    eng.set_max_steps(8)
    eng.set_sampler_config(SamplerConfig(seed=3))
    voice = eng.get_speaker("vivian")
    reqs = [BatchRequest(f"request number {i}", voice) for i in range(5)]
    batcher = ContinuousBatcher(eng, batch_size=2, max_frames_per_stream=4)
    results = batcher.run(reqs)
    assert len(results) == 5
    spf = eng.config.codec_decoder.samples_per_frame
    for r in results:
        assert len(r.audio.samples) == r.frames * spf
        assert np.isfinite(r.audio.samples).all()
        assert r.frames <= 4


def test_continuous_budget_clamp(tiny_engine):
    """A stream must never emit more frames than its budget even when the
    chunk that crosses the budget carries extra valid frames (round-1 bug:
    k was appended unclamped, overshooting by up to frames_per_chunk-1)."""
    eng = tiny_engine
    eng.set_max_steps(8)
    eng.set_sampler_config(SamplerConfig(seed=5))
    voice = eng.get_speaker("vivian")
    # budget 3 with frames_per_chunk 4 -> the first chunk crosses the
    # budget mid-chunk; result must be at most 3 frames, not 4.
    reqs = [BatchRequest("clamp test one", voice, max_frames=3),
            BatchRequest("clamp test two", voice, max_frames=3)]
    batcher = ContinuousBatcher(eng, batch_size=2, max_frames_per_stream=8)
    results = batcher.run(reqs)
    spf = eng.config.codec_decoder.samples_per_frame
    for r in results:
        assert r.frames <= 3
        assert len(r.audio.samples) == r.frames * spf


def test_bucket_routing_mixed_lengths(tiny_engine, monkeypatch):
    """Mixed-length prompts are grouped by prompt bucket (a short prompt
    never pays a long prompt's prefill padding) and all complete."""
    eng = tiny_engine
    eng.set_max_steps(8)
    eng.set_sampler_config(SamplerConfig(seed=8))
    voice = eng.get_speaker("vivian")
    short = "hi"
    long_t = "x" * 40                      # tiny cap 64: lands in bucket 64
    reqs = [BatchRequest(short, voice, max_frames=2),
            BatchRequest(long_t, voice, max_frames=2),
            BatchRequest(short, voice, max_frames=2)]

    seen_buckets = []
    orig = eng.prompt_to_device

    def spy(plans, bucket=None):
        if bucket is not None:
            seen_buckets.append(bucket)
        return orig(plans, bucket)

    monkeypatch.setattr(eng, "prompt_to_device", spy)
    batcher = ContinuousBatcher(eng, batch_size=2, max_frames_per_stream=4)
    results = batcher.run(reqs)
    assert all(r.frames <= 2 for r in results)
    assert all(np.isfinite(r.audio.samples).all() for r in results)
    # two distinct buckets were used, and the short prompts used the small one
    assert len(set(seen_buckets)) >= 2
    assert min(seen_buckets) < max(seen_buckets)


def test_refill_lanes_batched_matches_sequential(tiny_engine):
    """Batched multi-lane refill (runtime.prefill_lanes, one program) must
    leave the state identical to sequential per-lane refills."""
    eng = tiny_engine
    from qwen3_tts_tpu.runtime.generate import SamplerParams

    voice = eng.get_speaker("vivian")
    plan_a = eng._build_voice_prompt("occupant text", voice, None)
    plan_b = eng._build_voice_prompt("replacement one", voice, None)
    plan_c = eng._build_voice_prompt("replacement number two", voice, None)
    bucket = eng._bucket(max(plan_a.length, plan_b.length, plan_c.length))

    embeds, lens = eng.prompt_to_device([plan_a] * 4, bucket)
    state0 = eng.generator.start(embeds, jnp.asarray(lens),
                                 jax.random.PRNGKey(0))
    sampler = SamplerParams.make(SamplerConfig(seed=1))
    state0, _, _ = eng.generator.chunk(state0, sampler, prompt_cap=bucket,
                                       n_frames=2, uniform_cursor=False)

    eb, _ = eng.prompt_to_device([plan_b, plan_c], bucket)
    lens_r = [min(plan_b.length, bucket), min(plan_c.length, bucket)]

    # refill programs donate their input state -> copy per path
    s_seq = jax.tree.map(jnp.copy, state0)
    s_bat = jax.tree.map(jnp.copy, state0)
    seq = eng.generator.refill_lane(s_seq, eb[0], lens_r[0], 1)
    seq = eng.generator.refill_lane(seq, eb[1], lens_r[1], 3)
    bat = eng.generator.refill_lanes(s_bat, eb, lens_r, [1, 3])

    np.testing.assert_allclose(np.asarray(bat.logits), np.asarray(seq.logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bat.hidden), np.asarray(seq.hidden),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(bat.pos), np.asarray(seq.pos))
    np.testing.assert_array_equal(np.asarray(bat.done), np.asarray(seq.done))
    np.testing.assert_array_equal(np.asarray(bat.cache.lengths),
                                  np.asarray(seq.cache.lengths))
    np.testing.assert_array_equal(np.asarray(bat.cache.write_idx),
                                  np.asarray(seq.cache.write_idx))
    np.testing.assert_allclose(np.asarray(bat.cache.k, np.float32),
                               np.asarray(seq.cache.k, np.float32),
                               rtol=2e-4, atol=2e-3)


def test_refill_lanes_pads_partial_group(tiny_engine):
    """A refill group of 3 pads to 4 by repeating row 0 (duplicate lane
    indices with identical data) — results must match sequential refills."""
    eng = tiny_engine
    from qwen3_tts_tpu.runtime.generate import SamplerParams

    voice = eng.get_speaker("vivian")
    plan_a = eng._build_voice_prompt("the original", voice, None)
    plans_r = [eng._build_voice_prompt(f"new stream {i}", voice, None)
               for i in range(3)]
    bucket = eng._bucket(max([plan_a.length] + [p.length for p in plans_r]))

    embeds, lens = eng.prompt_to_device([plan_a] * 4, bucket)
    state0 = eng.generator.start(embeds, jnp.asarray(lens),
                                 jax.random.PRNGKey(2))
    sampler = SamplerParams.make(SamplerConfig(seed=4))
    state0, _, _ = eng.generator.chunk(state0, sampler, prompt_cap=bucket,
                                       n_frames=2, uniform_cursor=False)

    eb, _ = eng.prompt_to_device(plans_r, bucket)
    lens_r = [min(p.length, bucket) for p in plans_r]
    lanes = [0, 2, 3]

    seq = jax.tree.map(jnp.copy, state0)
    s_bat = jax.tree.map(jnp.copy, state0)
    for j, lane in enumerate(lanes):
        seq = eng.generator.refill_lane(seq, eb[j], lens_r[j], lane)
    bat = eng.generator.refill_lanes(s_bat, eb, lens_r, lanes)

    np.testing.assert_allclose(np.asarray(bat.logits), np.asarray(seq.logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(bat.pos), np.asarray(seq.pos))
    np.testing.assert_array_equal(np.asarray(bat.cache.write_idx),
                                  np.asarray(seq.cache.write_idx))


def test_continuous_group_dispatch_mixed_budgets(tiny_engine):
    """Multi-chunk group dispatch with heterogeneous budgets: every request
    completes within its own budget and audio length matches frames."""
    eng = tiny_engine
    eng.set_max_steps(16)
    eng.set_sampler_config(SamplerConfig(seed=6))
    voice = eng.get_speaker("vivian")
    reqs = [BatchRequest(f"mixed budget request {i}", voice,
                         max_frames=(i % 3) * 4 + 4)   # 4/8/12
            for i in range(9)]
    batcher = ContinuousBatcher(eng, batch_size=2,
                                max_frames_per_stream=12, group_chunks=4)
    results = batcher.run(reqs)
    spf = eng.config.codec_decoder.samples_per_frame
    assert len(results) == 9
    for i, r in enumerate(results):
        budget = (i % 3) * 4 + 4
        assert 0 < r.frames <= budget
        assert len(r.audio.samples) == r.frames * spf
        assert np.isfinite(r.audio.samples).all()
        assert r.ttft_ms is not None and r.ttft_ms >= 0


def test_queue_aware_refill_width_and_floor(tiny_engine, monkeypatch):
    """r5 scheduler behavior pins: (a) refill groups pad to a pow2 width
    capped at the batch size, never silently the full width when the
    batch is small; (b) results still complete correctly with the
    queue-aware 2-chunk group floor active (queue non-empty for most of
    the run)."""
    eng = tiny_engine
    eng.set_max_steps(16)
    eng.set_sampler_config(SamplerConfig(seed=7))
    voice = eng.get_speaker("vivian")

    seen_pads = []
    orig = eng.generator.refill_lanes

    def spy(state, embeds_r, lengths, lanes, pad_to=None):
        seen_pads.append((len(set(np.asarray(lanes).tolist())), pad_to,
                          int(embeds_r.shape[0])))
        return orig(state, embeds_r, lengths, lanes, pad_to=pad_to)

    monkeypatch.setattr(eng.generator, "refill_lanes", spy)
    reqs = [BatchRequest(f"queue aware request {i}", voice, max_frames=4)
            for i in range(7)]
    batcher = ContinuousBatcher(eng, batch_size=2,
                                max_frames_per_stream=8, group_chunks=4)
    results = batcher.run(reqs)
    assert len(results) == 7
    assert all(r.frames > 0 for r in results)
    assert seen_pads, "7 requests on 2 lanes must refill"
    for n_lanes, pad_to, width in seen_pads:
        # pow2 width floored at 8 but capped at the batch size: at b=2
        # every refill must pad to exactly 2, never beyond the batch
        assert pad_to == 2 and width <= 2 and n_lanes <= 2
