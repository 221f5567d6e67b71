"""TtsEngine: the top-level facade, API-compatible with the reference
(/root/reference/src/tts/engine.rs):

    engine = TtsEngine(model_dir, quant="none")
    engine.set_max_steps(512); engine.set_sampler_config(SamplerConfig(...))
    engine.load_speakers("speakers/")
    audio = engine.generate_with_voice(text, engine.get_speaker("vivian"))
    voice = engine.create_voice_file("ref.wav", "ref text")
    audio = engine.generate(text, "ref.wav", "ref text")

plus a first-class streaming API (`generate_stream`) that the reference only
had internal plumbing for (engine.rs:522-524): an iterator of float32 chunks
emitted while the LM is still generating.

Orchestration differences from the reference are deliberate TPU designs:
  * the whole per-frame loop (sampling, predictor, feedback) is one jitted
    device program (runtime.generate) dispatched once per 4-frame chunk;
  * the codec decoder is a second jitted device program with functional
    streaming state, replacing the decoder thread + mpsc channel
    (engine.rs:487-543) — JAX async dispatch overlaps it with the next
    LM chunk on the host timeline;
  * prompts are padded to power-of-two-ish buckets so arbitrary text lengths
    reuse a handful of compiled programs.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import protocol as P
from .core.config import EngineConfig, SamplerConfig
from .io import cache as cache_io
from .io.assets import Assets
from .io.audio import AudioSample, load_reference_wav
from .io.voice_file import VoiceFile
from .models.codec import decoder as codec_decoder
from .models.codec import encoder as codec_encoder
from .models.codec import speaker as speaker_lib
from .models import predictor as predictor_lib
from .models import talker as talker_lib
from .prompt import PromptBuilder, PromptPlan, assemble
from .runtime.generate import Generator, SamplerParams
from .utils.metrics import GenerationMetrics, Stopwatch
from .utils.tokenizer import Tokenizer

QUANT_DIRS = {"q5_k_m": "gguf_q5_k_m", "q8_0": "gguf_q8_0"}


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: kills the multi-minute first-compile
    on every process start (the checkpoint/resume analogue of the reference's
    feature caches, SURVEY.md §5).  Opt out with QTTS_NO_COMPILE_CACHE=1."""
    if os.environ.get("QTTS_NO_COMPILE_CACHE"):
        return
    try:
        cache_dir = os.environ.get(
            "QTTS_COMPILE_CACHE_DIR",
            str(Path.home() / ".cache" / "qwen3_tts_tpu" / "xla"))
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class PromptTooLongError(ValueError):
    """Prompt exceeds the static prefill capacity.  Raised instead of the
    silent tail-truncation of round 1 (which dropped the task text and the
    final activation marker, yielding garbage generation)."""


class TtsEngine:
    """Owns models, assets, tokenizer, speaker cache and compiled programs."""

    def __init__(self, model_dir="models", quant: str = "none",
                 config: Optional[EngineConfig] = None, init_seed: int = 0,
                 speakers_dir=None):
        _enable_compilation_cache()
        from .utils.tracing import apply_debug_flags
        apply_debug_flags()
        self.model_dir = Path(model_dir)
        self.quant = quant
        self.config = config or EngineConfig()
        self.max_steps = self.config.runtime.max_steps
        self.sampler_config = SamplerConfig(
            temperature=self.config.sampler.temperature,
            top_k=self.config.sampler.top_k,
            top_p=self.config.sampler.top_p,
            seed=self.config.sampler.seed)
        self.speakers: Dict[str, VoiceFile] = {}
        self.last_metrics: Optional[GenerationMetrics] = None
        import collections
        import os as _os
        self._prefix_kv = collections.OrderedDict()
        self._prefix_kv_max = int(_os.environ.get("QTTS_PREFIX_CACHE_SIZE",
                                                  "4"))

        quant_dir = QUANT_DIRS.get(quant, "gguf")
        weights_dir = self.model_dir / quant_dir
        key = jax.random.PRNGKey(init_seed)
        k_assets, k_talker, k_pred, k_dec, k_enc, k_spk = jax.random.split(key, 6)

        def _jinit(fn, cfg_obj, k):
            # One fused program per model init instead of dozens of eager RNG
            # dispatches (significant on remote-compile TPU backends).
            import functools
            return jax.jit(functools.partial(fn, cfg_obj))(k)

        # 1. Assets (embedding tables + projection).  Tables live in the
        # talker's compute dtype (bf16 in production: halves HBM traffic of
        # the gather-heavy feedback path).
        self.dev_mode_components: list = []
        table_dtype = jnp.dtype(self.config.talker.dtype)
        try:
            self.assets = Assets.load(weights_dir, dtype=table_dtype)
            self._random_weights = False
        except FileNotFoundError:
            self.assets = Assets.random_init(k_assets, dtype=table_dtype)
            self._random_weights = True
            self.dev_mode_components.append("assets")

        # 2. Tokenizer.
        self.tokenizer = Tokenizer.load(self.model_dir)

        # 3. Talker + predictor weights (GGUF if present, else random init).
        # The int8 decision is made here (not at step 4.5) so the Orbax
        # fast-start cache can store the final converted form.
        use_int8 = self.config.int8_weights
        if use_int8 is None:
            use_int8 = quant != "none"
        from .io import checkpoint as ckpt_io
        from .io import weights as weights_io

        def _load_lm(name, path, cfg_cls, cur_cfg, loader):
            """GGUF -> (params, derived_cfg, from_cache)."""
            fp = ckpt_io.fingerprint(path, use_int8)
            if ckpt_io.enabled():
                hit = ckpt_io.load_lm(self.model_dir, f"{name}_{quant}", fp,
                                      cfg_cls)
                if hit is not None:
                    return hit[0], hit[1], True
            cfg_new = weights_io.config_from_gguf(
                weights_io.read_gguf(path), cur_cfg)
            _, params = loader(path, cfg_new)
            return params, cfg_new, False

        from .core.config import PredictorConfig, TalkerConfig
        talker_path = weights_dir / "qwen3_tts_talker.gguf"
        talker_cached = False
        if talker_path.exists():
            self.talker_params, tcfg, talker_cached = _load_lm(
                "talker", talker_path, TalkerConfig, self.config.talker,
                weights_io.load_talker_gguf)
            self.config = self.config.replace(talker=tcfg)
        else:
            self.talker_params = _jinit(talker_lib.init_talker_params,
                                        self.config.talker, k_talker)
            self.dev_mode_components.append("talker")
        pred_path = weights_dir / "qwen3_tts_predictor.gguf"
        pred_cached = False
        if pred_path.exists():
            self.predictor_params, pcfg, pred_cached = _load_lm(
                "predictor", pred_path, PredictorConfig,
                self.config.predictor, weights_io.load_predictor_gguf)
            self.config = self.config.replace(predictor=pcfg)
        else:
            self.predictor_params = _jinit(
                predictor_lib.init_predictor_params, self.config.predictor,
                k_pred)
            self.dev_mode_components.append("predictor")

        # 4. Codec + speaker models (npz checkpoint if present, else random).
        def _codec_fallback(tag, init_fn, cfg_obj, k):
            def fb():
                self.dev_mode_components.append(tag)
                return _jinit(init_fn, cfg_obj, k)
            return fb

        self.codec_decoder_params = self._load_npz_or(
            self.model_dir / "codec" / "decoder.npz",
            _codec_fallback("codec_decoder",
                            codec_decoder.init_decoder_params,
                            self.config.codec_decoder, k_dec))
        self.codec_encoder_params = self._load_npz_or(
            self.model_dir / "codec" / "encoder.npz",
            _codec_fallback("codec_encoder",
                            codec_encoder.init_encoder_params,
                            self.config.codec_encoder, k_enc))
        self.speaker_params = self._load_npz_or(
            self.model_dir / "codec" / "speaker.npz",
            _codec_fallback("speaker_encoder",
                            speaker_lib.init_speaker_params,
                            self.config.speaker_encoder, k_spk))

        # 4.1 Published ONNX checkpoints: when no native npz import exists,
        # execute the shipped graphs directly on TPU via io.onnx_exec —
        # op-for-op fidelity with the reference's ORT sessions
        # (onnx.rs:82-122, 140-163, 342-496).
        self.onnx_decoder = None
        self.onnx_encoder = None
        self.onnx_speaker = None
        onnx_dir = self.model_dir / "onnx"
        try:
            if "codec_decoder" in self.dev_mode_components and \
                    (onnx_dir / "qwen3_tts_decoder.onnx").exists():
                from .models.codec.onnx_decoder import OnnxStreamingDecoder
                self.onnx_decoder = OnnxStreamingDecoder.load(
                    onnx_dir / "qwen3_tts_decoder.onnx")
                self.dev_mode_components.remove("codec_decoder")
            if "codec_encoder" in self.dev_mode_components and \
                    (onnx_dir / "qwen3_tts_codec_encoder.onnx").exists():
                from .models.codec.onnx_decoder import OnnxAudioEncoder
                self.onnx_encoder = OnnxAudioEncoder.load(
                    onnx_dir / "qwen3_tts_codec_encoder.onnx")
                self.dev_mode_components.remove("codec_encoder")
            if "speaker_encoder" in self.dev_mode_components and \
                    (onnx_dir / "qwen3_tts_speaker_encoder.onnx").exists():
                from .models.codec.onnx_decoder import OnnxSpeakerEncoder
                self.onnx_speaker = OnnxSpeakerEncoder.load(
                    onnx_dir / "qwen3_tts_speaker_encoder.onnx")
                self.dev_mode_components.remove("speaker_encoder")
        except Exception as e:
            from .utils.logging import get_logger
            get_logger().warning(f"ONNX checkpoint load failed: {e!r} — "
                                 "falling back to native/random weights")
        self._warn_dev_mode()

        # 4.5 Optional int8 device weights for the LMs (memory-bound decode).
        # Cache-restored params are already in their final converted form.
        if use_int8:
            from .ops import quant as quant_ops
            if not talker_cached:
                self.talker_params = jax.jit(lambda p: {
                    "layers": quant_ops.quantize_decoder_layers(p["layers"]),
                    "final_norm": p["final_norm"],
                    "codec_head": quant_ops.quantize_head(p["codec_head"]),
                })(self.talker_params)
            if not pred_cached:
                self.predictor_params = jax.jit(lambda p: {
                    "layers": quant_ops.quantize_decoder_layers(p["layers"]),
                    "final_norm": p["final_norm"],
                    "lm_head": quant_ops.quantize_head(p["lm_head"]),
                })(self.predictor_params)

        # 4.6 Persist the converted LM weights for fast later starts.
        if ckpt_io.enabled():
            if talker_path.exists() and not talker_cached:
                ckpt_io.save_lm(self.model_dir, f"talker_{quant}",
                                self.talker_params, self.config.talker,
                                ckpt_io.fingerprint(talker_path, use_int8))
            if pred_path.exists() and not pred_cached:
                ckpt_io.save_lm(self.model_dir, f"predictor_{quant}",
                                self.predictor_params, self.config.predictor,
                                ckpt_io.fingerprint(pred_path, use_int8))

        # 5. Compiled programs.
        self.generator = Generator(self.config, self.talker_params,
                                   self.predictor_params, self.assets.pack(),
                                   codec_params=self.codec_decoder_params)
        # Batched device-side prompt assembly (prompt.assemble vmapped over
        # streams): integer plans cross to the device, never the tables.
        self._assemble = jax.jit(jax.vmap(
            assemble, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0)))
        self._decode_chunk = jax.jit(
            lambda p, c, s: codec_decoder.decode_chunk(
                self.config.codec_decoder, p, c, s),
            donate_argnums=(2,))
        self._encode_wav = jax.jit(
            lambda p, w: codec_encoder.encode(self.config.codec_encoder, p, w))
        self._speaker_embed = jax.jit(
            lambda p, w: speaker_lib.speaker_embed(
                self.config.speaker_encoder, p, w))

        # 6. Speakers.
        for cand in ([Path(speakers_dir)] if speakers_dir else
                     [self.model_dir / "preset_speakers", Path("speakers")]):
            if cand.exists():
                self.load_speakers(cand)
                break

    # ------------------------------------------------------------------ API
    def set_max_steps(self, steps: int) -> None:
        """Set the frame budget.  The talker KV capacity is sized from the
        runtime config, so raising the budget re-derives the compiled
        generator (one extra compile, no other cost)."""
        steps = int(steps)
        self.max_steps = steps
        if steps > self.config.runtime.max_steps:
            import dataclasses
            self.config = self.config.replace(
                runtime=dataclasses.replace(self.config.runtime,
                                            max_steps=steps))
            self.generator = Generator(self.config, self.talker_params,
                                       self.predictor_params,
                                       self.assets.pack(),
                                       codec_params=self.codec_decoder_params)

    def set_sampler_config(self, config: SamplerConfig) -> None:
        self.sampler_config = config

    def get_sampler_config(self) -> SamplerConfig:
        return self.sampler_config

    def load_speakers(self, speakers_dir) -> None:
        speakers_dir = Path(speakers_dir)
        for path in sorted(speakers_dir.glob("*.json")):
            if path.name == "index.json":
                continue
            try:
                self.speakers[path.stem] = VoiceFile.load(path)
            except Exception:
                continue

    def get_speaker(self, id_or_name: str) -> VoiceFile:
        """ID -> name -> 'vivian' -> any (parity: engine.rs:211-231)."""
        if id_or_name in self.speakers:
            return self.speakers[id_or_name]
        for v in self.speakers.values():
            if v.name == id_or_name:
                return v
        if P.DEFAULT_SPEAKER in self.speakers:
            return self.speakers[P.DEFAULT_SPEAKER]
        if not self.speakers:
            raise RuntimeError("No speakers loaded in engine!")
        return next(iter(self.speakers.values()))

    @staticmethod
    def download_models(model_dir, quant: str = "none") -> None:
        from .io.download import check_and_download
        check_and_download(model_dir, quant)

    def warmup(self, buckets=(32, 64, 128), batch_sizes=(1,),
               frames: int = None, bulk: bool = True) -> None:
        """Pre-compile the serving programs for the given prompt buckets and
        batch sizes (prefill + fused chunk + prompt assembly + the bulk
        whole-request program).  Run once at deployment so no user request
        pays a compile; with the persistent XLA cache this also seeds future
        processes."""
        frames = frames or self.config.runtime.frames_per_chunk
        sampler = SamplerParams.make(self.sampler_config)
        from .utils.sync import hard_sync
        max_frames = min(self.max_steps, self.config.runtime.max_steps)
        for b in batch_sizes:
            for bucket in buckets:
                embeds = jnp.zeros((b, bucket, P.TALKER_DIM), jnp.float32)
                lengths = jnp.full((b,), bucket, jnp.int32)
                state = self.generator.start(embeds, lengths,
                                             jax.random.PRNGKey(0))
                if self.onnx_decoder is not None:
                    state, codes, valid = self.generator.chunk(
                        state, sampler, prompt_cap=bucket, n_frames=frames)
                    if bulk:
                        self.generator.run_bulk_codes(
                            state, sampler, prompt_cap=bucket,
                            max_frames=max_frames)
                    hard_sync(codes)
                    continue
                dec_state = codec_decoder.init_decoder_state(
                    self.config.codec_decoder, self.codec_decoder_params,
                    batch=b)
                out = self.generator.chunk_with_audio(
                    state, dec_state, sampler, prompt_cap=bucket,
                    n_frames=frames)
                if bulk:
                    dec_state2 = codec_decoder.init_decoder_state(
                        self.config.codec_decoder, self.codec_decoder_params,
                        batch=b)
                    self.generator.run_bulk(
                        out[0], dec_state2, sampler, prompt_cap=bucket,
                        max_frames=max_frames)
                hard_sync(out[-1])
        if self.onnx_decoder is not None:
            # warm the streaming-decoder programs for the first few
            # state-length signatures (they grow until the graph's windows
            # saturate)
            st = self.onnx_decoder.create_state()
            dummy = np.zeros((frames, P.NUM_CODEBOOKS), np.int64)
            for _ in range(3):
                _, st = self.onnx_decoder.decode(dummy, st)

    def decode_codes(self, codes) -> AudioSample:
        """Decode raw codec codes ([frames, 16] or flattened) to audio —
        standalone use of the codec decoder, like driving the reference's
        `AudioDecoder` directly (onnx.rs:342-458).  Useful for auditioning a
        VoiceFile's reference codes."""
        codes = np.asarray(codes, np.int32).reshape(-1)
        if self.onnx_decoder is not None:
            wav, _ = self.onnx_decoder.decode(
                codes, self.onnx_decoder.create_state(), is_final=True)
            return AudioSample(samples=np.asarray(wav, np.float32),
                               sample_rate=P.SAMPLE_RATE, channels=1)
        n = len(codes) // P.NUM_CODEBOOKS
        frames = codes[: n * P.NUM_CODEBOOKS].reshape(1, n, P.NUM_CODEBOOKS)
        dec_state = codec_decoder.init_decoder_state(
            self.config.codec_decoder, self.codec_decoder_params, batch=1)
        wav, _ = self._decode_chunk(self.codec_decoder_params,
                                    jnp.asarray(frames), dec_state)
        return AudioSample(samples=np.asarray(wav[0], np.float32),
                           sample_rate=P.SAMPLE_RATE, channels=1)

    # ------------------------------------------------------- voice cloning
    def create_voice_file(self, audio_path, ref_text: str) -> VoiceFile:
        wav = load_reference_wav(audio_path)
        if self.onnx_encoder is not None:
            codes = self.onnx_encoder.encode(wav)                   # [N, 16]
        else:
            codes = np.asarray(self._encode_wav(
                self.codec_encoder_params, jnp.asarray(wav)[None]))[0]
        if self.onnx_speaker is not None:
            from .ops.mel import log_mel
            mels = np.asarray(log_mel(jnp.asarray(wav)))            # [F, 128]
            emb = self.onnx_speaker.encode_mels(mels)               # [2048]
        else:
            emb = np.asarray(self._speaker_embed(
                self.speaker_params, jnp.asarray(wav)))[0]
        return VoiceFile.new(ref_text, np.asarray(codes).reshape(-1), emb)

    def _process_reference(self, audio_path) -> Tuple[np.ndarray, np.ndarray]:
        """Codes + speaker embedding with a `.cache` sidecar (engine.rs:275-302)."""
        audio_path = Path(audio_path)
        cache_path = audio_path.with_suffix(".cache")
        if cache_path.exists():
            try:
                return cache_io.load_cache(cache_path)
            except Exception:
                pass
        vf = self.create_voice_file(audio_path, "")
        codes = np.asarray(vf.audio_codes, np.int64)
        emb = vf.embedding_array
        try:
            cache_io.save_cache(cache_path, codes, emb)
        except OSError:
            pass
        return codes, emb

    # ----------------------------------------------------------- synthesis
    def generate(self, text: str, ref_audio_path, ref_text: str,
                 instruct: Optional[str] = None) -> AudioSample:
        codes, emb = self._process_reference(ref_audio_path)
        plan = PromptBuilder.plan_clone(
            text, self.tokenizer, ref_codes=codes,
            ref_text_ids=self.tokenizer.encode(ref_text), spk_emb=emb,
            lang_id=self.config.lang_id, instruct=instruct)
        return self._run_inference(plan)

    def generate_with_voice(self, text: str, voice: VoiceFile,
                            instruct: Optional[str] = None) -> AudioSample:
        plan = self._build_voice_prompt(text, voice, instruct)
        return self._run_inference(plan)

    def generate_stream(self, text: str, voice: VoiceFile,
                        instruct: Optional[str] = None) -> Iterator[np.ndarray]:
        """Yield float32 waveform chunks (~4 frames / 333 ms each) while the
        LM is still generating.  This is the public streaming API the
        reference left unexposed (engine.rs:445,522-524)."""
        plan = self._build_voice_prompt(text, voice, instruct)
        yield from self._stream_inference(plan)

    def stream_long(self, text: str, voice: VoiceFile,
                    instruct: Optional[str] = None,
                    max_chars: int = 120) -> Iterator[np.ndarray]:
        """Streaming long-text synthesis: sentence-chunk the text
        (generate_long) but yield audio chunks continuously across
        sentences."""
        for piece in split_sentences(text, max_chars):
            yield from self.generate_stream(piece, voice, instruct)

    def stream_batch(self, texts, voices, instructs=None
                     ) -> Iterator[list]:
        """Batched streaming synthesis: a wave of b requests decodes in
        lockstep and every chunk boundary yields a list of b float32
        waveform pieces (zero-length once a lane has finished).

        The wave's first audio arrives from ONE device program (prompt
        assembly + prefill + first chunk + codec fused —
        Generator.start_plans_first_chunk), so batched first-chunk latency
        pays a single dispatch+sync round-trip; the reference is
        single-stream only (engine.rs:445).  Programs compile per
        (b, prompt bucket) — warm lanes with equal-size waves.  The ONNX
        codec engine path decodes chunks per-lane on the host instead
        (same schedule the B=1 streaming path uses)."""
        cfg = self.config
        b = len(texts)
        if isinstance(voices, VoiceFile):
            voices = [voices] * b
        if instructs is None or isinstance(instructs, str):
            instructs = [instructs] * b
        plans = [self._build_voice_prompt(t, v, i)
                 for t, v, i in zip(texts, voices, instructs)]
        a, lengths, bucket = self._plans_to_arrays(plans)
        seed = self.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        key = jax.random.PRNGKey(seed)
        sampler = SamplerParams.make(self.sampler_config)
        spf = cfg.codec_decoder.samples_per_frame
        n_chunk = cfg.runtime.frames_per_chunk
        first_n = cfg.runtime.first_chunk_frames
        first_n = min(first_n, n_chunk) if first_n > 0 else n_chunk
        use_onnx = self.onnx_decoder is not None
        done = np.zeros(b, bool)
        steps = 0

        def emit(codes_or_wav, valid, n, dec_states):
            """Per-lane audio for one chunk; marks finished lanes."""
            out = []
            valid_np = np.asarray(valid)
            for i in range(b):
                if done[i] and dec_states is None:
                    out.append(np.zeros(0, np.float32))
                    continue
                n_valid = int(valid_np[i].sum())
                if use_onnx:
                    finished = done[i] or n_valid < n or steps >= \
                        self.max_steps
                    if done[i] or n_valid == 0:
                        piece = np.zeros(0, np.float32)
                    else:
                        piece, dec_states[i] = self.onnx_decoder.decode(
                            np.asarray(codes_or_wav[i, :n_valid]),
                            dec_states[i], is_final=finished)
                        piece = np.asarray(piece, np.float32)
                else:
                    piece = np.asarray(
                        codes_or_wav[i, : n_valid * spf], np.float32)
                out.append(piece)
                if n_valid < n:
                    done[i] = True
            return out

        if use_onnx:
            state, lengths, bucket = self.start_plans(plans, bucket, key)
            dec_states = [self.onnx_decoder.create_state()
                          for _ in range(b)]
            while steps < self.max_steps and not done.all():
                n = min(n_chunk if steps else first_n,
                        self.max_steps - steps)
                state, codes, valid = self.generator.chunk(
                    state, sampler, prompt_cap=bucket, n_frames=n)
                steps += n
                yield emit(codes, valid, n, dec_states)
            return

        dec_state = codec_decoder.init_decoder_state(
            cfg.codec_decoder, self.codec_decoder_params, batch=b)
        state, dec_state, codes, valid, wav = \
            self.generator.start_plans_first_chunk(
                self.assets.text_table, self.assets.codec_tables,
                a["text_idx"], a["codec_idx"], a["frame_slot"],
                a["spk_flag"], a["frames"], a["spk_emb"], lengths, key,
                dec_state, sampler, prompt_cap=bucket, n_frames=first_n)
        steps = first_n
        yield emit(wav, valid, first_n, None)
        while steps < self.max_steps and not done.all():
            n = min(n_chunk, self.max_steps - steps)
            state, dec_state, codes, valid, wav = \
                self.generator.chunk_with_audio(
                    state, dec_state, sampler, prompt_cap=bucket,
                    n_frames=n)
            steps += n
            yield emit(wav, valid, n, None)

    @staticmethod
    def _safe_emb(emb: np.ndarray) -> np.ndarray:
        """Coerce a speaker embedding to the protocol width (2048): pad or
        truncate malformed voice files instead of crashing mid-request."""
        emb = np.asarray(emb, np.float32).reshape(-1)
        if emb.shape[0] == P.SPEAKER_EMB_DIM:
            return emb
        from .utils.logging import get_logger
        get_logger().warning(
            "speaker embedding has %d dims, expected %d — padding/truncating",
            emb.shape[0], P.SPEAKER_EMB_DIM)
        out = np.zeros(P.SPEAKER_EMB_DIM, np.float32)
        out[: min(emb.shape[0], P.SPEAKER_EMB_DIM)] = emb[: P.SPEAKER_EMB_DIM]
        return out

    def _build_voice_prompt(self, text: str, voice: VoiceFile,
                            instruct: Optional[str]) -> PromptPlan:
        emb = self._safe_emb(voice.embedding_array)
        if not voice.audio_codes:
            return PromptBuilder.plan_core(
                text, self.tokenizer, lang_id=self.config.lang_id,
                spk_id=None, spk_emb=emb, instruct=instruct)
        return PromptBuilder.plan_clone(
            text, self.tokenizer,
            ref_codes=np.asarray(voice.audio_codes, np.int32),
            ref_text_ids=self.tokenizer.encode(voice.ref_text),
            spk_emb=emb,
            lang_id=self.config.lang_id, instruct=instruct)

    def _plans_to_arrays(self, plans, bucket: int = None):
        """Stack padded plan arrays for a batch of PromptPlans.
        Returns (dict of stacked arrays, lengths [B] int32, bucket)."""
        if isinstance(plans, PromptPlan):
            plans = [plans]
        max_len = max(p.length for p in plans)
        bucket = bucket or self._bucket(max_len)
        if max_len > bucket:
            raise PromptTooLongError(
                f"prompt is {max_len} rows but capacity is {bucket} "
                f"(max_prompt_len={self.config.runtime.max_prompt_len}). "
                "Shorten the text or reference audio, use generate_long/"
                "stream_long for long text, or raise "
                "RuntimeConfig.max_prompt_len.")
        f_need = max(p.frames.shape[0] for p in plans)
        f_cap = 1 if f_need <= 1 else ((f_need + 63) // 64) * 64
        padded = [p.padded(bucket, f_cap) for p in plans]
        lengths = np.asarray([p.length for p in plans], np.int32)
        arrays = dict(
            text_idx=np.stack([p.text_idx for p in padded]),
            codec_idx=np.stack([p.codec_idx for p in padded]),
            frame_slot=np.stack([p.frame_slot for p in padded]),
            spk_flag=np.stack([p.spk_flag for p in padded]),
            frames=np.stack([p.frames for p in padded]),
            spk_emb=np.stack([p.spk_emb for p in padded]))
        return arrays, lengths, bucket

    def prompt_to_device(self, plans, bucket: int = None):
        """Assemble a list of PromptPlans to device embeddings.

        Returns (embeds [B, bucket, 2048] on device, lengths [B] int32).
        """
        a, lengths, bucket = self._plans_to_arrays(plans, bucket)
        embeds = self._assemble(
            self.assets.text_table, self.assets.codec_tables,
            a["text_idx"], a["codec_idx"], a["frame_slot"], a["spk_flag"],
            a["frames"], a["spk_emb"], jnp.asarray(lengths))
        return embeds, lengths

    def start_plans(self, plans, bucket: int = None, key=None):
        """Fused assembly + prefill for one or many plans: ONE device
        program per request/wave (no intermediate embeds in HBM).
        Returns (GenState, lengths, bucket)."""
        a, lengths, bucket = self._plans_to_arrays(plans, bucket)
        state = self.generator.start_from_plans(
            self.assets.text_table, self.assets.codec_tables,
            a["text_idx"], a["codec_idx"], a["frame_slot"], a["spk_flag"],
            a["frames"], a["spk_emb"], lengths, key)
        return state, lengths, bucket

    def _start_fused(self, plan: PromptPlan, bucket: int, key):
        """Assemble + prefill in ONE device program (no intermediate
        [B, bucket, 2048] embeds in HBM, one dispatch fewer per request
        — tens of ms on remote-tunnel transports)."""
        state, _, _ = self.start_plans(plan, bucket, key)
        return state

    def generate_long(self, text: str, voice: VoiceFile,
                      instruct: Optional[str] = None,
                      max_chars: int = 120) -> AudioSample:
        """Long-text synthesis by sentence chunking (SURVEY.md §5: long
        context handled at the engine level, not with a bigger window).
        Splits on sentence punctuation into <= max_chars pieces, synthesizes
        each with the same voice/instruction, and concatenates the audio."""
        pieces = split_sentences(text, max_chars)
        parts = []
        for piece in pieces:
            audio = self.generate_with_voice(piece, voice, instruct)
            if len(audio.samples):
                parts.append(audio.samples)
        samples = (np.concatenate(parts) if parts
                   else np.zeros(0, np.float32))
        return AudioSample(samples=samples, sample_rate=P.SAMPLE_RATE,
                           channels=1)

    def _run_inference(self, plan: PromptPlan) -> AudioSample:
        """Non-streaming synthesis through the ONE-dispatch bulk program
        (runtime.generate._gen_bulk): prefill + a single device program that
        loops chunks on device and early-exits at EOS.  The reference pays a
        host round-trip per frame (engine.rs:545-642); the streaming path
        here pays one per 4-frame chunk; this path pays one per REQUEST —
        on remote-transport TPUs (tens of ms per dispatch) that alone is
        worth ~0.08 RTF.  QTTS_BULK=0 falls back to the streaming loop."""
        if os.environ.get("QTTS_BULK", "1") == "0":
            parts = list(self._stream_inference(plan))
            samples = (np.concatenate(parts) if parts
                       else np.zeros((0,), np.float32))
            return AudioSample(samples=samples, sample_rate=P.SAMPLE_RATE,
                               channels=1)

        cfg = self.config
        spf = cfg.codec_decoder.samples_per_frame
        metrics = GenerationMetrics()
        watch = Stopwatch()
        t_start = time.perf_counter()
        seed = self.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        key = jax.random.PRNGKey(seed)

        state, bucket = self._start_state(plan, key)
        sampler = SamplerParams.make(self.sampler_config)
        metrics.prefill_ms = watch.lap_ms()
        max_frames = min(self.max_steps, cfg.runtime.max_steps)

        if self.onnx_decoder is not None:
            state, codes, valid, _, saw_eos = self.generator.run_bulk_codes(
                state, sampler, prompt_cap=bucket, max_frames=max_frames)
            n_valid = int(np.asarray(valid[0]).sum())
            metrics.eos = bool(np.asarray(saw_eos[0]))
            if n_valid == 0:
                samples = np.zeros((0,), np.float32)
            else:
                wav, _ = self.onnx_decoder.decode(
                    np.asarray(codes[0, :n_valid]),
                    self.onnx_decoder.create_state(), is_final=True)
                samples = np.asarray(wav, np.float32)
        else:
            dec_state = codec_decoder.init_decoder_state(
                cfg.codec_decoder, self.codec_decoder_params, batch=1)
            (state, dec_state, codes, valid, wav, _,
             saw_eos) = self.generator.run_bulk(
                state, dec_state, sampler, prompt_cap=bucket,
                max_frames=max_frames)
            n_valid = int(np.asarray(valid[0]).sum())
            metrics.eos = bool(np.asarray(saw_eos[0]))
            samples = np.asarray(wav[0, : n_valid * spf], np.float32)

        metrics.total_ms = (time.perf_counter() - t_start) * 1000.0
        # the bulk path has no first-chunk moment — TTFT is a streaming
        # metric; reporting total_ms here would pollute the metrics stream
        metrics.ttft_ms = None
        metrics.frames = n_valid
        metrics.audio_seconds = n_valid * spf / P.SAMPLE_RATE
        self.last_metrics = metrics
        from .utils.logging import log_event
        log_event("generation", **metrics.as_dict())
        return AudioSample(samples=samples, sample_rate=P.SAMPLE_RATE,
                           channels=1)

    def _stream_inference(self, plan: PromptPlan) -> Iterator[np.ndarray]:
        cfg = self.config
        spf = cfg.codec_decoder.samples_per_frame
        n_chunk = cfg.runtime.frames_per_chunk
        metrics = GenerationMetrics()
        watch = Stopwatch()
        t_start = time.perf_counter()

        trace = os.environ.get("QTTS_TIMING")

        def tlog(msg):
            if trace:
                print(f"[qtts-timing] {msg}: {watch.elapsed_ms():.0f} ms "
                      f"(t+{(time.perf_counter()-t_start)*1000:.0f} ms)",
                      flush=True)

        seed = self.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        key = jax.random.PRNGKey(seed)

        state, bucket = self._start_state(plan, key)
        tlog("prompt assembled")
        if trace:
            from .utils.sync import hard_sync as _hs
            _hs(state.logits)
        tlog("prefill")
        sampler = SamplerParams.make(self.sampler_config)
        use_onnx = self.onnx_decoder is not None
        if use_onnx:
            dec_state = self.onnx_decoder.create_state()
        else:
            dec_state = codec_decoder.init_decoder_state(
                cfg.codec_decoder, self.codec_decoder_params, batch=1)
        metrics.prefill_ms = watch.lap_ms()

        frames_emitted = 0
        steps = 0
        first_n = cfg.runtime.first_chunk_frames
        pending = None  # (wav, valid, n) one chunk in flight
        while True:
            # Dispatch the next chunk before syncing the previous one: JAX
            # async dispatch lets the device compute chunk k+1 while the host
            # converts/emits chunk k (1-chunk lookahead pipeline).
            if steps < self.max_steps:
                n = min(n_chunk, self.max_steps - steps)
                if steps == 0 and 0 < first_n < n:
                    n = first_n  # small first chunk: earlier first audio
                if use_onnx:
                    # codes-only fused LM chunk; codec runs as its own XLA
                    # program (the published graph) on the chunk boundary —
                    # the lookahead below still overlaps LM chunk k+1 with
                    # codec chunk k, like the reference's decoder thread
                    # (engine.rs:487-543)
                    state, codes, valid = self.generator.chunk(
                        state, sampler, prompt_cap=bucket, n_frames=n)
                    nxt = (codes, valid, n)
                else:
                    state, dec_state, codes, valid, wav = \
                        self.generator.chunk_with_audio(
                            state, dec_state, sampler, prompt_cap=bucket,
                            n_frames=n)
                    nxt = (wav, valid, n)
                if trace and steps == 0:
                    from .utils.sync import hard_sync as _hs
                    _hs(nxt[0])
                    tlog("fused lm+codec chunk 0")
                steps += n
            else:
                nxt = None

            if pending is not None:
                data0, valid0, n0 = pending
                valid_np = np.asarray(valid0[0])
                n_valid = int(valid_np.sum())
                metrics.chunk_ms.append(watch.lap_ms())
                if n_valid > 0:
                    if use_onnx:
                        is_final = (n_valid < n0) or (nxt is None)
                        codes_np = np.asarray(data0[0, :n_valid])
                        chunk, dec_state = self.onnx_decoder.decode(
                            codes_np, dec_state, is_final=is_final)
                        chunk = np.asarray(chunk, np.float32)
                    else:
                        chunk = np.asarray(data0[0, : n_valid * spf],
                                           np.float32)
                    if len(chunk):
                        if metrics.ttft_ms is None:
                            metrics.ttft_ms = (time.perf_counter()
                                               - t_start) * 1000.0
                        frames_emitted += n_valid
                        yield chunk
                if n_valid < n0:   # EOS inside this chunk: drop lookahead
                    metrics.eos = True
                    break
            pending = nxt
            if pending is None:
                break

        metrics.total_ms = (time.perf_counter() - t_start) * 1000.0
        metrics.frames = frames_emitted
        metrics.audio_seconds = frames_emitted * spf / P.SAMPLE_RATE
        self.last_metrics = metrics
        from .utils.logging import log_event
        log_event("generation", **metrics.as_dict())

    def _bucket(self, s: int) -> int:
        """Round the prompt length up to a reuse-friendly bucket."""
        cap = self.config.runtime.max_prompt_len
        b = 32
        while b < s and b < cap:
            b *= 2
        return min(max(b, 32), cap)

    # ------------------------------------------------- prefix-KV reuse
    PREFIX_CACHE_MIN_ROWS = 64     # below this a prefix prefill is cheap

    def _start_state(self, plan: PromptPlan, key):
        """Prefill, reusing the prompt-prefix KV when this voice+instruction
        was seen before.  A clone prompt's prefix (ref codes + ref text) is
        hundreds of rows re-prefilled per sentence by generate_long — with
        the cache only the task text prefills.  Disable with
        QTTS_PREFIX_CACHE=0."""
        import os
        use_prefix = (os.environ.get("QTTS_PREFIX_CACHE", "1") != "0"
                      and plan.prefix_len >= self.PREFIX_CACHE_MIN_ROWS
                      and plan.length <= self.config.runtime.max_prompt_len)
        if not use_prefix:
            bucket = self._bucket(plan.length)
            return self._start_fused(plan, bucket, key), bucket

        p_cap = ((plan.prefix_len + 63) // 64) * 64
        suffix = plan.suffix_plan()
        s_cap = ((suffix.length + 15) // 16) * 16
        bucket = self._bucket(max(plan.length, p_cap,
                                  plan.prefix_len + s_cap))
        if plan.prefix_len + s_cap > bucket or p_cap > bucket:
            # _bucket clamped at max_prompt_len: the suffix pad rows would
            # spill past the prompt region into decode slots — fall back
            bucket = self._bucket(plan.length)
            return self._start_fused(plan, bucket, key), bucket
        def start_suffix(entry):
            """Fused suffix assembly + continued prefill: one program."""
            a, lens_s, _ = self._plans_to_arrays(suffix, s_cap)
            return self.generator.start_with_prefix_from_plans(
                entry[0], entry[1], plan.prefix_len,
                self.assets.text_table, self.assets.codec_tables,
                a["text_idx"], a["codec_idx"], a["frame_slot"],
                a["spk_flag"], a["frames"], a["spk_emb"], lens_s, key,
                total_bucket=bucket)

        fp = (plan.prefix_fingerprint(), p_cap)
        entry = self._prefix_kv.get(fp)
        if entry is not None:
            self._prefix_kv.move_to_end(fp)
            return start_suffix(entry), bucket

        embeds, lengths = self.prompt_to_device(plan, bucket)
        state = self.generator.start(embeds, lengths, key)
        # Free extraction: slots [0, p_cap) of this prefill ARE the prefix
        # KV (positions/masks identical by construction).
        self._prefix_kv[fp] = (state.cache.k[:, :, :, :p_cap],
                               state.cache.v[:, :, :, :p_cap])
        while len(self._prefix_kv) > self._prefix_kv_max:
            self._prefix_kv.popitem(last=False)
        # Generate through the continue path even on a miss: the full and
        # continued prefills tile differently on TPU, so their bf16 logits
        # differ in the last ulps — enough to flip sampled codes.  Routing
        # every request through the same path keeps a voice's synthesis
        # reproducible from the first request on.
        return start_suffix(self._prefix_kv[fp]), bucket

    def _warn_dev_mode(self) -> None:
        """Loudly flag components running on random weights: a production
        install must never silently synthesize noise (round-1 ADVICE high).
        QTTS_REQUIRE_WEIGHTS=1 turns the warning into a hard error."""
        if not self.dev_mode_components:
            return
        import os
        from .utils.logging import get_logger
        comps = ", ".join(self.dev_mode_components)
        msg = (f"DEV MODE: no trained weights found for [{comps}] under "
               f"{self.model_dir} — synthesis will be NOISE, not speech. "
               "Run download_models() or place the model files "
               "(gguf/*.gguf, codec/*.npz or onnx/*.onnx) in the model dir.")
        if os.environ.get("QTTS_REQUIRE_WEIGHTS") == "1":
            raise RuntimeError(msg)
        get_logger().warning(msg)

    @staticmethod
    def _load_npz_or(path: Path, fallback):
        if path.exists():
            data = np.load(path, allow_pickle=False)
            return _unflatten_npz(dict(data))
        return fallback()


_SENTENCE_ENDS = set(".!?;。！？；…\n")


def split_sentences(text: str, max_chars: int = 120):
    """Greedy sentence-boundary chunking for long-text generation."""
    pieces, cur = [], []
    count = 0
    for ch in text:
        cur.append(ch)
        count += 1
        if ch in _SENTENCE_ENDS and count >= 4:
            pieces.append("".join(cur).strip())
            cur, count = [], 0
        elif count >= max_chars:
            pieces.append("".join(cur).strip())
            cur, count = [], 0
    if cur and "".join(cur).strip():
        pieces.append("".join(cur).strip())
    return [p for p in pieces if p]


def _unflatten_npz(flat: Dict[str, np.ndarray]):
    """Rebuild a nested dict/tuple pytree from 'a/b/0/c'-style npz keys."""
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return tuple(fix(node[str(i)]) for i in range(len(node)))
        return {k: fix(v) for k, v in node.items()}

    return fix(tree)
