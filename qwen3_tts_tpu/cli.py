"""Command-line interface, flag-for-flag compatible with the reference binary
(/root/reference/src/bin/qwen3_tts.rs:10-74):

  python -m qwen3_tts_tpu --text "..." [--model-dir models] [--quant none]
      [--voice-file v.json] [--ref-audio r.wav --ref-text "..."]
      [--save-voice out.json] [--output output.wav] [--max-steps 512]
      [--speakers-dir speakers] [--speaker vivian] [--instruction "Happy"]
      [--temperature 0.7] [--top-k 40] [--top-p 0.9] [--seed N]

plus TPU-framework extras: --stream (print chunk timings as audio streams)
and --metrics (dump JSON generation metrics).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="qwen3_tts_tpu",
                                description="TPU-native Qwen3-TTS")
    p.add_argument("--model-dir", type=Path, default=Path("models"))
    p.add_argument("--quant", default="none",
                   choices=["none", "q5_k_m", "q8_0"])
    p.add_argument("--text", "-t", required=True)
    p.add_argument("--voice-file", "-v", type=Path)
    p.add_argument("--ref-audio", type=Path)
    p.add_argument("--ref-text")
    p.add_argument("--save-voice", type=Path)
    p.add_argument("--output", "-o", type=Path, default=Path("output.wav"))
    p.add_argument("--max-steps", type=int, default=512)
    p.add_argument("--speakers-dir", type=Path, default=Path("speakers"))
    p.add_argument("--speaker", "-s")
    p.add_argument("--instruction")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="stream chunks and report TTFT")
    p.add_argument("--long", action="store_true",
                   help="sentence-chunked long-text generation")
    p.add_argument("--metrics", action="store_true",
                   help="print JSON metrics after generation")
    p.add_argument("--skip-download", action="store_true",
                   help="do not try to fetch missing model files")
    p.add_argument("--config", type=Path, default=None,
                   help="engine config file (json/toml) overriding defaults")
    p.add_argument("--audition-voice", type=Path,
                   help="decode a VoiceFile's reference codes to WAV and exit")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    t_total = time.perf_counter()

    from .core.config import SamplerConfig
    from .engine import TtsEngine
    from .io.voice_file import VoiceFile

    print(f"=== Qwen3-TTS TPU CLI ===")
    print(f"Model dir: {args.model_dir}  quant: {args.quant}")

    # Backend-init watchdog: a dead device transport (e.g. a downed TPU
    # tunnel) hangs forever inside PJRT init, which reads as a framework
    # freeze.  Turn it into a diagnosed failure.  Only device *init* is
    # bounded — compiles can legitimately take minutes and are untouched.
    import os
    import threading

    def _init_timeout():
        print("error: device backend failed to initialize within "
              f"{timeout_s:.0f} s (device transport down?).  Set "
              "QTTS_INIT_TIMEOUT to adjust (0 disables).", file=sys.stderr)
        os._exit(3)

    timeout_s = float(os.environ.get("QTTS_INIT_TIMEOUT", "300"))
    if timeout_s > 0:
        watchdog = threading.Timer(timeout_s, _init_timeout)
        watchdog.daemon = True
        watchdog.start()
        import jax
        jax.devices()
        watchdog.cancel()

    if not args.skip_download:
        try:
            TtsEngine.download_models(args.model_dir, args.quant)
        except RuntimeError as e:
            print(f"[warn] {e}", file=sys.stderr)
            print("[warn] continuing with random-init weights "
                  "(development mode)", file=sys.stderr)

    cfg = None
    if args.config:
        from .core.config import EngineConfig
        cfg = EngineConfig.from_file(args.config)
    engine = TtsEngine(model_dir=args.model_dir, quant=args.quant,
                       config=cfg)
    if args.audition_voice:
        vf = VoiceFile.load(args.audition_voice)
        audio = engine.decode_codes(vf.audio_codes)
        audio.save_wav(args.output)
        print(f"Auditioned {len(vf.audio_codes) // 16} reference frames "
              f"-> {args.output}")
        return 0
    engine.set_max_steps(args.max_steps)
    engine.set_sampler_config(SamplerConfig(
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        seed=args.seed))
    print(f"Sampler: temp={args.temperature} top_k={args.top_k} "
          f"top_p={args.top_p} seed={args.seed}")

    if args.speakers_dir.exists():
        engine.load_speakers(args.speakers_dir)

    if args.ref_audio is not None:
        print(f"Creating voice from reference: {args.ref_audio}")
        voice = engine.create_voice_file(args.ref_audio, args.ref_text or "")
        if args.save_voice:
            voice.save(args.save_voice)
            print(f"Saved voice file to {args.save_voice}")
    elif args.voice_file is not None:
        voice = VoiceFile.load(args.voice_file)
    else:
        voice = engine.get_speaker(args.speaker or "vivian")
    print(f"Voice: {voice.name or 'Dynamic'}")

    t_gen = time.perf_counter()
    if args.stream:
        import numpy as np
        parts = []
        for i, chunk in enumerate(engine.generate_stream(
                args.text, voice, args.instruction)):
            dt = (time.perf_counter() - t_gen) * 1000
            print(f"  chunk {i}: {len(chunk)} samples @ {dt:.0f} ms")
            parts.append(chunk)
        from .io.audio import AudioSample
        audio = AudioSample(
            samples=(np.concatenate(parts) if parts
                     else np.zeros(0, np.float32)),
            sample_rate=24000, channels=1)
    elif args.long:
        audio = engine.generate_long(args.text, voice, args.instruction)
    else:
        audio = engine.generate_with_voice(args.text, voice, args.instruction)
    print(f"Generation took {time.perf_counter() - t_gen:.2f}s "
          f"for {audio.duration():.2f}s audio")

    audio.save_wav(args.output)
    print(f"Saved to {args.output}")
    if args.metrics and engine.last_metrics:
        print(json.dumps(engine.last_metrics.as_dict()))
    print(f"Total time: {time.perf_counter() - t_total:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
