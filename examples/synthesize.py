"""Basic synthesis with a preset speaker.

    python examples/synthesize.py --text "你好世界" --speaker vivian
"""
import argparse

from qwen3_tts_tpu import SamplerConfig, TtsEngine

ap = argparse.ArgumentParser()
ap.add_argument("--text", default="Hello from the TPU")
ap.add_argument("--speaker", default="vivian")
ap.add_argument("--model-dir", default="models")
ap.add_argument("--out", default="out.wav")
args = ap.parse_args()

engine = TtsEngine(args.model_dir)
engine.set_sampler_config(SamplerConfig(temperature=0.7, top_k=40,
                                        top_p=0.9, seed=42))
audio = engine.generate_with_voice(args.text, engine.get_speaker(args.speaker))
audio.save_wav(args.out)
print(f"{audio.duration():.2f}s -> {args.out}   metrics:",
      engine.last_metrics.as_dict())
