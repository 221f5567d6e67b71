"""Streaming synthesis: consume ~333 ms chunks while the LM generates."""
import time

from qwen3_tts_tpu import TtsEngine

engine = TtsEngine("models")
voice = engine.get_speaker("serena")
t0 = time.perf_counter()
for i, chunk in enumerate(engine.generate_stream("streaming hello", voice)):
    print(f"chunk {i}: {len(chunk)} samples at "
          f"{(time.perf_counter() - t0) * 1000:.0f} ms")
