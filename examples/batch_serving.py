"""Multi-stream serving: wave batching and continuous batching."""
from qwen3_tts_tpu import TtsEngine
from qwen3_tts_tpu.serve.batch import BatchRequest, BatchSynthesizer
from qwen3_tts_tpu.serve.continuous import ContinuousBatcher

engine = TtsEngine("models")
voice = engine.get_speaker("vivian")
requests = [BatchRequest(f"utterance number {i}", voice) for i in range(32)]

# wave batching: all lanes start/refill together
results = BatchSynthesizer(engine, batch_size=8).synthesize(requests)

# continuous batching: lanes refill as streams finish
results = ContinuousBatcher(engine, batch_size=8).run(requests)
for i, r in enumerate(results[:4]):
    print(i, r.frames, "frames", r.audio.duration(), "s")
