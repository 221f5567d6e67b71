"""Zero-shot voice cloning from a 24 kHz reference WAV."""
from qwen3_tts_tpu import TtsEngine

engine = TtsEngine("models")
voice = engine.create_voice_file("reference_24k.wav", "reference transcript")
voice.save("my_voice.json")
audio = engine.generate_with_voice("text in the cloned voice", voice,
                                   instruct="Happy")
audio.save_wav("cloned.wav")
