"""qwen3_tts_tpu — a TPU-native (JAX/XLA/Pallas) Qwen3-TTS framework.

Re-exports mirror the reference crate root (/root/reference/src/lib.rs:11-16):
TtsEngine, SamplerConfig, PromptBuilder, AudioSample, Tokenizer, VoiceFile.
"""

from .core.config import (CodecDecoderConfig, CodecEncoderConfig,
                          EngineConfig, PredictorConfig, RuntimeConfig,
                          SamplerConfig, SpeakerEncoderConfig, TalkerConfig)
from .core import protocol
from .engine import PromptTooLongError, TtsEngine
from .io.audio import AudioSample
from .io.voice_file import VoiceFile
from .prompt import PromptBuilder, PromptData
from .utils.tokenizer import Tokenizer

__version__ = "0.1.0"

__all__ = [
    "TtsEngine", "SamplerConfig", "PromptBuilder", "PromptData",
    "AudioSample", "Tokenizer", "VoiceFile", "EngineConfig", "TalkerConfig",
    "PredictorConfig", "CodecDecoderConfig", "CodecEncoderConfig",
    "SpeakerEncoderConfig", "RuntimeConfig", "protocol",
    "PromptTooLongError",
]
