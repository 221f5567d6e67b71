"""Real tokenizer.json path: round-1 gap was that only the dev hashing
fallback was ever exercised.  Builds a genuine HF tokenizers BPE file
offline and drives Tokenizer.load + the engine prompt path with it."""

import json

import numpy as np
import pytest

from qwen3_tts_tpu.utils.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def real_tokenizer_file(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import models, pre_tokenizers, trainers

    tok = tokenizers.Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<unk>", "<|im_start|>",
                                        "<|im_end|>"])
    corpus = ["hello world this is a test of speech synthesis",
              "the quick brown fox jumps over the lazy dog",
              "qwen three text to speech on tensor processing units"] * 10
    tok.train_from_iterator(corpus, trainer)
    d = tmp_path_factory.mktemp("tok")
    path = d / "tokenizer.json"
    tok.save(str(path))
    return d


def test_load_real_tokenizer_json(real_tokenizer_file):
    t = Tokenizer.load(real_tokenizer_file)
    assert not t.is_fallback
    ids = t.encode("hello world")
    assert ids and all(isinstance(i, int) for i in ids)
    # deterministic + decode inverts (BPE on in-vocab words)
    assert ids == t.encode("hello world")
    assert "hello" in t.decode(ids)


def test_engine_prompt_path_with_real_tokenizer(real_tokenizer_file,
                                                tmp_path, tiny_cfg):
    """TtsEngine wired with a real tokenizer.json: prompt build + synthesis
    run through genuine token ids, not the hashing fallback."""
    import shutil
    from qwen3_tts_tpu.core.config import SamplerConfig
    from qwen3_tts_tpu.engine import TtsEngine
    from qwen3_tts_tpu.io.voice_file import VoiceFile

    model_dir = tmp_path / "model"
    (model_dir / "tokenizer").mkdir(parents=True)
    shutil.copy(real_tokenizer_file / "tokenizer.json",
                model_dir / "tokenizer" / "tokenizer.json")
    spk = model_dir / "preset_speakers"
    spk.mkdir()
    rng = np.random.default_rng(0)
    vf = VoiceFile.new("", [], rng.standard_normal(2048).astype(np.float32)
                       * 0.02)
    vf.save(spk / "vivian.json")

    eng = TtsEngine(model_dir=model_dir, config=tiny_cfg)
    assert not eng.tokenizer.is_fallback
    eng.set_max_steps(2)
    eng.set_sampler_config(SamplerConfig(seed=5))
    audio = eng.generate_with_voice("hello world", eng.get_speaker("vivian"))
    assert np.isfinite(audio.samples).all()
