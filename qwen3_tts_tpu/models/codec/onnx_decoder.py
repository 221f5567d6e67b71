"""Streaming codec decode/encode directly from the published ONNX graphs.

The reference drives three ONNX Runtime CPU sessions
(/root/reference/src/models/onnx.rs): the streaming `AudioDecoder`
(onnx.rs:324-496), the `AudioEncoder` (onnx.rs:82-122) and the
`SpeakerEncoder` net (onnx.rs:140-163).  Here the same .onnx files execute
through io.onnx_exec as XLA programs on the TPU — op-for-op fidelity with
the shipped checkpoints without hand-porting the graphs, and the compiled
functions are jit-cached per state-shape signature (the carried histories
grow until the graph's internal windows saturate, so the set of signatures
is small and stable).

State contract (DecoderState, onnx.rs:461-496): zero-length carried tensors
  pre_conv_history (1,512,0)  latent_buffer (1,1024,0)  conv_history (1,1024,0)
  past_key_i / past_value_i (1,16,0,64) for i in 0..8
inputs audio_codes [1,N,16] i64 + is_last [1] f32; outputs final_wav,
valid_samples and the next_* states.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import protocol as P
from ...io.onnx_exec import OnnxExecutor


class OnnxStreamingDecoder:
    """codes -> waveform with functional carried state, like the reference's
    `AudioDecoder::decode` (onnx.rs:342-458)."""

    def __init__(self, executor: OnnxExecutor):
        self.ex = executor
        self._run = jax.jit(executor.run)
        names = set(executor.input_names)
        self.state_names: List[str] = sorted(
            n for n in names if n not in ("audio_codes", "is_last"))
        # zero-init shapes from the graph's declared inputs where the dims
        # are concrete; symbolic (streamed) dims start at 0 (onnx.rs:477-487)
        self._init_shapes: Dict[str, Tuple[int, ...]] = {}
        for vi in executor.graph.inputs:
            if vi.name in self.state_names:
                self._init_shapes[vi.name] = tuple(
                    d if isinstance(d, int) else 0 for d in vi.shape)

    @classmethod
    def load(cls, path) -> "OnnxStreamingDecoder":
        return cls(OnnxExecutor.load(path))

    def create_state(self) -> Dict[str, np.ndarray]:
        return {name: np.zeros(self._init_shapes.get(name, (0,)), np.float32)
                for name in self.state_names}

    def decode(self, codes, state: Dict[str, np.ndarray],
               is_final: bool = False
               ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """One streaming step.  `codes`: [N,16] / flat multiple of 16.
        Returns (waveform f32 [valid_samples], new_state)."""
        codes = np.asarray(codes, np.int64).reshape(-1)
        n = len(codes) // P.NUM_CODEBOOKS          # truncate (engine.rs:509)
        if n == 0:
            return np.zeros(0, np.float32), state
        frames = codes[: n * P.NUM_CODEBOOKS].reshape(1, n, P.NUM_CODEBOOKS)
        frames = np.clip(frames, 0, P.CODEBOOK_SIZE - 1)  # engine.rs:513
        feeds = {"audio_codes": frames,
                 "is_last": np.asarray([1.0 if is_final else 0.0],
                                       np.float32)}
        feeds.update(state)
        out = self._run(self.ex.params, feeds)
        wav = np.asarray(out["final_wav"], np.float32).reshape(-1)
        if "valid_samples" in out:
            valid = int(np.asarray(out["valid_samples"]).reshape(-1)[0])
            wav = wav[:valid]
        new_state = {}
        for name in self.state_names:
            nxt = name.replace("past_", "next_")
            if not nxt.startswith("next_"):
                nxt = "next_" + nxt
            new_state[name] = out[nxt] if nxt in out else state[name]
        return wav, new_state


    # ------------------------------------------------------------ batched
    def decode_batch(self, codes: np.ndarray, states: List[Dict[str, Any]],
                     is_final=False):
        """Batched streaming step via jax.vmap for serving lanes whose
        carried states share shapes (lanes that started together and
        decode in lockstep — the steady state of wave batching).

        Inside vmap each example traces with its UNBATCHED shapes, so the
        executor's host shape-folding is untouched and the real graph's
        batch-1 contract holds per lane.  codes: [B, n, 16]; states: list
        of B state dicts with identical shapes; is_final: bool or [B]
        bools (per-lane flush).  Returns (wavs list of B f32 arrays, new
        states list).  Falls back to the sequential path if shapes differ.
        """
        b = len(states)
        finals = np.broadcast_to(np.asarray(is_final, bool), (b,))
        shapes0 = {k: v.shape for k, v in states[0].items()}
        if any({k: np.shape(v) for k, v in s.items()} != shapes0
               for s in states[1:]):
            out = [self.decode(codes[i], states[i], bool(finals[i]))
                   for i in range(b)]
            return [w for w, _ in out], [s for _, s in out]

        codes = np.asarray(codes, np.int64)
        n = codes.shape[1]
        if n == 0:
            return [np.zeros(0, np.float32)] * b, states
        frames = np.clip(codes.reshape(b, 1, n, P.NUM_CODEBOOKS),
                         0, P.CODEBOOK_SIZE - 1)
        stacked = {k: jnp.stack([jnp.asarray(s[k]) for s in states])
                   for k in self.state_names}
        feeds = {"audio_codes": jnp.asarray(frames),
                 "is_last": jnp.asarray(finals, jnp.float32).reshape(b, 1)}
        feeds.update(stacked)
        if not hasattr(self, "_vrun"):
            self._vrun = jax.jit(jax.vmap(self.ex.run, in_axes=(None, 0)))
        out = self._vrun(self.ex.params, feeds)
        wav = np.asarray(out["final_wav"], np.float32).reshape(b, -1)
        if "valid_samples" in out:
            # host-folded outputs may come back unbatched (vmap constant)
            flat = np.asarray(out["valid_samples"]).reshape(-1)
            valid = (flat if flat.size == b
                     else np.full(b, int(flat[0])))
        else:
            valid = np.full(b, wav.shape[1])
        wavs = [wav[i, : int(valid[i])] for i in range(b)]
        new_states = []
        for i in range(b):
            st = {}
            for name in self.state_names:
                nxt = name.replace("past_", "next_")
                if not nxt.startswith("next_"):
                    nxt = "next_" + nxt
                st[name] = (np.asarray(out[nxt][i]) if nxt in out
                            else states[i][name])
            new_states.append(st)
        return wavs, new_states


class OnnxAudioEncoder:
    """24 kHz waveform -> [N,16] codec codes (onnx.rs:82-122)."""

    def __init__(self, executor: OnnxExecutor):
        self.ex = executor
        self._run = jax.jit(executor.run)

    @classmethod
    def load(cls, path) -> "OnnxAudioEncoder":
        return cls(OnnxExecutor.load(path))

    def encode(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        out = self._run(self.ex.params, {"input_values": wav})
        codes = np.asarray(out["audio_codes"], np.int64)
        return codes.reshape(codes.shape[-2], codes.shape[-1])  # [N, 16]


class OnnxSpeakerEncoder:
    """log-mel frames [F,128] -> speaker embedding [2048] (onnx.rs:140-163).
    The mel front-end stays native (ops.mel matches onnx.rs:167-320)."""

    def __init__(self, executor: OnnxExecutor):
        self.ex = executor
        self._run = jax.jit(executor.run)

    @classmethod
    def load(cls, path) -> "OnnxSpeakerEncoder":
        return cls(OnnxExecutor.load(path))

    def encode_mels(self, mels: np.ndarray) -> np.ndarray:
        mels = np.asarray(mels, np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        out = self._run(self.ex.params, {"mels": mels})
        emb = next(iter(out.values())) if "spk_emb" not in out \
            else out["spk_emb"]
        return np.asarray(emb, np.float32).reshape(-1)
