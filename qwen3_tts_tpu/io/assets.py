"""Embedding-table assets: text table, 16 codec codebook tables, 2048->1024
projection — loaded once to device arrays.

Replaces /root/reference/src/assets_manager.rs: the reference re-reads rows
into host Vecs on every lookup and runs the projection as a scalar loop on
CPU (assets_manager.rs:383-417); here the tables are device arrays, lookups
are `jnp.take` gathers inside jitted code, and the projection is one einsum.
The per-codebook 1024-d tables (`get_codec_embedding_1024` in the reference,
i.e. project(table_row)) are precomputed once at load.

Sources, in priority order (mirroring Assets::load at assets_manager.rs:14-26):
  1. `qwen3_assets.gguf` — tensors `proj.weight` [1024,2048], `proj.bias`,
     `text_embd` [vocab,2048], `codec_embd.0..15`;
  2. legacy NPY files (`proj_weight.npy`, `text_embedding_projected.npy`,
     `codec_embedding_{i}.npy`);
  3. deterministic random init (development / benchmarking without weights).

Dev mode supports a reduced `text_rows` table; token ids are folded with a
modulo so the full 151936-row table is not required to exercise the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import protocol as P
from .gguf import read_gguf


@dataclass
class Assets:
    text_table: jax.Array        # [R_text, 2048]
    codec_tables: jax.Array      # [16, R_codec, 2048]
    codec_tables_1024: jax.Array  # [16, R_codec, 1024] = project(codec_tables)
    proj_w: jax.Array            # [1024, 2048]  (PyTorch [out, in] layout)
    proj_b: jax.Array            # [1024]
    tts_pad: jax.Array           # [2048] = text_table[TEXT_AUDIO_MARKER]
    text_rows: int
    codec_rows: int
    # Host (numpy) mirrors for prompt assembly: prompt building is dozens of
    # tiny gathers; doing them eagerly on a remote device costs seconds of
    # dispatch latency, on host it is microseconds (one device_put at the
    # end).  Filled lazily by host_tables().
    _host_text: Optional[np.ndarray] = None
    _host_codec: Optional[np.ndarray] = None

    def host_tables(self):
        if self._host_text is None:
            # Fallback only: constructors normally provide the host mirrors
            # from their numpy source so nothing is ever pulled back off the
            # device (a device->host copy of the tables is GBs over a
            # potentially slow transport).
            object.__setattr__(self, "_host_text",
                               np.asarray(self.text_table, np.float32))
            object.__setattr__(self, "_host_codec",
                               np.asarray(self.codec_tables, np.float32))
        return self._host_text, self._host_codec

    # -- host-side lookups (prompt building) ------------------------------
    def text_emb_np(self, ids) -> np.ndarray:
        text, _ = self.host_tables()
        ids = np.asarray(ids, np.int64) % self.text_rows
        return text[ids]

    def codec_emb_np(self, q: int, codes) -> np.ndarray:
        _, codec = self.host_tables()
        codes = np.asarray(codes, np.int64)
        safe = np.clip(codes, 0, self.codec_rows - 1)
        emb = codec[q][safe]
        ok = ((codes >= 0) & (codes < self.codec_rows))[..., None]
        return np.where(ok, emb, 0.0).astype(np.float32)

    def frame_emb_sum_np(self, frames) -> np.ndarray:
        _, codec = self.host_tables()
        frames = np.asarray(frames, np.int64)
        safe = np.clip(frames, 0, self.codec_rows - 1)
        out = np.zeros(frames.shape[:-1] + (codec.shape[-1],), np.float32)
        for q in range(codec.shape[0]):
            ok = ((frames[..., q] >= 0)
                  & (frames[..., q] < self.codec_rows))[..., None]
            out += np.where(ok, codec[q][safe[..., q]], 0.0)
        return out

    # -- lookups (usable inside jit) --------------------------------------
    def text_emb(self, ids) -> jnp.ndarray:
        """Rows of the text table; ids folded mod text_rows (dev tables)."""
        ids = jnp.asarray(ids, jnp.int32) % self.text_rows
        return jnp.take(self.text_table, ids, axis=0)

    def codec_emb(self, q: int, codes) -> jnp.ndarray:
        """Rows of codec table q; out-of-range codes return zeros, matching
        assets_manager.rs:419-437."""
        codes = jnp.asarray(codes, jnp.int32)
        safe = jnp.clip(codes, 0, self.codec_rows - 1)
        emb = jnp.take(self.codec_tables[q], safe, axis=0)
        ok = ((codes >= 0) & (codes < self.codec_rows))[..., None]
        return jnp.where(ok, emb, 0.0)

    def frame_emb_sum(self, codes) -> jnp.ndarray:
        """Sum of the 16 per-codebook embeddings for frames [..., 16]."""
        codes = jnp.asarray(codes, jnp.int32)
        safe = jnp.clip(codes, 0, self.codec_rows - 1)
        # gather per codebook: codec_tables [16, R, D], codes [..., 16]
        gathered = jnp.stack(
            [jnp.take(self.codec_tables[q], safe[..., q], axis=0)
             for q in range(self.codec_tables.shape[0])], axis=-2)
        ok = ((codes >= 0) & (codes < self.codec_rows))[..., None]
        return jnp.sum(jnp.where(ok, gathered, 0.0), axis=-2)

    def project(self, hidden) -> jnp.ndarray:
        """2048 -> 1024 projection (proj.weight @ h + bias)."""
        h = jnp.asarray(hidden, jnp.float32)
        return jnp.einsum("...d,od->...o", h, self.proj_w.astype(jnp.float32),
                          preferred_element_type=jnp.float32) + self.proj_b

    def pack(self) -> dict:
        """Pytree of the arrays needed inside the jitted generation loop."""
        return {
            "codec_tables": self.codec_tables,
            "codec_tables_1024": self.codec_tables_1024,
            "proj_w": self.proj_w,
            "proj_b": self.proj_b,
            "tts_pad": self.tts_pad,
        }

    # -- constructors ------------------------------------------------------
    @staticmethod
    def load(model_dir, dtype=jnp.float32) -> "Assets":
        model_dir = Path(model_dir)
        gguf_path = model_dir / "qwen3_assets.gguf"
        if gguf_path.exists():
            return Assets.from_gguf(gguf_path, dtype)
        npy = model_dir / "proj_weight.npy"
        if npy.exists():
            return Assets.from_npy(model_dir, dtype)
        raise FileNotFoundError(
            f"no qwen3_assets.gguf or proj_weight.npy under {model_dir}")

    @staticmethod
    def from_gguf(path, dtype=jnp.float32) -> "Assets":
        g = read_gguf(path)
        proj_w = g.read_tensor("proj.weight")
        proj_b = g.read_tensor("proj.bias")
        text = g.read_tensor("text_embd")
        codecs = [g.read_tensor(f"codec_embd.{i}")
                  for i in range(P.NUM_CODEBOOKS)
                  if f"codec_embd.{i}" in g.tensors]
        return Assets.from_arrays(proj_w, proj_b, text, np.stack(codecs), dtype)

    @staticmethod
    def from_npy(model_dir, dtype=jnp.float32) -> "Assets":
        model_dir = Path(model_dir)
        proj_w = np.load(model_dir / "proj_weight.npy")
        proj_b = np.load(model_dir / "proj_bias.npy")
        text = np.load(model_dir / "text_embedding_projected.npy")
        codecs = np.stack([
            np.load(model_dir / f"codec_embedding_{i}.npy")
            for i in range(P.NUM_CODEBOOKS)])
        return Assets.from_arrays(proj_w, proj_b, text, codecs, dtype)

    @staticmethod
    def from_arrays(proj_w, proj_b, text, codecs, dtype=jnp.float32) -> "Assets":
        # Keep the numpy source as the host mirror (prompt building) and push
        # one copy to device; never read the tables back off the device.
        proj_w_np = np.asarray(proj_w, np.float32).reshape(-1, P.TALKER_DIM)
        proj_b_np = np.asarray(proj_b, np.float32).reshape(-1)
        text_np = np.asarray(text, np.float32).reshape(-1, P.TALKER_DIM)
        codecs_np = np.asarray(codecs, np.float32)
        if codecs_np.ndim == 2:
            codecs_np = codecs_np.reshape(P.NUM_CODEBOOKS, -1, P.TALKER_DIM)
        tts_pad = (text_np[P.TEXT_AUDIO_MARKER]
                   if text_np.shape[0] > P.TEXT_AUDIO_MARKER
                   else np.zeros((P.TALKER_DIM,), np.float32))
        codecs_dev = jnp.asarray(codecs_np, dtype)
        proj_w_dev = jnp.asarray(proj_w_np)
        codecs_1024 = jnp.einsum(
            "qrd,od->qro", codecs_dev.astype(jnp.float32),
            proj_w_dev, preferred_element_type=jnp.float32) + proj_b_np
        return Assets(
            text_table=jnp.asarray(text_np, dtype),
            codec_tables=codecs_dev,
            codec_tables_1024=codecs_1024.astype(dtype),
            proj_w=proj_w_dev,
            proj_b=jnp.asarray(proj_b_np),
            tts_pad=jnp.asarray(tts_pad),
            text_rows=int(text_np.shape[0]),
            codec_rows=int(codecs_np.shape[1]),
            _host_text=text_np,
            _host_codec=codecs_np,
        )

    @staticmethod
    def random_init(key: Optional[jax.Array] = None, text_rows: int = 4096,
                    codec_rows: int = 4096, dtype=jnp.float32,
                    scale: float = 0.02) -> "Assets":
        """Deterministic random tables for development and benchmarking.

        Generated directly on device (one fused jit) — no host<->device bulk
        transfer; prompt assembly also runs on device (prompt.assemble), so
        no host mirror is required either."""
        key = key if key is not None else jax.random.PRNGKey(0)

        @jax.jit
        def gen(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            text = jax.random.normal(
                k1, (text_rows, P.TALKER_DIM), jnp.float32) * scale
            codecs = jax.random.normal(
                k2, (P.NUM_CODEBOOKS, codec_rows, P.TALKER_DIM),
                jnp.float32) * scale
            proj_w = jax.random.normal(
                k3, (P.PREDICTOR_DIM, P.TALKER_DIM), jnp.float32) * scale
            proj_b = jax.random.normal(
                k4, (P.PREDICTOR_DIM,), jnp.float32) * scale
            codecs_1024 = jnp.einsum(
                "qrd,od->qro", codecs, proj_w,
                preferred_element_type=jnp.float32) + proj_b
            marker = P.TEXT_AUDIO_MARKER % text_rows
            return (text.astype(dtype), codecs.astype(dtype),
                    codecs_1024.astype(dtype), proj_w, proj_b, text[marker])

        text, codecs, codecs_1024, proj_w, proj_b, tts_pad = gen(key)
        return Assets(
            text_table=text, codec_tables=codecs,
            codec_tables_1024=codecs_1024, proj_w=proj_w, proj_b=proj_b,
            tts_pad=tts_pad, text_rows=text_rows, codec_rows=codec_rows)
