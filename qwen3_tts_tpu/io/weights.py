"""GGUF checkpoint import for the talker and predictor LMs.

The reference hands its GGUF files to llama.cpp (engine.rs:126-130); here the
same files are parsed with io.gguf, dequantized to numpy, and mapped onto the
framework's stacked-layer parameter pytrees.  Model dims are read from GGUF
metadata (block_count, head counts, etc.) so quantized variants load without
manual config.  When no checkpoint exists, deterministic random init keeps
the full pipeline runnable (development / benchmarking mode).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PredictorConfig, TalkerConfig
from .gguf import GGUFFile, read_gguf


def _meta(g: GGUFFile, arch: str, key: str, default=None):
    return g.metadata.get(f"{arch}.{key}", default)


def config_from_gguf(g: GGUFFile, base) -> Any:
    """Derive a TalkerConfig/PredictorConfig from GGUF metadata, keeping
    `base` fields where metadata is absent."""
    arch = g.metadata.get("general.architecture", "qwen3")
    n_layers = _meta(g, arch, "block_count", base.n_layers)
    n_heads = _meta(g, arch, "attention.head_count", base.n_heads)
    n_kv = _meta(g, arch, "attention.head_count_kv", base.n_kv_heads)
    d_model = _meta(g, arch, "embedding_length", base.d_model)
    d_ff = _meta(g, arch, "feed_forward_length", base.d_ff)
    head_dim = _meta(g, arch, "attention.key_length",
                     d_model // max(int(n_heads), 1))
    theta = _meta(g, arch, "rope.freq_base", base.rope_theta)
    eps = _meta(g, arch, "attention.layer_norm_rms_epsilon", base.rms_eps)
    upd = dict(n_layers=int(n_layers), n_heads=int(n_heads),
               n_kv_heads=int(n_kv), d_model=int(d_model), d_ff=int(d_ff),
               head_dim=int(head_dim), rope_theta=float(theta),
               rms_eps=float(eps))
    if isinstance(base, TalkerConfig):
        sections = (_meta(g, arch, "rope.mrope_section")
                    or _meta(g, arch, "rope.dimension_sections"))
        if sections:
            sections = tuple(int(s) for s in sections)
            while len(sections) < 4:
                sections = sections + (0,)
            upd["mrope_sections"] = sections
    return dataclasses.replace(base, **upd)


def _stack_layers(g: GGUFFile, cfg, dtype) -> Dict[str, Any]:
    l = cfg.n_layers
    # Batch-read every layer tensor in one parallel pass over the file
    # (native loader threads across tensors; see native/qtts_native.cpp).
    wanted = [f"blk.{i}.{sfx}.weight" for i in range(l)
              for sfx in ("attn_norm", "ffn_norm", "attn_q", "attn_k",
                          "attn_v", "attn_output", "ffn_gate", "ffn_up",
                          "ffn_down", "attn_q_norm", "attn_k_norm")
              if f"blk.{i}.{sfx}.weight" in g.tensors]
    cache = g.read_tensors(wanted)

    def t(name: str, transpose: bool) -> np.ndarray:
        arr = cache.get(name)
        if arr is None:
            arr = g.read_tensor(name)
        return arr.T if transpose else arr

    def stack(suffix: str, transpose: bool) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([t(f"blk.{i}.{suffix}", transpose) for i in range(l)]),
            dtype)

    def stack_fused(suffixes) -> jnp.ndarray:
        # fuse along the output-feature axis (see models.transformer)
        return jnp.asarray(np.stack([
            np.concatenate([t(f"blk.{i}.{sfx}.weight", True)
                            for sfx in suffixes], axis=-1)
            for i in range(l)]), dtype)

    layers = {
        "ln1": stack("attn_norm.weight", False),
        "ln2": stack("ffn_norm.weight", False),
        "wqkv": stack_fused(("attn_q", "attn_k", "attn_v")),
        "wo": stack("attn_output.weight", True),
        "w_gate_up": stack_fused(("ffn_gate", "ffn_up")),
        "w_down": stack("ffn_down.weight", True),
    }
    if f"blk.0.attn_q_norm.weight" in g.tensors:
        layers["q_norm"] = stack("attn_q_norm.weight", False)
        layers["k_norm"] = stack("attn_k_norm.weight", False)
    else:
        layers["q_norm"] = jnp.ones((l, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((l, cfg.head_dim), dtype)
    return layers


def _output_weight(g: GGUFFile) -> np.ndarray:
    name = "output.weight" if "output.weight" in g.tensors else "token_embd.weight"
    return g.read_tensor(name)


def load_talker_gguf(path, base: TalkerConfig,
                     ) -> Tuple[TalkerConfig, Dict[str, Any]]:
    g = read_gguf(path)
    cfg = config_from_gguf(g, base)
    dtype = jnp.dtype(cfg.dtype)
    params = {
        "layers": _stack_layers(g, cfg, dtype),
        "final_norm": jnp.asarray(g.read_tensor("output_norm.weight"), dtype),
        # Only the codec slice [0, n_codec_logits) of the LM head is sampled
        # (engine.rs:555); slicing here shrinks the head matmul ~70x.
        "codec_head": jnp.asarray(
            _output_weight(g)[: cfg.n_codec_logits], dtype),
    }
    return cfg, params


def load_predictor_gguf(path, base: PredictorConfig,
                        ) -> Tuple[PredictorConfig, Dict[str, Any]]:
    g = read_gguf(path)
    cfg = config_from_gguf(g, base)
    dtype = jnp.dtype(cfg.dtype)
    params = {
        "layers": _stack_layers(g, cfg, dtype),
        "final_norm": jnp.asarray(g.read_tensor("output_norm.weight"), dtype),
        "lm_head": jnp.asarray(_output_weight(g), dtype),
    }
    return cfg, params
