"""Device mesh + sharding layer.

The reference has no distributed story at all (SURVEY.md §2.4: its only
concurrency is a decoder thread and llama.cpp's intra-op pool).  Here
parallelism is first-class and expressed entirely through `jax.sharding`:

  * axis "data"  — concurrent TTS streams (the batch dim of every activation
    and of the KV cache).  This is the scaling axis for serving: v5e-8 runs
    8x the streams at the same per-stream latency, with zero collectives.
  * axis "model" — tensor parallelism for larger talker variants.  Every
    projection shards its CONTRACTION dim over "model" (row-parallel /
    1D weight-stationary, 4 psums per layer inserted by XLA) — see
    decoder_param_specs for why the Megatron column/row split was
    abandoned (fused-tensor slices forced reshards inside the layer
    scan).  parallel/tp.py carries the same layout as an explicit
    shard_map schedule.

Sharding is data-driven: params/caches are placed with NamedSharding and the
jitted programs follow their operands, so the same model code runs 1-chip or
N-chip unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = 1, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def decoder_param_specs() -> Dict[str, Any]:
    """PartitionSpecs for the stacked decoder layer tree (talker/predictor).

    All four projection weights shard their CONTRACTION dim over "model"
    (row-parallel / 1D weight-stationary): each shard computes a partial
    matmul over its slice of the input features and XLA inserts one psum
    per projection.  Weight memory and matmul FLOPs scale 1/n_model, the
    KV cache stays head-sharded (kv_cache_spec), and — decisive — every
    sharded op is reshard-free.  The earlier Megatron column split of
    the FUSED wqkv / w_gate_up tensors sliced across the q|k|v and
    gate|up concatenation boundaries, so the in-layer slices forced XLA
    to insert cross-shard collective-permutes inside the layer scan;
    jax 0.8's CPU collective runtime deadlocks on that pattern (8-way
    rendezvous inside a while thunk), and on real meshes it is extra
    ICI traffic per layer either way.  Head-aligned column parallelism
    would need unfused per-head weights — a layout change the decode
    megakernels also key on; revisit if TP beyond 2-4 chips makes the
    extra psums (4/layer vs Megatron's 2) matter."""
    return {
        "ln1": P(), "ln2": P(),
        "wqkv": P(None, MODEL_AXIS, None),
        "wo": P(None, MODEL_AXIS, None),
        "q_norm": P(), "k_norm": P(),
        "w_gate_up": P(None, MODEL_AXIS, None),
        "w_down": P(None, MODEL_AXIS, None),
    }


def talker_param_specs() -> Dict[str, Any]:
    return {"layers": decoder_param_specs(), "final_norm": P(),
            "codec_head": P()}


def predictor_param_specs() -> Dict[str, Any]:
    return {"layers": decoder_param_specs(), "final_norm": P(),
            "lm_head": P()}


def assets_pack_specs() -> Dict[str, Any]:
    return {"codec_tables": P(), "codec_tables_1024": P(),
            "proj_w": P(), "proj_b": P(), "tts_pad": P()}


def kv_cache_spec():
    """[L, B, Hkv, C, Dh]: batch over data, kv heads over model."""
    return P(None, DATA_AXIS, MODEL_AXIS, None, None)


def place(tree, mesh: Mesh, specs) -> Any:
    """Device-put a pytree with matching PartitionSpec tree (specs may be a
    single spec applied to all leaves)."""
    if isinstance(specs, P):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, specs)), tree)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def place_params(params, mesh: Mesh, specs: Dict[str, Any]):
    """Place a parameter dict given a nested spec dict (missing keys get
    replicated).  Quantized weights ({"q": int8 [..., in, out], "s": f32
    [..., out]}, see ops.quant) inherit the weight's spec; the scale drops
    the contraction axis of the spec."""
    from ..ops.quant import is_quantized

    def scale_spec(spec: P) -> P:
        if len(spec) < 2:
            return P()
        return P(*(list(spec[:-2]) + [spec[-1]]))

    def walk(p, s):
        if is_quantized(p):
            spec = s if isinstance(s, P) else P()
            if "q4" in p:
                # int4: packed weights and grouped scales share the weight's
                # rank ([..., in/2, out] and [..., in/group, out]); scale
                # axes too small to split (e.g. one group) replicate instead
                def fit(arr, sp):
                    names = list(sp) + [None] * (arr.ndim - len(sp))
                    kept = [n if n is None or
                            arr.shape[i] % mesh.shape[n] == 0 else None
                            for i, n in enumerate(names)]
                    return P(*kept)
                return {
                    "q4": jax.device_put(
                        p["q4"], NamedSharding(mesh, fit(p["q4"], spec))),
                    "s": jax.device_put(
                        p["s"], NamedSharding(mesh, fit(p["s"], spec))),
                }
            return {
                "q": jax.device_put(p["q"], NamedSharding(mesh, spec)),
                "s": jax.device_put(p["s"], NamedSharding(mesh, scale_spec(spec))),
            }
        if isinstance(p, dict):
            return {k: walk(v, s.get(k, P()) if isinstance(s, dict) else s)
                    for k, v in p.items()}
        if isinstance(p, (tuple, list)):
            return type(p)(walk(v, s) for v in p)
        spec = s if isinstance(s, P) else P()
        return jax.device_put(p, NamedSharding(mesh, spec))
    return walk(params, specs)


def batch_sharding(mesh: Mesh):
    """Sharding for [B, ...] activations: batch over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
