"""Cross-implementation logit parity vs llama.cpp (real-checkpoint drill).

The reference drives the talker/predictor GGUFs through llama.cpp, which
exposes both logits and the final hidden state per decode
(/root/reference/src/models/llama/mod.rs:459-466).  A GGUF import bug on our
side (weight transpose, qk-norm placement, rope theta, M-RoPE sections)
would otherwise surface only as bad audio; this harness turns it into a
numeric diff:

  1. `make_inputs(path)` (here, offline) — seeded random embedding prompt +
     per-step feedback embeddings, saved as npz.
  2. `scripts/dump_llama_logits.py` (any machine with the llama.cpp runtime
     libs) — feeds the same npz through libllama via ctypes exactly as the
     reference does (M-RoPE planar positions, embeddings=1) and records
     prefill/step logits + hidden states.
  3. `compare_talker(gguf, inputs, dump)` (here) — runs our talker on the
     same inputs and reports max/mean deviations; `tests/test_llama_parity.py`
     gates on the files existing.

Our talker materializes only the codec head slice [0, 2160) of the LM head
(engine.rs:555 samples nothing beyond it), so logits compare on that slice;
hidden states compare on all 2048 dims (llama.cpp `embeddings` output is
the post-final-norm hidden, same as models/talker.talker_prefill)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

PROMPT_ROWS = 48      # long enough to exercise every mrope section
N_STEPS = 8           # autoregressive steps after prefill
EMBED_SCALE = 0.7     # random-normal scale; keeps llama.cpp activations sane


def make_inputs(path, d_model: int = 2048, seed: int = 0,
                rows: int = PROMPT_ROWS, steps: int = N_STEPS) -> Dict:
    """Deterministic parity inputs, shared by both sides."""
    rng = np.random.default_rng(seed)
    data = {
        "embeds": (rng.standard_normal((rows, d_model)) * EMBED_SCALE
                   ).astype(np.float32),
        "step_embeds": (rng.standard_normal((steps, d_model)) * EMBED_SCALE
                        ).astype(np.float32),
        "seed": np.int64(seed),
    }
    if path is not None:
        np.savez(path, **data)
    return data


def run_our_talker(cfg, params, inputs: Dict) -> Dict[str, np.ndarray]:
    """Our side of the diff: prefill + N decode steps on the parity inputs.

    Returns the same npz schema the llama.cpp dumper writes, so the two
    sides compare symmetrically (and the harness itself is testable offline
    by diffing our model against itself)."""
    import jax
    import jax.numpy as jnp

    from ..models import talker as talker_lib
    embeds = jnp.asarray(inputs["embeds"])[None]          # [1, S, D]
    steps = np.asarray(inputs["step_embeds"])
    s = embeds.shape[1]
    cache = talker_lib.init_talker_cache(cfg, 1, s + len(steps) + 8)
    lengths = jnp.asarray([s], jnp.int32)
    logits, hidden, cache = jax.jit(
        talker_lib.talker_prefill, static_argnums=0)(
        cfg, params, embeds, lengths, cache)
    out = {
        "prefill_logits": np.asarray(logits[0], np.float32),
        "prefill_hidden": np.asarray(hidden[0], np.float32),
    }
    step_fn = jax.jit(talker_lib.talker_decode_step,
                      static_argnums=(0, 5))
    sl, sh = [], []
    for i in range(len(steps)):
        pos = jnp.asarray([s + i], jnp.int32)
        logits, hidden, cache = step_fn(
            cfg, params, jnp.asarray(steps[i])[None], pos, cache, s)
        sl.append(np.asarray(logits[0], np.float32))
        sh.append(np.asarray(hidden[0], np.float32))
    out["step_logits"] = np.stack(sl)
    out["step_hidden"] = np.stack(sh)
    return out


def compare_dumps(ours: Dict, theirs: Dict, logit_slice: int = 2160,
                  ) -> Dict[str, float]:
    """Numeric diff between our outputs and a llama.cpp dump.

    Logits compare on the codec slice [0, logit_slice) (our head only
    materializes those rows); top-1 agreement within the slice is reported
    separately because that is what sampling actually consumes."""
    stats: Dict[str, float] = {}

    def diff(tag, a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        n = min(a.shape[-1], b.shape[-1], logit_slice if "logits" in tag
                else a.shape[-1])
        a, b = a[..., :n], b[..., :n]
        err = np.abs(a - b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        stats[f"{tag}_max_abs"] = float(err.max())
        stats[f"{tag}_rel"] = float(err.max() / denom)
        if "logits" in tag:
            am_a = np.argmax(a, axis=-1)
            am_b = np.argmax(b, axis=-1)
            stats[f"{tag}_top1_match"] = float(np.mean(am_a == am_b))

    diff("prefill_logits", ours["prefill_logits"], theirs["prefill_logits"])
    diff("prefill_hidden", ours["prefill_hidden"], theirs["prefill_hidden"])
    if "step_logits" in ours and "step_logits" in theirs:
        k = min(len(ours["step_logits"]), len(theirs["step_logits"]))
        diff("step_logits", ours["step_logits"][:k],
             theirs["step_logits"][:k])
        diff("step_hidden", ours["step_hidden"][:k],
             theirs["step_hidden"][:k])
    return stats


def compare_talker(gguf_path, inputs_path, dump_path,
                   rel_tol: float = 5e-2) -> Dict[str, float]:
    """End-to-end: load the talker GGUF with our loader, run the parity
    inputs, diff against the llama.cpp dump.  Raises AssertionError with the
    full stats when outside tolerance (bf16-vs-ggml rounding budgets ~1e-2
    relative; a transposed weight shows up as O(1))."""
    from ..core.config import TalkerConfig
    from . import weights as weights_io
    cfg, params = weights_io.load_talker_gguf(gguf_path, TalkerConfig())
    inputs = dict(np.load(inputs_path))
    theirs = dict(np.load(dump_path))
    ours = run_our_talker(cfg, params, inputs)
    stats = compare_dumps(ours, theirs)
    worst = max(v for k, v in stats.items() if k.endswith("_rel"))
    top1 = min((v for k, v in stats.items() if k.endswith("top1_match")),
               default=1.0)
    if worst > rel_tol or top1 < 0.99:
        raise AssertionError(
            f"talker logit parity vs llama.cpp FAILED (rel {worst:.3g} > "
            f"{rel_tol}, top1 {top1:.3f}): {stats}")
    return stats
