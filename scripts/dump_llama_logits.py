"""Dump talker logits + hidden states from llama.cpp for parity testing.

Run this on any machine that has the reference's runtime libraries
(runtime/libllama.{so,dylib} + libggml*, i.e. the dir the reference's
downloader populates — /root/reference/src/download.rs:103-241):

    python scripts/dump_llama_logits.py \
        --gguf models/gguf/qwen3_tts_talker.gguf \
        --inputs parity_inputs.npz --out llama_dump.npz \
        --runtime runtime/

parity_inputs.npz comes from
`python -c "from qwen3_tts_tpu.io.llama_parity import make_inputs; \
            make_inputs('parity_inputs.npz')"`.
The output feeds qwen3_tts_tpu.io.llama_parity.compare_talker /
tests/test_llama_parity.py.

The ctypes bindings mirror the reference's hand-rolled FFI exactly
(/root/reference/src/models/llama/mod.rs:8-81: 1-byte bools, field order,
n_pos_per_embd=4 planar M-RoPE positions [T..,H..,W..,0..] per
engine.rs:305-314; context params per llama/mod.rs:404-430: n_ubatch=512,
flash_attn_type=1, embeddings=true, offload_kqv=true, no_perf=true).
This script has NO dependency on the rest of this repo — copy it alone next
to the npz files if needed."""

from __future__ import annotations

import argparse
import ctypes as C
import os
import sys

import numpy as np


class llama_model_params(C.Structure):
    _fields_ = [
        ("devices", C.c_void_p),
        ("tensor_buft_overrides", C.c_void_p),
        ("n_gpu_layers", C.c_int),
        ("split_mode", C.c_int),
        ("main_gpu", C.c_int),
        ("tensor_split", C.POINTER(C.c_float)),
        ("progress_callback", C.c_void_p),
        ("progress_callback_user_data", C.c_void_p),
        ("kv_overrides", C.c_void_p),
        ("vocab_only", C.c_bool),
        ("use_mmap", C.c_bool),
        ("use_direct_io", C.c_bool),
        ("use_mlock", C.c_bool),
        ("check_tensors", C.c_bool),
        ("use_extra_bufts", C.c_bool),
        ("no_host", C.c_bool),
        ("no_alloc", C.c_bool),
    ]


class llama_context_params(C.Structure):
    _fields_ = [
        ("n_ctx", C.c_uint),
        ("n_batch", C.c_uint),
        ("n_ubatch", C.c_uint),
        ("n_seq_max", C.c_uint),
        ("n_threads", C.c_int),
        ("n_threads_batch", C.c_int),
        ("rope_scaling_type", C.c_int),
        ("pooling_type", C.c_int),
        ("attention_type", C.c_int),
        ("flash_attn_type", C.c_int),
        ("rope_freq_base", C.c_float),
        ("rope_freq_scale", C.c_float),
        ("yarn_ext_factor", C.c_float),
        ("yarn_attn_factor", C.c_float),
        ("yarn_beta_fast", C.c_float),
        ("yarn_beta_slow", C.c_float),
        ("yarn_orig_ctx", C.c_uint),
        ("defrag_thold", C.c_float),
        ("cb_eval", C.c_void_p),
        ("cb_eval_user_data", C.c_void_p),
        ("type_k", C.c_int),
        ("type_v", C.c_int),
        ("abort_callback", C.c_void_p),
        ("abort_callback_data", C.c_void_p),
        ("embeddings", C.c_bool),
        ("offload_kqv", C.c_bool),
        ("no_perf", C.c_bool),
        ("op_offload", C.c_bool),
        ("swa_full", C.c_bool),
        ("kv_unified", C.c_bool),
        ("samplers", C.c_void_p),
        ("n_samplers", C.c_size_t),
    ]


class llama_batch(C.Structure):
    _fields_ = [
        ("n_tokens", C.c_int),
        ("token", C.POINTER(C.c_int)),
        ("embd", C.POINTER(C.c_float)),
        ("pos", C.POINTER(C.c_int)),
        ("n_seq_id", C.POINTER(C.c_int)),
        ("seq_id", C.POINTER(C.POINTER(C.c_int))),
        ("logits", C.POINTER(C.c_int8)),
    ]


def load_ffi(runtime_dir: str):
    """dlopen ggml then llama with runtime/ on the loader path, as the
    reference does (llama/mod.rs:152-218)."""
    os.environ["GGML_BACKEND_PATH"] = runtime_dir
    os.environ["LD_LIBRARY_PATH"] = (
        runtime_dir + os.pathsep + os.environ.get("LD_LIBRARY_PATH", ""))
    ext = {"darwin": ".dylib", "win32": ".dll"}.get(sys.platform, ".so")
    for name in ("libggml-base", "libggml"):
        p = os.path.join(runtime_dir, name + ext)
        if os.path.exists(p):
            C.CDLL(p, mode=C.RTLD_GLOBAL)
    lib = C.CDLL(os.path.join(runtime_dir, "libllama" + ext),
                 mode=C.RTLD_GLOBAL)

    lib.llama_backend_init.restype = None
    lib.llama_model_default_params.restype = llama_model_params
    lib.llama_model_load_from_file.restype = C.c_void_p
    lib.llama_model_load_from_file.argtypes = [C.c_char_p,
                                               llama_model_params]
    lib.llama_model_n_embd.restype = C.c_int
    lib.llama_model_n_embd.argtypes = [C.c_void_p]
    lib.llama_n_vocab.restype = C.c_int
    lib.llama_n_vocab.argtypes = [C.c_void_p]
    lib.llama_context_default_params.restype = llama_context_params
    lib.llama_init_from_model.restype = C.c_void_p
    lib.llama_init_from_model.argtypes = [C.c_void_p, llama_context_params]
    lib.llama_batch_init.restype = llama_batch
    lib.llama_batch_init.argtypes = [C.c_int, C.c_int, C.c_int]
    lib.llama_decode.restype = C.c_int
    lib.llama_decode.argtypes = [C.c_void_p, llama_batch]
    lib.llama_get_logits.restype = C.POINTER(C.c_float)
    lib.llama_get_logits.argtypes = [C.c_void_p]
    lib.llama_get_embeddings.restype = C.POINTER(C.c_float)
    lib.llama_get_embeddings.argtypes = [C.c_void_p]
    # ggml backends live next to libllama; load them all like
    # ggml_backend_load_all after chdir (llama/mod.rs:296-307)
    if hasattr(lib, "ggml_backend_load_all"):
        cwd = os.getcwd()
        try:
            os.chdir(runtime_dir)
            lib.ggml_backend_load_all()
        finally:
            os.chdir(cwd)
    return lib


def qwen3_position(start: int, n: int) -> np.ndarray:
    """Planar M-RoPE positions [T.., H.., W.., 0..] (engine.rs:305-314)."""
    r = np.arange(start, start + n, dtype=np.int32)
    return np.concatenate([r, r, r, np.zeros(n, np.int32)])


def set_embd(batch: llama_batch, embeds: np.ndarray, pos: np.ndarray,
             n_embd: int) -> None:
    n = embeds.shape[0]
    flat = np.ascontiguousarray(embeds, np.float32).ravel()
    C.memmove(batch.embd, flat.ctypes.data, flat.nbytes)
    p = np.ascontiguousarray(pos, np.int32)
    C.memmove(batch.pos, p.ctypes.data, p.nbytes)
    for i in range(n):
        batch.n_seq_id[i] = 1
        batch.seq_id[i][0] = 0
        batch.logits[i] = 1 if i == n - 1 else 0
    batch.n_tokens = n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--runtime", default="runtime")
    ap.add_argument("--n-gpu-layers", type=int, default=99)
    args = ap.parse_args()

    inputs = dict(np.load(args.inputs))
    embeds = inputs["embeds"].astype(np.float32)
    step_embeds = inputs["step_embeds"].astype(np.float32)
    n_prompt, d = embeds.shape

    lib = load_ffi(args.runtime)
    lib.llama_backend_init()
    mp = lib.llama_model_default_params()
    mp.n_gpu_layers = args.n_gpu_layers
    model = lib.llama_model_load_from_file(args.gguf.encode(), mp)
    assert model, "model load failed"
    n_embd = lib.llama_model_n_embd(model)
    n_vocab = lib.llama_n_vocab(model)
    assert n_embd == d, f"model n_embd {n_embd} != inputs {d}"

    cp = lib.llama_context_default_params()
    cp.n_ctx, cp.n_batch, cp.n_ubatch, cp.n_seq_max = 4096, 2048, 512, 1
    cp.embeddings = True
    cp.flash_attn_type = 1
    cp.offload_kqv = True
    cp.no_perf = True
    cp.n_threads = max(1, min(4, (os.cpu_count() or 4) // 2))
    ctx = lib.llama_init_from_model(model, cp)
    assert ctx, "context creation failed"

    batch = lib.llama_batch_init(4096, n_embd, 1)

    def read(ptr, n):
        return np.ctypeslib.as_array(ptr, shape=(n,)).copy()

    out = {"n_vocab": np.int64(n_vocab), "n_embd": np.int64(n_embd)}
    set_embd(batch, embeds, qwen3_position(0, n_prompt), n_embd)
    rc = lib.llama_decode(ctx, batch)
    assert rc == 0, f"prefill decode rc={rc}"
    out["prefill_logits"] = read(lib.llama_get_logits(ctx), n_vocab)
    out["prefill_hidden"] = read(lib.llama_get_embeddings(ctx), n_embd)

    sl, sh = [], []
    for i in range(step_embeds.shape[0]):
        set_embd(batch, step_embeds[i:i + 1],
                 qwen3_position(n_prompt + i, 1), n_embd)
        rc = lib.llama_decode(ctx, batch)
        assert rc == 0, f"step {i} decode rc={rc}"
        sl.append(read(lib.llama_get_logits(ctx), n_vocab))
        sh.append(read(lib.llama_get_embeddings(ctx), n_embd))
    out["step_logits"] = np.stack(sl)
    out["step_hidden"] = np.stack(sh)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: prefill + {len(sl)} steps, n_vocab={n_vocab}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
