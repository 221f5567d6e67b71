"""Native (C++) library parity vs the numpy dequant paths.  Skipped when
native/libqtts_native.so has not been built."""

import unittest.mock as mock

import numpy as np
import pytest

from qwen3_tts_tpu.io import gguf
from qwen3_tts_tpu.utils import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library not built")

CASES = [(gguf.GGML_Q8_0, 34, 32), (gguf.GGML_Q4_0, 18, 32),
         (gguf.GGML_Q5_0, 22, 32), (gguf.GGML_Q4_K, 144, 256),
         (gguf.GGML_Q5_K, 176, 256), (gguf.GGML_Q6_K, 210, 256)]


@pytest.mark.parametrize("gt,bb,eb", CASES)
def test_native_matches_numpy(gt, bb, eb):
    rng = np.random.default_rng(gt)
    nb = 13
    raw = rng.integers(0, 256, bb * nb, dtype=np.uint8).reshape(nb, bb)
    # finite f16 scales
    raw[:, :2] = np.frombuffer(np.float16(0.5).tobytes(), np.uint8)
    if gt in (gguf.GGML_Q4_K, gguf.GGML_Q5_K):
        raw[:, 2:4] = np.frombuffer(np.float16(0.25).tobytes(), np.uint8)
    if gt == gguf.GGML_Q6_K:
        raw[:, 208:210] = np.frombuffer(np.float16(0.5).tobytes(), np.uint8)
    raw = raw.reshape(-1)

    fast = native.native_dequantize(raw, gt, eb * nb)
    with mock.patch.object(native, "_LIB", None), \
         mock.patch.object(native, "_TRIED", True):
        ref = gguf.dequantize(raw, gt, eb * nb)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_f16_conversion_exhaustive_finite():
    import ctypes
    lib = native.get_lib()
    bits = np.arange(65536, dtype=np.uint16)
    out = np.empty(65536, np.float32)
    lib.qtts_f16_to_f32(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), 65536,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    ref = bits.view(np.float16).astype(np.float32)
    finite = np.isfinite(ref)
    assert np.array_equal(out[finite], ref[finite])


def test_parallel_loader_matches_per_tensor(tmp_path):
    """native qtts_load_tensors == per-tensor reads on a real GGUF file."""
    from qwen3_tts_tpu.io.gguf import read_gguf, write_gguf

    rng = np.random.default_rng(0)
    tensors = {f"t{i}": rng.standard_normal((32, 64)).astype(
        np.float32 if i % 2 else np.float16) for i in range(6)}
    path = tmp_path / "p.gguf"
    write_gguf(path, tensors)
    g = read_gguf(path)

    batch = g.read_tensors(list(tensors))
    for name in tensors:
        np.testing.assert_allclose(batch[name], g.read_tensor(name),
                                   rtol=1e-6)
