"""GGUF container + dequantization tests (round-trip and golden blocks)."""

import numpy as np
import pytest

from qwen3_tts_tpu.io import gguf


def test_write_read_roundtrip(tmp_path):
    path = tmp_path / "t.gguf"
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "b.bias": rng.standard_normal((16,)).astype(np.float32),
        "c.half": rng.standard_normal((2, 32)).astype(np.float16),
    }
    gguf.write_gguf(path, tensors, {"general.architecture": "qwen3",
                                    "qwen3.block_count": 2,
                                    "pi": 3.5, "flag": True})
    g = gguf.read_gguf(path)
    assert g.metadata["general.architecture"] == "qwen3"
    assert g.metadata["qwen3.block_count"] == 2
    assert g.metadata["pi"] == pytest.approx(3.5)
    assert g.metadata["flag"] is True
    for name, arr in tensors.items():
        got = g.read_tensor(name)
        assert got.shape == arr.shape
        np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-3)


def test_q8_0_dequant():
    # Build one Q8_0 block by hand: d=0.5, q = -16..15
    d = np.float16(0.5)
    q = np.arange(-16, 16, dtype=np.int8)
    raw = np.frombuffer(d.tobytes() + q.tobytes(), dtype=np.uint8)
    out = gguf.dequantize(raw, gguf.GGML_Q8_0, 32)
    np.testing.assert_allclose(out, 0.5 * q.astype(np.float32), rtol=1e-3)


def test_q4_0_dequant():
    d = np.float16(0.25)
    nibbles = np.arange(16, dtype=np.uint8)
    packed = (nibbles | (nibbles[::-1] << 4)).astype(np.uint8)
    raw = np.frombuffer(d.tobytes() + packed.tobytes(), dtype=np.uint8)
    out = gguf.dequantize(raw, gguf.GGML_Q4_0, 32)
    expect = np.concatenate([nibbles.astype(np.float32) - 8,
                             nibbles[::-1].astype(np.float32) - 8]) * 0.25
    np.testing.assert_allclose(out, expect, rtol=1e-3)


def test_q6_k_roundtripish():
    """Quantize a ramp with the known Q6_K layout and verify dequant."""
    rng = np.random.default_rng(1)
    # Construct a block whose dequant we can compute independently.
    ql = rng.integers(0, 256, 128, dtype=np.uint8)
    qh = rng.integers(0, 256, 64, dtype=np.uint8)
    scales = rng.integers(-8, 8, 16, dtype=np.int8)
    d = np.float16(0.1)
    raw = np.frombuffer(ql.tobytes() + qh.tobytes() + scales.tobytes()
                        + d.tobytes(), dtype=np.uint8)
    out = gguf.dequantize(raw, gguf.GGML_Q6_K, 256)
    # Independent scalar recomputation
    y = np.zeros(256, np.float32)
    df = np.float32(d)
    for half in range(2):
        qlh = ql[64 * half:64 * (half + 1)]
        qhh = qh[32 * half:32 * (half + 1)]
        sch = scales[8 * half:8 * (half + 1)]
        for l in range(32):
            is_ = l // 16
            q1 = np.int8((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)).astype(np.int32) - 32
            q2 = np.int8((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)).astype(np.int32) - 32
            q3 = np.int8((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)).astype(np.int32) - 32
            q4 = np.int8((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)).astype(np.int32) - 32
            base = 128 * half
            y[base + l] = df * sch[is_ + 0] * q1
            y[base + l + 32] = df * sch[is_ + 2] * q2
            y[base + l + 64] = df * sch[is_ + 4] * q3
            y[base + l + 96] = df * sch[is_ + 6] * q4
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-4)


def test_q4_k_scalar_parity():
    rng = np.random.default_rng(2)
    d, dmin = np.float16(0.2), np.float16(0.05)
    scales = rng.integers(0, 256, 12, dtype=np.uint8)
    qs = rng.integers(0, 256, 128, dtype=np.uint8)
    raw = np.frombuffer(d.tobytes() + dmin.tobytes() + scales.tobytes()
                        + qs.tobytes(), dtype=np.uint8)
    out = gguf.dequantize(raw, gguf.GGML_Q4_K, 256)

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        sc = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        return sc, mn

    y = np.zeros(256, np.float32)
    df, dm = np.float32(d), np.float32(dmin)
    yi = 0
    isc = 0
    qoff = 0
    for j in range(0, 256, 64):
        sc1, m1 = get_scale_min(isc)
        sc2, m2 = get_scale_min(isc + 1)
        for l in range(32):
            y[yi + l] = df * sc1 * (qs[qoff + l] & 0xF) - dm * m1
        for l in range(32):
            y[yi + 32 + l] = df * sc2 * (qs[qoff + l] >> 4) - dm * m2
        yi += 64
        isc += 2
        qoff += 32
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-4)


def test_q5_k_scalar_parity():
    rng = np.random.default_rng(3)
    d, dmin = np.float16(0.3), np.float16(0.02)
    scales = rng.integers(0, 256, 12, dtype=np.uint8)
    qh = rng.integers(0, 256, 32, dtype=np.uint8)
    qs = rng.integers(0, 256, 128, dtype=np.uint8)
    raw = np.frombuffer(d.tobytes() + dmin.tobytes() + scales.tobytes()
                        + qh.tobytes() + qs.tobytes(), dtype=np.uint8)
    out = gguf.dequantize(raw, gguf.GGML_Q5_K, 256)

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        sc = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        return sc, mn

    y = np.zeros(256, np.float32)
    df, dm = np.float32(d), np.float32(dmin)
    yi, isc, qoff = 0, 0, 0
    u1, u2 = 1, 2
    for j in range(0, 256, 64):
        sc1, m1 = get_scale_min(isc)
        sc2, m2 = get_scale_min(isc + 1)
        for l in range(32):
            hb = 16 if (qh[l] & u1) else 0
            y[yi + l] = df * sc1 * ((qs[qoff + l] & 0xF) + hb) - dm * m1
        for l in range(32):
            hb = 16 if (qh[l] & u2) else 0
            y[yi + 32 + l] = df * sc2 * ((qs[qoff + l] >> 4) + hb) - dm * m2
        yi += 64
        isc += 2
        qoff += 32
        u1 <<= 2
        u2 <<= 2
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-4)


def test_bf16():
    vals = np.array([1.0, -2.5, 3.25, 0.0], np.float32)
    bf = (vals.view(np.uint32) >> 16).astype(np.uint16)
    out = gguf.dequantize(bf.view(np.uint8), gguf.GGML_BF16, 4)
    np.testing.assert_allclose(out, vals, rtol=1e-2)
