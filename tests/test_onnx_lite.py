"""onnx_lite: parse initializers from a hand-encoded ONNX protobuf."""

import struct

import numpy as np

from qwen3_tts_tpu.io.onnx_lite import read_onnx_initializers


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray) -> bytes:
    body = b""
    for d in arr.shape:
        body += _tag(1, 0) + _varint(d)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.float16): 10}[arr.dtype]
    body += _tag(2, 0) + _varint(dt)
    body += _len_delim(8, name.encode())
    body += _len_delim(9, arr.tobytes())
    return body


def test_read_initializers(tmp_path):
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((3, 4)).astype(np.float32)
    w2 = np.arange(6, dtype=np.int64).reshape(2, 3)
    w3 = rng.standard_normal((5,)).astype(np.float16)

    graph = (_len_delim(5, _tensor("conv.weight", w1))
             + _len_delim(5, _tensor("codes", w2))
             + _len_delim(5, _tensor("half.bias", w3)))
    model = _len_delim(7, graph)

    path = tmp_path / "m.onnx"
    path.write_bytes(model)

    tensors = read_onnx_initializers(path)
    assert set(tensors) == {"conv.weight", "codes", "half.bias"}
    np.testing.assert_array_equal(tensors["conv.weight"], w1)
    np.testing.assert_array_equal(tensors["codes"], w2)
    np.testing.assert_array_equal(tensors["half.bias"], w3)


def test_onnx_to_npz(tmp_path, capsys):
    from qwen3_tts_tpu.io.convert import onnx_to_npz
    w = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    model = _len_delim(7, _len_delim(5, _tensor("dec.weight", w)))
    src = tmp_path / "m.onnx"
    src.write_bytes(model)
    out = tmp_path / "m.npz"
    tensors = onnx_to_npz(src, out)
    assert "dec.weight" in tensors
    loaded = np.load(out)
    np.testing.assert_array_equal(loaded["dec.weight"], w)
