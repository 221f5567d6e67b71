"""Minimal ONNX reader: extract initializer tensors without the onnx package.

ONNX models are protobuf; this module walks the wire format directly and
returns `{tensor_name: np.ndarray}` for every initializer in the graph —
enough to import the reference's codec encoder/decoder/speaker-encoder
weights (the ONNX sessions at /root/reference/src/models/onnx.rs) into this
framework's parameter pytrees via an explicit name map.

Wire-format facts used (ONNX schema, stable since v1):
  ModelProto.graph            = field 7  (GraphProto)
  GraphProto.initializer      = field 5  (repeated TensorProto)
  GraphProto.node             = field 1  (ignored)
  TensorProto.dims            = field 1  (repeated int64, may be packed)
  TensorProto.data_type       = field 2  (varint; 1=f32 6=i32 7=i64 10=f16 11=f64)
  TensorProto.float_data      = field 4  (packed floats, alt encoding)
  TensorProto.int64_data      = field 7
  TensorProto.name            = field 8  (string)
  TensorProto.raw_data        = field 9  (bytes, little-endian)
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _fields(buf: memoryview) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:                       # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:                     # 64-bit
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wire == 2:                     # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:                     # 32-bit
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, val


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = np.float32
    name = ""
    raw = None
    float_data: List[bytes] = []
    int64_data: List[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:                      # dims
            if wire == 0:
                dims.append(int(val))
            else:                           # packed
                pos = 0
                mv = val
                while pos < len(mv):
                    v, pos = _read_varint(mv, pos)
                    dims.append(v)
        elif field == 2 and wire == 0:
            dtype = _DTYPES.get(int(val), np.float32)
        elif field == 4:                    # float_data (packed or single)
            float_data.append(bytes(val) if wire == 2 else val)
        elif field == 7:                    # int64_data
            if wire == 0:
                int64_data.append(int(val))
            else:
                pos = 0
                mv = val
                while pos < len(mv):
                    v, pos = _read_varint(mv, pos)
                    int64_data.append(v)
        elif field == 8 and wire == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 9 and wire == 2:
            raw = bytes(val)
    shape = tuple(dims)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.frombuffer(b"".join(
            fd if isinstance(fd, bytes) else bytes(fd)
            for fd in float_data), dtype=np.float32)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64)
    else:
        arr = np.zeros(0, dtype)
    try:
        arr = arr.reshape(shape)
    except ValueError:
        pass
    return name, arr


def read_onnx_initializers(path) -> Dict[str, np.ndarray]:
    """Return {name: array} for every initializer in the model's graph."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(data):      # ModelProto
        if field == 7 and wire == 2:            # graph
            for gfield, gwire, gval in _fields(val):   # GraphProto
                if gfield == 5 and gwire == 2:  # initializer
                    name, arr = _parse_tensor(gval)
                    out[name] = arr
    return out
