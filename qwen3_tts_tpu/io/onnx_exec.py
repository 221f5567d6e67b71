"""ONNX graph execution on TPU via JAX/XLA.

The reference runs its codec encoder/decoder and speaker encoder as ONNX
Runtime CPU sessions (/root/reference/src/models/onnx.rs:47-62,332).  Here
the same graphs execute as a single XLA program: the graph is parsed once
(io.onnx_lite), partially evaluated so all shape arithmetic folds to host
constants, and the tensor ops trace into one jit-compiled function.  This
gives exact op-for-op fidelity with the published .onnx checkpoints without
onnxruntime — and the compiled program runs on the TPU's MXU rather than a
CPU thread.

Design rules (XLA semantics — static shapes, no data-dependent control flow):
  * Values are either HOST (np.ndarray, known at trace time) or DEVICE
    (jnp array / tracer).  `Shape` always yields HOST; small integer ops on
    HOST values stay HOST.  Reshape/Slice/Expand targets therefore fold to
    Python ints and every traced op has a static shape.
  * Initializers above a size threshold become function parameters (device-
    resident, donated across calls); small ones are baked in as constants so
    they can participate in shape folding.
  * Unsupported ops raise immediately at trace time with the op name and
    node, so a new checkpoint's gaps surface as one clear list.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .onnx_lite import _DTYPES, OnnxGraph, OnnxNode, read_onnx_graph

# initializers larger than this (elements) become device params
PARAM_THRESHOLD = 64

# HOST ops: evaluated eagerly with numpy when every input is HOST and small.
_HOST_ELEMS_CAP = 4096
_HOST_OPS = {
    "Add", "Sub", "Mul", "Div", "Neg", "Abs", "Min", "Max", "Mod",
    "Concat", "Gather", "Slice", "Unsqueeze", "Squeeze", "Reshape",
    "Cast", "Range", "Equal", "Greater", "Less", "Where", "Shape",
    "Size", "ReduceProd", "ReduceSum", "ReduceMax", "ReduceMin",
    "Floor", "Ceil", "Transpose", "Identity", "ConstantOfShape",
    "Expand", "Flatten", "Not", "And", "Or",
}


def _is_host(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _spatial_dn(rank: int):
    sp = "DHW"[3 - rank:]
    return (f"NC{sp}", f"OI{sp}", f"NC{sp}")


def _ints(x) -> List[int]:
    return [int(v) for v in np.asarray(x).reshape(-1)]


def _axis_list(attrs, inputs, idx, default=None):
    """Axes come as an attr (opset<13) or as an input tensor (opset>=13)."""
    if len(inputs) > idx and inputs[idx] is not None:
        return _ints(inputs[idx])
    axes = attrs.get("axes")
    return list(axes) if axes is not None else default


class UnsupportedOnnxOp(NotImplementedError):
    pass


class OnnxExecutor:
    """Executes an OnnxGraph as a jittable JAX function.

    usage:
        ex = OnnxExecutor.load(path)
        fn = jax.jit(ex.run)                  # or ex.jitted()
        outs = fn(ex.params, {"x": arr})      # dict name -> array
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        self.params: Dict[str, jnp.ndarray] = {}
        self.consts: Dict[str, np.ndarray] = {}
        for name, arr in graph.initializers.items():
            if arr.size > PARAM_THRESHOLD and arr.dtype.kind == "f":
                self.params[name] = jnp.asarray(arr)
            else:
                self.consts[name] = arr
        self.input_names = [vi.name for vi in graph.inputs]
        self.output_names = [vi.name for vi in graph.outputs]

    @classmethod
    def load(cls, path) -> "OnnxExecutor":
        return cls(read_onnx_graph(path))

    def jitted(self, donate: bool = False):
        fn = functools.partial(self.run)
        return jax.jit(fn)

    # ------------------------------------------------------------------ run
    def run(self, params: Dict[str, jnp.ndarray],
            feeds: Dict[str, Any]) -> Dict[str, Any]:
        env: Dict[str, Any] = {}
        env.update(self.consts)
        env.update(params)
        for k, v in feeds.items():
            env[k] = v

        for node in self.graph.nodes:
            ins = [env[n] if n else None for n in node.inputs]
            outs = self._exec(node, ins)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return {n: env[n] for n in self.output_names}

    # ----------------------------------------------------------------- exec
    def _exec(self, node: OnnxNode, ins: List[Any]) -> Sequence[Any]:
        op = node.op_type
        handler = getattr(self, f"_op_{op}", None)
        if handler is None:
            raise UnsupportedOnnxOp(
                f"ONNX op {op!r} (node {node.name!r}, inputs "
                f"{node.inputs}) is not implemented in io.onnx_exec")
        # host-side constant folding for shape math
        if (op in _HOST_OPS
                and all(v is None or _is_host(v) for v in ins)
                and sum(_np(v).size for v in ins if v is not None)
                <= _HOST_ELEMS_CAP):
            outs = handler(node, [None if v is None else _np(v)
                                  for v in ins], host=True)
            return [np.asarray(o) for o in outs]
        # device path: host values pass through as np — jnp ops consume them
        # natively, and handlers that need static ints (Reshape/Slice/...)
        # keep them foldable.  Converting with jnp.asarray here would lift
        # them to tracers inside jit and break shape folding.
        return handler(node, ins, host=False)

    # -------------------------------------------------------------- helpers
    @staticmethod
    def _xp(host):
        return np if host else jnp

    # ------------------------------------------------------------ basic ops
    def _op_Identity(self, node, ins, host):
        return [ins[0]]

    def _op_Constant(self, node, ins, host):
        a = node.attrs
        if "value" in a:
            return [np.asarray(a["value"])]
        for k, cast in (("value_float", np.float32), ("value_int", np.int64)):
            if k in a:
                return [np.asarray(a[k], cast)]
        for k, cast in (("value_floats", np.float32), ("value_ints", np.int64)):
            if k in a:
                return [np.asarray(a[k], cast)]
        raise UnsupportedOnnxOp(f"Constant node {node.name!r} without value")

    def _op_Cast(self, node, ins, host):
        dt = np.dtype(_DTYPES.get(int(node.attrs["to"]), np.float32))
        return [self._xp(host).asarray(ins[0]).astype(dt)]

    def _op_Shape(self, node, ins, host):
        shape = np.asarray(np.shape(ins[0]), np.int64)
        start = node.attrs.get("start", 0)
        end = node.attrs.get("end", len(shape))
        return [shape[start:end]]

    def _op_Size(self, node, ins, host):
        return [np.asarray(int(np.prod(np.shape(ins[0]), dtype=np.int64)),
                           np.int64)]

    # elementwise ------------------------------------------------------------
    def _binop(self, fn, ins, host):
        return [fn(ins[0], ins[1])]

    def _op_Add(self, node, ins, host):
        return self._binop(self._xp(host).add, ins, host)

    def _op_Sub(self, node, ins, host):
        return self._binop(self._xp(host).subtract, ins, host)

    def _op_Mul(self, node, ins, host):
        return self._binop(self._xp(host).multiply, ins, host)

    def _op_Div(self, node, ins, host):
        xp = self._xp(host)
        a, b = ins
        if np.issubdtype(np.asarray(a).dtype if host else a.dtype,
                         np.integer):
            return [xp.floor_divide(a, b)]
        return [xp.divide(a, b)]

    def _op_Pow(self, node, ins, host):
        return self._binop(self._xp(host).power, ins, host)

    def _op_Min(self, node, ins, host):
        xp = self._xp(host)
        out = ins[0]
        for v in ins[1:]:
            out = xp.minimum(out, v)
        return [out]

    def _op_Max(self, node, ins, host):
        xp = self._xp(host)
        out = ins[0]
        for v in ins[1:]:
            out = xp.maximum(out, v)
        return [out]

    def _op_Mod(self, node, ins, host):
        xp = self._xp(host)
        if node.attrs.get("fmod", 0):
            return [xp.fmod(ins[0], ins[1])]
        return [xp.mod(ins[0], ins[1])]

    def _op_Neg(self, node, ins, host):
        return [self._xp(host).negative(ins[0])]

    def _op_Abs(self, node, ins, host):
        return [self._xp(host).abs(ins[0])]

    def _op_Exp(self, node, ins, host):
        return [jnp.exp(ins[0])]

    def _op_Log(self, node, ins, host):
        return [jnp.log(ins[0])]

    def _op_Sqrt(self, node, ins, host):
        return [jnp.sqrt(ins[0])]

    def _op_Reciprocal(self, node, ins, host):
        return [1.0 / ins[0]]

    def _op_Floor(self, node, ins, host):
        return [self._xp(host).floor(ins[0])]

    def _op_Ceil(self, node, ins, host):
        return [self._xp(host).ceil(ins[0])]

    def _op_Round(self, node, ins, host):
        return [jnp.round(ins[0])]

    def _op_Sin(self, node, ins, host):
        return [jnp.sin(ins[0])]

    def _op_Cos(self, node, ins, host):
        return [jnp.cos(ins[0])]

    def _op_Tanh(self, node, ins, host):
        return [jnp.tanh(ins[0])]

    def _op_Erf(self, node, ins, host):
        return [jax.scipy.special.erf(ins[0])]

    def _op_Sigmoid(self, node, ins, host):
        return [jax.nn.sigmoid(ins[0])]

    def _op_Relu(self, node, ins, host):
        return [jax.nn.relu(ins[0])]

    def _op_LeakyRelu(self, node, ins, host):
        return [jax.nn.leaky_relu(ins[0], node.attrs.get("alpha", 0.01))]

    def _op_Elu(self, node, ins, host):
        return [jax.nn.elu(ins[0], node.attrs.get("alpha", 1.0))]

    def _op_Selu(self, node, ins, host):
        return [jax.nn.selu(ins[0])]

    def _op_Softplus(self, node, ins, host):
        return [jax.nn.softplus(ins[0])]

    def _op_HardSigmoid(self, node, ins, host):
        a = node.attrs.get("alpha", 0.2)
        b = node.attrs.get("beta", 0.5)
        return [jnp.clip(a * ins[0] + b, 0.0, 1.0)]

    def _op_HardSwish(self, node, ins, host):
        return [ins[0] * jnp.clip(ins[0] / 6.0 + 0.5, 0.0, 1.0)]

    def _op_Mish(self, node, ins, host):
        return [ins[0] * jnp.tanh(jax.nn.softplus(ins[0]))]

    def _op_Gelu(self, node, ins, host):
        approx = node.attrs.get("approximate", "none") == "tanh"
        return [jax.nn.gelu(ins[0], approximate=approx)]

    def _op_Clip(self, node, ins, host):
        lo = ins[1] if len(ins) > 1 and ins[1] is not None else \
            node.attrs.get("min")
        hi = ins[2] if len(ins) > 2 and ins[2] is not None else \
            node.attrs.get("max")
        out = ins[0]
        if lo is not None:
            out = jnp.maximum(out, lo)
        if hi is not None:
            out = jnp.minimum(out, hi)
        return [out]

    def _op_Not(self, node, ins, host):
        return [self._xp(host).logical_not(ins[0])]

    def _op_And(self, node, ins, host):
        return [self._xp(host).logical_and(ins[0], ins[1])]

    def _op_Or(self, node, ins, host):
        return [self._xp(host).logical_or(ins[0], ins[1])]

    def _op_Equal(self, node, ins, host):
        return [self._xp(host).equal(ins[0], ins[1])]

    def _op_Greater(self, node, ins, host):
        return [self._xp(host).greater(ins[0], ins[1])]

    def _op_GreaterOrEqual(self, node, ins, host):
        return [self._xp(host).greater_equal(ins[0], ins[1])]

    def _op_Less(self, node, ins, host):
        return [self._xp(host).less(ins[0], ins[1])]

    def _op_LessOrEqual(self, node, ins, host):
        return [self._xp(host).less_equal(ins[0], ins[1])]

    def _op_Where(self, node, ins, host):
        return [self._xp(host).where(ins[0], ins[1], ins[2])]

    # reductions -------------------------------------------------------------
    def _reduce(self, fn_name, node, ins, host):
        xp = self._xp(host)
        axes = _axis_list(node.attrs, ins, 1)
        keep = bool(node.attrs.get("keepdims", 1))
        if axes is None and node.attrs.get("noop_with_empty_axes", 0):
            return [ins[0]]
        ax = None if axes is None else tuple(axes)
        return [getattr(xp, fn_name)(ins[0], axis=ax, keepdims=keep)]

    def _op_ReduceSum(self, node, ins, host):
        return self._reduce("sum", node, ins, host)

    def _op_ReduceMean(self, node, ins, host):
        return self._reduce("mean", node, ins, host)

    def _op_ReduceMax(self, node, ins, host):
        return self._reduce("max", node, ins, host)

    def _op_ReduceMin(self, node, ins, host):
        return self._reduce("min", node, ins, host)

    def _op_ReduceProd(self, node, ins, host):
        return self._reduce("prod", node, ins, host)

    def _op_ReduceL2(self, node, ins, host):
        axes = _axis_list(node.attrs, ins, 1)
        keep = bool(node.attrs.get("keepdims", 1))
        ax = None if axes is None else tuple(axes)
        return [jnp.sqrt(jnp.sum(jnp.square(ins[0]), axis=ax, keepdims=keep))]

    def _op_ArgMax(self, node, ins, host):
        ax = node.attrs.get("axis", 0)
        keep = bool(node.attrs.get("keepdims", 1))
        out = jnp.argmax(ins[0], axis=ax).astype(jnp.int64)
        if keep:
            out = jnp.expand_dims(out, ax)
        return [out]

    def _op_ArgMin(self, node, ins, host):
        ax = node.attrs.get("axis", 0)
        keep = bool(node.attrs.get("keepdims", 1))
        out = jnp.argmin(ins[0], axis=ax).astype(jnp.int64)
        if keep:
            out = jnp.expand_dims(out, ax)
        return [out]

    def _op_CumSum(self, node, ins, host):
        ax = int(_np(ins[1]).item())
        if node.attrs.get("exclusive", 0) or node.attrs.get("reverse", 0):
            raise UnsupportedOnnxOp("CumSum exclusive/reverse")
        return [jnp.cumsum(ins[0], axis=ax)]

    def _op_TopK(self, node, ins, host):
        k = int(_np(ins[1]).item())
        ax = node.attrs.get("axis", -1)
        if ax not in (-1, np.ndim(ins[0]) - 1):
            raise UnsupportedOnnxOp("TopK on non-last axis")
        if not node.attrs.get("largest", 1):
            vals, idx = lax.top_k(-ins[0], k)
            return [-vals, idx.astype(jnp.int64)]
        vals, idx = lax.top_k(ins[0], k)
        return [vals, idx.astype(jnp.int64)]

    # movement ---------------------------------------------------------------
    def _op_Reshape(self, node, ins, host):
        xp = self._xp(host)
        target = _ints(ins[1])
        in_shape = list(np.shape(ins[0]))
        out = []
        for i, d in enumerate(target):
            if d == 0 and not node.attrs.get("allowzero", 0):
                out.append(in_shape[i])
            else:
                out.append(d)
        return [xp.reshape(ins[0], out)]

    def _op_Transpose(self, node, ins, host):
        perm = node.attrs.get("perm")
        return [self._xp(host).transpose(ins[0], perm)]

    def _op_Concat(self, node, ins, host):
        ax = node.attrs["axis"]
        return [self._xp(host).concatenate([v for v in ins if v is not None],
                                           axis=ax)]

    def _op_Split(self, node, ins, host):
        ax = node.attrs.get("axis", 0)
        x = ins[0]
        n_out = len(node.outputs)
        sizes = None
        if len(ins) > 1 and ins[1] is not None:
            sizes = _ints(ins[1])
        elif "split" in node.attrs:
            sizes = list(node.attrs["split"])
        if sizes is None:
            total = np.shape(x)[ax]
            base = -(-total // n_out)
            sizes = [min(base, total - i * base) for i in range(n_out)]
        offs = np.cumsum([0] + sizes)
        xp = self._xp(host)
        taker = xp.take if host else jnp.take
        out = []
        for i in range(len(sizes)):
            idx = [slice(None)] * np.ndim(x)
            idx[ax] = slice(int(offs[i]), int(offs[i + 1]))
            out.append(x[tuple(idx)])
        return out

    def _op_Slice(self, node, ins, host):
        x = ins[0]
        rank = np.ndim(x)
        if len(ins) > 1 and ins[1] is not None:          # opset >= 10
            starts = _ints(ins[1])
            ends = _ints(ins[2])
            axes = _ints(ins[3]) if len(ins) > 3 and ins[3] is not None \
                else list(range(len(starts)))
            steps = _ints(ins[4]) if len(ins) > 4 and ins[4] is not None \
                else [1] * len(starts)
        else:                                            # opset 1 attrs
            starts = list(node.attrs["starts"])
            ends = list(node.attrs["ends"])
            axes = list(node.attrs.get("axes", range(len(starts))))
            steps = [1] * len(starts)
        idx: List[Any] = [slice(None)] * rank
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            ax = ax % rank
            dim = np.shape(x)[ax]
            big = 1 << 62
            en_c: Optional[int] = en
            st_c: Optional[int] = st
            if en >= big:
                en_c = None
            elif en <= -big:
                en_c = None if sp < 0 else 0
            if sp < 0 and en_c == 0:
                en_c = None  # slice to the very beginning
            idx[ax] = slice(st_c, en_c, sp)
        return [x[tuple(idx)]]

    def _op_Gather(self, node, ins, host):
        ax = node.attrs.get("axis", 0)
        if host:
            return [np.take(ins[0], _np(ins[1]).astype(np.int64), axis=ax)]
        # OOB is undefined in ONNX; clamp (XLA-native) instead of NaN-fill
        return [jnp.take(ins[0], ins[1], axis=ax, mode="clip")]

    def _op_GatherElements(self, node, ins, host):
        ax = node.attrs.get("axis", 0)
        return [jnp.take_along_axis(ins[0], ins[1].astype(jnp.int32),
                                    axis=ax, mode="clip")]

    def _op_Unsqueeze(self, node, ins, host):
        axes = _axis_list(node.attrs, ins, 1)
        xp = self._xp(host)
        out = ins[0]
        for ax in sorted(a % (np.ndim(out) + 1) if a < 0 else a
                         for a in axes):
            out = xp.expand_dims(out, ax)
        return [out]

    def _op_Squeeze(self, node, ins, host):
        axes = _axis_list(node.attrs, ins, 1)
        xp = self._xp(host)
        if axes is None:
            return [xp.squeeze(ins[0])]
        return [xp.squeeze(ins[0], axis=tuple(axes))]

    def _op_Flatten(self, node, ins, host):
        ax = node.attrs.get("axis", 1)
        shape = np.shape(ins[0])
        lead = int(np.prod(shape[:ax], dtype=np.int64)) if ax else 1
        return [self._xp(host).reshape(ins[0], (lead, -1))]

    def _op_Expand(self, node, ins, host):
        target = _ints(ins[1])
        shape = list(np.shape(ins[0]))
        # onnx Expand = numpy broadcast with ones-padding on the left
        full = list(target)
        pad = len(full) - len(shape)
        shape = [1] * pad + shape
        out_shape = [max(a, b) for a, b in zip(shape, full)]
        xp = self._xp(host)
        return [xp.broadcast_to(xp.reshape(ins[0], shape), out_shape)]

    def _op_Tile(self, node, ins, host):
        return [jnp.tile(ins[0], _ints(ins[1]))]

    def _op_Pad(self, node, ins, host):
        mode = node.attrs.get("mode", "constant")
        if len(ins) > 1 and ins[1] is not None:
            pads = _ints(ins[1])
        else:
            pads = list(node.attrs["pads"])
        cval = 0.0
        if len(ins) > 2 and ins[2] is not None:
            cval = float(_np(ins[2]).item()) if _is_host(ins[2]) else ins[2]
        elif "value" in node.attrs:
            cval = node.attrs["value"]
        rank = np.ndim(ins[0])
        axes = _ints(ins[3]) if len(ins) > 3 and ins[3] is not None \
            else list(range(rank))
        width = [(0, 0)] * rank
        half = len(pads) // 2
        for i, ax in enumerate(axes):
            width[ax % rank] = (pads[i], pads[half + i])
        jmode = {"constant": "constant", "reflect": "reflect",
                 "edge": "edge", "wrap": "wrap"}[mode]
        if mode == "constant":
            return [jnp.pad(ins[0], width, constant_values=cval)]
        return [jnp.pad(ins[0], width, mode=jmode)]

    def _op_ConstantOfShape(self, node, ins, host):
        shape = _ints(ins[0])
        v = node.attrs.get("value")
        if v is None:
            return [np.zeros(shape, np.float32)]
        v = np.asarray(v)
        return [np.full(shape, v.reshape(-1)[0], v.dtype)]

    def _op_Range(self, node, ins, host):
        xp = self._xp(host)
        s, l, d = (_np(v).item() for v in ins)
        return [xp.arange(s, l, d)]

    def _op_Trilu(self, node, ins, host):
        k = int(_np(ins[1]).item()) if len(ins) > 1 and ins[1] is not None \
            else 0
        if node.attrs.get("upper", 1):
            return [jnp.triu(ins[0], k)]
        return [jnp.tril(ins[0], k)]

    def _op_EyeLike(self, node, ins, host):
        n, m = np.shape(ins[0])
        dt = np.dtype(_DTYPES.get(int(node.attrs.get("dtype", 1)),
                                  np.float32))
        return [jnp.eye(n, m, node.attrs.get("k", 0), dtype=dt)]

    def _op_ScatterND(self, node, ins, host):
        data, indices, updates = ins
        if node.attrs.get("reduction", "none") != "none":
            raise UnsupportedOnnxOp("ScatterND with reduction")
        idx = indices.astype(jnp.int64)
        return [data.at[tuple(jnp.moveaxis(idx, -1, 0))].set(updates)]

    # linear algebra ----------------------------------------------------------
    def _op_MatMul(self, node, ins, host):
        return [jnp.matmul(ins[0], ins[1])]

    def _op_Gemm(self, node, ins, host):
        a, b = ins[0], ins[1]
        if node.attrs.get("transA", 0):
            a = a.T
        if node.attrs.get("transB", 0):
            b = b.T
        out = node.attrs.get("alpha", 1.0) * (a @ b)
        if len(ins) > 2 and ins[2] is not None:
            out = out + node.attrs.get("beta", 1.0) * ins[2]
        return [out]

    def _op_Einsum(self, node, ins, host):
        return [jnp.einsum(node.attrs["equation"], *ins)]

    # normalization -----------------------------------------------------------
    def _op_Softmax(self, node, ins, host):
        ax = node.attrs.get("axis", -1)
        return [jax.nn.softmax(ins[0], axis=ax)]

    def _op_LogSoftmax(self, node, ins, host):
        ax = node.attrs.get("axis", -1)
        return [jax.nn.log_softmax(ins[0], axis=ax)]

    def _op_LayerNormalization(self, node, ins, host):
        x, scale = ins[0], ins[1]
        bias = ins[2] if len(ins) > 2 else None
        ax = node.attrs.get("axis", -1)
        eps = node.attrs.get("epsilon", 1e-5)
        axes = tuple(range(ax % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        out = (x - mean) / jnp.sqrt(var + eps) * scale
        if bias is not None:
            out = out + bias
        return [out]

    def _op_InstanceNormalization(self, node, ins, host):
        x, scale, bias = ins
        eps = node.attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return [(x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape)
                + bias.reshape(shape)]

    def _op_GroupNormalization(self, node, ins, host):
        x, scale, bias = ins
        g = node.attrs["num_groups"]
        eps = node.attrs.get("epsilon", 1e-5)
        n, c = x.shape[0], x.shape[1]
        xg = x.reshape((n, g, c // g) + x.shape[2:])
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return [xn * scale.reshape(shape) + bias.reshape(shape)]

    def _op_BatchNormalization(self, node, ins, host):
        x, scale, bias, mean, var = ins[:5]
        eps = node.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return [(x - mean.reshape(shape))
                / jnp.sqrt(var.reshape(shape) + eps)
                * scale.reshape(shape) + bias.reshape(shape)]

    def _op_LpNormalization(self, node, ins, host):
        ax = node.attrs.get("axis", -1)
        p = node.attrs.get("p", 2)
        if p == 2:
            n = jnp.sqrt(jnp.sum(jnp.square(ins[0]), axis=ax, keepdims=True))
        else:
            n = jnp.sum(jnp.abs(ins[0]), axis=ax, keepdims=True)
        return [ins[0] / jnp.maximum(n, 1e-12)]

    # convolution ---------------------------------------------------------
    def _op_Conv(self, node, ins, host):
        x, w = ins[0], ins[1]
        b = ins[2] if len(ins) > 2 else None
        rank = x.ndim - 2
        strides = list(node.attrs.get("strides", [1] * rank))
        dil = list(node.attrs.get("dilations", [1] * rank))
        group = node.attrs.get("group", 1)
        pads = self._conv_pads(node, x, w, strides, dil, rank)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, _spatial_dn(rank))
        out = lax.conv_general_dilated(
            x, w, window_strides=strides, padding=pads,
            rhs_dilation=dil, dimension_numbers=dn,
            feature_group_count=group)
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * rank)
        return [out]

    @staticmethod
    def _conv_pads(node, x, w, strides, dil, rank):
        auto = node.attrs.get("auto_pad", "NOTSET")
        if auto in ("SAME_UPPER", "SAME_LOWER"):
            pads = []
            for i in range(rank):
                in_d = x.shape[2 + i]
                k = (w.shape[2 + i] - 1) * dil[i] + 1
                out_d = -(-in_d // strides[i])
                total = max((out_d - 1) * strides[i] + k - in_d, 0)
                lo = total // 2 if auto == "SAME_UPPER" else -(-total // 2)
                pads.append((lo, total - lo))
            return pads
        if auto == "VALID":
            return [(0, 0)] * rank
        p = list(node.attrs.get("pads", [0] * (2 * rank)))
        return list(zip(p[:rank], p[rank:]))

    def _op_ConvTranspose(self, node, ins, host):
        x, w = ins[0], ins[1]
        b = ins[2] if len(ins) > 2 else None
        rank = x.ndim - 2
        strides = list(node.attrs.get("strides", [1] * rank))
        dil = list(node.attrs.get("dilations", [1] * rank))
        group = node.attrs.get("group", 1)
        out_pad = list(node.attrs.get("output_padding", [0] * rank))
        if "output_shape" in node.attrs:
            raise UnsupportedOnnxOp("ConvTranspose with output_shape attr")
        p = list(node.attrs.get("pads", [0] * (2 * rank)))
        pads_begin, pads_end = p[:rank], p[rank:]

        # ONNX W: [C, M/group, k...].  Build grouped-conv weights
        # [M, C/group, k...] then flip spatial dims (transposed conv ==
        # dilated-input conv with the flipped kernel).
        c_in = w.shape[0]
        m_per_g = w.shape[1]
        kdims = w.shape[2:]
        wg = w.reshape((group, c_in // group, m_per_g) + kdims)
        wg = jnp.swapaxes(wg, 1, 2)
        w2 = wg.reshape((group * m_per_g, c_in // group) + kdims)
        w2 = jnp.flip(w2, axis=tuple(range(2, 2 + rank)))

        pad_pairs = []
        for i in range(rank):
            k_eff = (kdims[i] - 1) * dil[i] + 1
            pad_pairs.append((k_eff - 1 - pads_begin[i],
                              k_eff - 1 - pads_end[i] + out_pad[i]))
        dn = lax.conv_dimension_numbers(x.shape, w2.shape, _spatial_dn(rank))
        out = lax.conv_general_dilated(
            x, w2, window_strides=[1] * rank, padding=pad_pairs,
            lhs_dilation=strides, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=group)
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * rank)
        return [out]

    # pooling -----------------------------------------------------------------
    def _op_AveragePool(self, node, ins, host):
        x = ins[0]
        rank = x.ndim - 2
        k = list(node.attrs["kernel_shape"])
        strides = list(node.attrs.get("strides", [1] * rank))
        p = list(node.attrs.get("pads", [0] * (2 * rank)))
        if node.attrs.get("count_include_pad", 0) == 0 and any(p):
            raise UnsupportedOnnxOp("AveragePool pad without include_pad")
        pads = [(0, 0), (0, 0)] + list(zip(p[:rank], p[rank:]))
        out = lax.reduce_window(x, 0.0, lax.add,
                                (1, 1) + tuple(k),
                                (1, 1) + tuple(strides), pads)
        return [out / float(np.prod(k))]

    def _op_MaxPool(self, node, ins, host):
        x = ins[0]
        rank = x.ndim - 2
        k = list(node.attrs["kernel_shape"])
        strides = list(node.attrs.get("strides", [1] * rank))
        p = list(node.attrs.get("pads", [0] * (2 * rank)))
        pads = [(0, 0), (0, 0)] + list(zip(p[:rank], p[rank:]))
        out = lax.reduce_window(x, -jnp.inf, lax.max,
                                (1, 1) + tuple(k),
                                (1, 1) + tuple(strides), pads)
        return [out]

    def _op_GlobalAveragePool(self, node, ins, host):
        axes = tuple(range(2, ins[0].ndim))
        return [jnp.mean(ins[0], axis=axes, keepdims=True)]

    # resize ---------------------------------------------------------------
    def _op_Resize(self, node, ins, host):
        x = ins[0]
        mode = node.attrs.get("mode", "nearest")
        ct = node.attrs.get("coordinate_transformation_mode", "half_pixel")
        sizes = None
        if len(ins) > 3 and ins[3] is not None:
            sizes = _ints(ins[3])
        elif len(ins) > 2 and ins[2] is not None and _np(ins[2]).size:
            scales = np.asarray(_np(ins[2]), np.float64)
            sizes = [int(np.floor(s * d)) for s, d in zip(scales, x.shape)]
        if sizes is None:
            raise UnsupportedOnnxOp("Resize without sizes/scales")
        if mode == "nearest" and ct in ("asymmetric", "half_pixel"):
            out = x
            for ax in range(x.ndim):
                if sizes[ax] == x.shape[ax]:
                    continue
                ratio = x.shape[ax] / sizes[ax]
                if ct == "asymmetric":
                    idx = np.floor(np.arange(sizes[ax]) * ratio)
                else:
                    idx = np.floor((np.arange(sizes[ax]) + 0.5) * ratio)
                idx = np.clip(idx, 0, x.shape[ax] - 1).astype(np.int32)
                out = jnp.take(out, jnp.asarray(idx), axis=ax)
            return [out]
        if mode == "linear" and ct == "half_pixel":
            return [jax.image.resize(x, sizes, method="linear")]
        raise UnsupportedOnnxOp(f"Resize mode={mode} ct={ct}")


def summarize(path) -> str:
    """Human-readable summary of an ONNX file: ops, inputs, outputs."""
    g = read_onnx_graph(path)
    lines = [f"graph {g.name!r}  opset {g.opset}  nodes {len(g.nodes)}  "
             f"initializers {len(g.initializers)}"]
    for vi in g.inputs:
        lines.append(f"  in  {vi.name}: {vi.dtype} {vi.shape}")
    for vi in g.outputs:
        lines.append(f"  out {vi.name}: {vi.dtype} {vi.shape}")
    for op, n in g.op_histogram().items():
        lines.append(f"  {op:<28s} x{n}")
    return "\n".join(lines)
