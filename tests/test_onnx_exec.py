"""ONNX->JAX executor: numerical parity with torch on hand-built graphs.

The environment has no onnx/onnxruntime, so fixtures are serialized with
io.onnx_lite.write_onnx (real wire-format bytes) and torch (CPU) is the
numerical oracle for conv/norm/attention ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from qwen3_tts_tpu.io.onnx_lite import (OnnxGraph, OnnxNode, TensorInfo,
                                        write_onnx, read_onnx_graph)
from qwen3_tts_tpu.io.onnx_exec import OnnxExecutor, UnsupportedOnnxOp


def make_exec(nodes, inits, inputs, outputs, opset=17):
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=[TensorInfo(n, np.float32, s) for n, s in inputs],
                  outputs=[TensorInfo(n, np.float32, ()) for n in outputs],
                  opset=opset)
    # serialize + reparse: executor consumes genuine wire-format graphs
    return OnnxExecutor(read_onnx_graph(write_onnx(g)))


def run(ex, **feeds):
    return ex.run(ex.params, {k: jnp.asarray(v) for k, v in feeds.items()})


def t2n(t):
    return t.detach().numpy()


@pytest.mark.parametrize("stride,pad,dil,group", [
    (1, 0, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (2, 3, 1, 4), (3, 1, 2, 2)])
def test_conv1d_vs_torch(stride, pad, dil, group):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 31)).astype(np.float32)
    w = rng.standard_normal((12, 8 // group, 5)).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)
    ex = make_exec(
        [OnnxNode("Conv", ["x", "w", "b"], ["y"],
                  attrs={"strides": [stride], "pads": [pad, pad],
                         "dilations": [dil], "group": group,
                         "kernel_shape": [5]})],
        {"w": w, "b": b}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                        stride=stride, padding=pad, dilation=dil,
                        groups=group))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_vs_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 14, 17)).astype(np.float32)
    w = rng.standard_normal((6, 3, 3, 5)).astype(np.float32)
    ex = make_exec(
        [OnnxNode("Conv", ["x", "w"], ["y"],
                  attrs={"strides": [2, 1], "pads": [1, 2, 1, 2],
                         "kernel_shape": [3, 5]})],
        {"w": w}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.conv2d(torch.tensor(x), torch.tensor(w),
                        stride=(2, 1), padding=(1, 2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_same_upper_autopad():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4, 20)).astype(np.float32)
    w = rng.standard_normal((4, 4, 4)).astype(np.float32)
    ex = make_exec(
        [OnnxNode("Conv", ["x", "w"], ["y"],
                  attrs={"auto_pad": "SAME_UPPER", "strides": [2],
                         "kernel_shape": [4]})],
        {"w": w}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    assert got.shape == (1, 4, 10)


@pytest.mark.parametrize("stride,pad,opad,group,dil", [
    (1, 0, 0, 1, 1), (2, 1, 1, 1, 1), (4, 2, 0, 1, 1), (2, 1, 0, 2, 1),
    (2, 2, 1, 1, 2)])
def test_conv_transpose1d_vs_torch(stride, pad, opad, group, dil):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 19)).astype(np.float32)
    w = rng.standard_normal((8, 6 // group if group > 1 else 6, 5)
                            ).astype(np.float32)
    b = rng.standard_normal(w.shape[1] * group).astype(np.float32)
    ex = make_exec(
        [OnnxNode("ConvTranspose", ["x", "w", "b"], ["y"],
                  attrs={"strides": [stride], "pads": [pad, pad],
                         "output_padding": [opad], "group": group,
                         "dilations": [dil], "kernel_shape": [5]})],
        {"w": w, "b": b}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=stride,
        padding=pad, output_padding=opad, groups=group, dilation=dil))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_transpose_kernel_eq_stride_upsampler():
    """The codec decoder's upsampler shape (kernel == stride, no pad)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 12)).astype(np.float32)
    w = rng.standard_normal((16, 8, 4)).astype(np.float32)
    ex = make_exec(
        [OnnxNode("ConvTranspose", ["x", "w"], ["y"],
                  attrs={"strides": [4], "kernel_shape": [4]})],
        {"w": w}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.conv_transpose1d(torch.tensor(x), torch.tensor(w), stride=4))
    assert got.shape == (1, 8, 48)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attention_block_vs_torch():
    """MatMul/Reshape/Transpose/Softmax/LayerNorm wired like one decoder
    attention layer (the codec decoder is 8 of these, onnx.rs:342-458)."""
    rng = np.random.default_rng(4)
    B, T, D, H = 1, 6, 32, 4
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    wq = rng.standard_normal((D, D)).astype(np.float32)
    wk = rng.standard_normal((D, D)).astype(np.float32)
    wv = rng.standard_normal((D, D)).astype(np.float32)
    g = rng.standard_normal(D).astype(np.float32)
    bta = rng.standard_normal(D).astype(np.float32)
    dh = D // H
    nodes = [
        OnnxNode("LayerNormalization", ["x", "g", "bta"], ["xn"],
                 attrs={"axis": -1, "epsilon": 1e-5}),
        OnnxNode("MatMul", ["xn", "wq"], ["q"]),
        OnnxNode("MatMul", ["xn", "wk"], ["k"]),
        OnnxNode("MatMul", ["xn", "wv"], ["v"]),
        OnnxNode("Reshape", ["q", "hs"], ["q4"]),
        OnnxNode("Reshape", ["k", "hs"], ["k4"]),
        OnnxNode("Reshape", ["v", "hs"], ["v4"]),
        OnnxNode("Transpose", ["q4"], ["qt"], attrs={"perm": [0, 2, 1, 3]}),
        OnnxNode("Transpose", ["k4"], ["kt"], attrs={"perm": [0, 2, 3, 1]}),
        OnnxNode("Transpose", ["v4"], ["vt"], attrs={"perm": [0, 2, 1, 3]}),
        OnnxNode("MatMul", ["qt", "kt"], ["scores"]),
        OnnxNode("Mul", ["scores", "scale"], ["scaled"]),
        OnnxNode("Softmax", ["scaled"], ["probs"], attrs={"axis": -1}),
        OnnxNode("MatMul", ["probs", "vt"], ["ctx"]),
        OnnxNode("Transpose", ["ctx"], ["ctxt"], attrs={"perm": [0, 2, 1, 3]}),
        OnnxNode("Reshape", ["ctxt", "fs"], ["out"]),
    ]
    inits = {"wq": wq, "wk": wk, "wv": wv, "g": g, "bta": bta,
             "hs": np.array([B, T, H, dh], np.int64),
             "fs": np.array([B, T, D], np.int64),
             "scale": np.array(1.0 / np.sqrt(dh), np.float32)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["out"])
    got = np.asarray(run(ex, x=x)["out"])

    xt = torch.tensor(x)
    xn = F.layer_norm(xt, (D,), torch.tensor(g), torch.tensor(bta))
    q = (xn @ torch.tensor(wq)).reshape(B, T, H, dh).permute(0, 2, 1, 3)
    k = (xn @ torch.tensor(wk)).reshape(B, T, H, dh).permute(0, 2, 1, 3)
    v = (xn @ torch.tensor(wv)).reshape(B, T, H, dh).permute(0, 2, 1, 3)
    probs = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(dh), dim=-1)
    want = t2n((probs @ v).permute(0, 2, 1, 3).reshape(B, T, D))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_shape_math_folds_and_jits():
    """Shape->Gather->Concat->Reshape (the classic dynamic-reshape idiom)
    must fold to static shapes so the whole graph jit-compiles."""
    nodes = [
        OnnxNode("Shape", ["x"], ["s"]),
        OnnxNode("Gather", ["s", "i0"], ["b"], attrs={"axis": 0}),
        OnnxNode("Concat", ["b", "minus1"], ["target"], attrs={"axis": 0}),
        OnnxNode("Reshape", ["x", "target"], ["y"]),
        OnnxNode("Relu", ["y"], ["z"]),
    ]
    inits = {"i0": np.array([0], np.int64),
             "minus1": np.array([-1], np.int64)}
    ex = make_exec(nodes, inits, [("x", (2, 3, 4))], ["z"])
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4) - 12
    jfn = jax.jit(ex.run)
    out = np.asarray(jfn(ex.params, {"x": jnp.asarray(x)})["z"])
    np.testing.assert_allclose(out, np.maximum(x.reshape(2, 12), 0))


def test_slice_intmax_and_negative_step():
    x = np.arange(20, dtype=np.float32).reshape(4, 5)
    imax = np.iinfo(np.int64).max
    nodes = [OnnxNode("Slice", ["x", "st", "en", "ax", "sp"], ["y"])]
    inits = {"st": np.array([1], np.int64),
             "en": np.array([imax], np.int64),
             "ax": np.array([1], np.int64),
             "sp": np.array([2], np.int64)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    np.testing.assert_array_equal(got, x[:, 1::2])

    nodes = [OnnxNode("Slice", ["x", "st", "en", "ax", "sp"], ["y"])]
    inits = {"st": np.array([-1], np.int64),
             "en": np.array([-imax], np.int64),
             "ax": np.array([0], np.int64),
             "sp": np.array([-1], np.int64)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    np.testing.assert_array_equal(got, x[::-1])


def test_pad_reflect_vs_torch():
    x = np.random.default_rng(6).standard_normal((1, 2, 9)).astype(np.float32)
    nodes = [OnnxNode("Pad", ["x", "p"], ["y"], attrs={"mode": "reflect"})]
    inits = {"p": np.array([0, 0, 3, 0, 0, 2], np.int64)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.pad(torch.tensor(x), (3, 2), mode="reflect"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_resize_nearest_and_linear_vs_torch():
    x = np.random.default_rng(7).standard_normal((1, 3, 10)).astype(np.float32)
    # nearest, asymmetric (torch default 'nearest')
    nodes = [OnnxNode("Resize", ["x", "", "sc"], ["y"],
                      attrs={"mode": "nearest",
                             "coordinate_transformation_mode": "asymmetric",
                             "nearest_mode": "floor"})]
    inits = {"sc": np.array([1.0, 1.0, 2.0], np.float32)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.interpolate(torch.tensor(x), scale_factor=2.0,
                             mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # linear, half_pixel (torch align_corners=False)
    nodes = [OnnxNode("Resize", ["x", "", "sc"], ["y"],
                      attrs={"mode": "linear",
                             "coordinate_transformation_mode": "half_pixel"})]
    ex = make_exec(nodes, inits, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.interpolate(torch.tensor(x), scale_factor=2.0,
                             mode="linear", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_norms_vs_torch():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 6, 11)).astype(np.float32)
    g = rng.standard_normal(6).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    m = rng.standard_normal(6).astype(np.float32)
    v = np.abs(rng.standard_normal(6)).astype(np.float32) + 0.1
    ex = make_exec([OnnxNode("BatchNormalization",
                             ["x", "g", "b", "m", "v"], ["y"],
                             attrs={"epsilon": 1e-5})],
                   {"g": g, "b": b, "m": m, "v": v},
                   [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.batch_norm(torch.tensor(x), torch.tensor(m),
                            torch.tensor(v), torch.tensor(g),
                            torch.tensor(b), training=False, eps=1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    ex = make_exec([OnnxNode("InstanceNormalization", ["x", "g", "b"], ["y"],
                             attrs={"epsilon": 1e-5})],
                   {"g": g, "b": b}, [("x", x.shape)], ["y"])
    got = np.asarray(run(ex, x=x)["y"])
    want = t2n(F.instance_norm(torch.tensor(x), weight=torch.tensor(g),
                               bias=torch.tensor(b), eps=1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gemm_activations_reduce():
    rng = np.random.default_rng(9)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    w = rng.standard_normal((5, 4)).astype(np.float32)
    c = rng.standard_normal(5).astype(np.float32)
    nodes = [
        OnnxNode("Gemm", ["a", "w", "c"], ["g1"],
                 attrs={"transB": 1, "alpha": 0.5, "beta": 2.0}),
        OnnxNode("Erf", ["g1"], ["e"]),
        OnnxNode("Sigmoid", ["g1"], ["s"]),
        OnnxNode("Mul", ["g1", "s"], ["silu"]),
        OnnxNode("ReduceMean", ["silu"], ["r"], attrs={"axes": [1],
                                                       "keepdims": 0}),
    ]
    ex = make_exec(nodes, {"w": w, "c": c}, [("a", a.shape)], ["e", "r"])
    out = run(ex, a=a)
    g1 = 0.5 * (a @ w.T) + 2.0 * c
    np.testing.assert_allclose(np.asarray(out["e"]),
                               t2n(torch.erf(torch.tensor(g1))),
                               rtol=1e-4, atol=1e-5)
    silu = g1 * (1 / (1 + np.exp(-g1)))
    np.testing.assert_allclose(np.asarray(out["r"]), silu.mean(1),
                               rtol=1e-4, atol=1e-5)


def test_split_expand_where_gatherelements():
    x = np.arange(12, dtype=np.float32).reshape(2, 6)
    nodes = [
        OnnxNode("Split", ["x"], ["a", "b", "c"], attrs={"axis": 1}),
        OnnxNode("Expand", ["a", "es"], ["ae"]),
        OnnxNode("Greater", ["b", "c"], ["m"]),
        OnnxNode("Where", ["m", "b", "c"], ["w"]),
        OnnxNode("GatherElements", ["x", "gi"], ["ge"], attrs={"axis": 1}),
    ]
    inits = {"es": np.array([2, 2, 2], np.int64),
             "gi": np.array([[0, 5], [2, 3]], np.int64)}
    ex = make_exec(nodes, inits, [("x", x.shape)], ["ae", "w", "ge"])
    out = run(ex, x=x)
    np.testing.assert_array_equal(np.asarray(out["ae"]).shape, (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(out["w"]),
                                  np.maximum(x[:, 2:4], x[:, 4:6]))
    np.testing.assert_array_equal(np.asarray(out["ge"]),
                                  np.take_along_axis(
                                      x, np.array([[0, 5], [2, 3]]), 1))


def test_unsupported_op_is_loud():
    ex = make_exec([OnnxNode("NonMaxSuppression", ["x"], ["y"])], {},
                   [("x", (1,))], ["y"])
    with pytest.raises(UnsupportedOnnxOp, match="NonMaxSuppression"):
        run(ex, x=np.zeros(1, np.float32))


def test_large_initializers_become_params():
    w = np.random.default_rng(10).standard_normal((64, 64)).astype(np.float32)
    small = np.array([1], np.int64)
    ex = make_exec([OnnxNode("MatMul", ["x", "w"], ["y"])],
                   {"w": w, "i": small}, [("x", (2, 64))], ["y"])
    assert "w" in ex.params and "i" in ex.consts


def test_streaming_state_concat_slice_pattern():
    """Carried conv-history pattern of the reference decoder state
    (onnx.rs:355-458): concat(history, x) -> conv -> slice new history."""
    rng = np.random.default_rng(11)
    D, Hist, T, K = 8, 4, 6, 5
    x = rng.standard_normal((1, D, T)).astype(np.float32)
    hist = rng.standard_normal((1, D, Hist)).astype(np.float32)
    w = rng.standard_normal((D, D, K)).astype(np.float32)
    imax = np.iinfo(np.int64).max
    nodes = [
        OnnxNode("Concat", ["hist", "x"], ["cat"], attrs={"axis": 2}),
        OnnxNode("Conv", ["cat", "w"], ["y"], attrs={"kernel_shape": [K]}),
        OnnxNode("Slice", ["cat", "st", "en", "ax"], ["new_hist"]),
    ]
    inits = {"w": w, "st": np.array([-Hist], np.int64),
             "en": np.array([imax], np.int64),
             "ax": np.array([2], np.int64)}
    ex = make_exec(nodes, inits,
                   [("x", x.shape), ("hist", hist.shape)], ["y", "new_hist"])
    out = run(ex, x=x, hist=hist)
    cat = np.concatenate([hist, x], axis=2)
    want_y = t2n(F.conv1d(torch.tensor(cat), torch.tensor(w)))
    np.testing.assert_allclose(np.asarray(out["y"]), want_y,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["new_hist"]),
                                  cat[:, :, -Hist:])
