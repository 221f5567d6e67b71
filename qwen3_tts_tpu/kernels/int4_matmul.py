"""Packed-int4 matmul Pallas kernel.

Decode is HBM-bound: every LM weight streams from HBM once per talker step
and ~15x per frame for the predictor.  int8 (ops.quant) halves the bf16
stream; this kernel halves it again by reading nibble-packed int4 and
dequantizing inside VMEM, right before the MXU dot.  Plain XLA cannot do
this: the shift/interleave chain defeats operand fusion and materializes
full bf16 weights in HBM (measured 6x SLOWER than int8 — bench_micro
--int4 before this kernel existed).

Layout (ops.quant.quantize_weight_int4):
  q4 [K/2, N] int8 — byte i holds w[2i] (low nibble, sign-extended) and
                     w[2i+1] (high nibble)
  s  [K/G, N] f32 — per (input-group, output-channel) scales

The kernel receives x pre-split into even/odd input columns so no
interleave is needed in VMEM:
  out = x_even @ (lo * s) + x_odd @ (hi * s)
(group scales broadcast over G/2 packed rows — same group for both nibbles
of a byte since G is even).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref, *, groups: int):
    w = w_ref[...].astype(jnp.int32)                     # [K/2, BN]
    # Mosaic can't legalize shifts on int8 vectors; int32 shifts lower fine.
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)      # sign-extended
    hi = jnp.right_shift(w, 4)
    k_half, bn = w.shape
    g_half = k_half // groups
    s = s_ref[...].astype(jnp.bfloat16)                  # [groups, BN]
    # broadcast scales over each group's packed rows: [groups,1,BN]->[K/2,BN]
    lo_d = (lo.reshape(groups, g_half, bn).astype(jnp.bfloat16)
            * s[:, None, :]).reshape(k_half, bn)
    hi_d = (hi.reshape(groups, g_half, bn).astype(jnp.bfloat16)
            * s[:, None, :]).reshape(k_half, bn)
    acc = jnp.dot(xe_ref[...], lo_d, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo_ref[...], hi_d,
                        preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _block_n(n: int) -> int:
    for bn in (512, 384, 256, 128):
        if n % bn == 0:
            return bn
    return n


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_int4(x: jnp.ndarray, w4: dict, interpret: bool = False
                ) -> jnp.ndarray:
    """x [..., K] @ packed-int4 w {q4 [K/2, N], s [K/G, N]} -> [..., N] f32.

    Falls back to the XLA dequant path off-TPU (CPU tests) and for shapes
    the kernel doesn't tile.
    """
    q4, s = w4["q4"], w4["s"]
    k_half, n = q4.shape[-2], q4.shape[-1]
    k = k_half * 2
    groups = s.shape[-2]
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    usable = (jax.default_backend() == "tpu" or interpret) \
        and q4.ndim == 2 and x.shape[-1] == k \
        and n % 128 == 0 and k_half % 8 == 0 and (k_half % groups == 0)
    if not usable:
        from ..ops.quant import _unpack_int4
        return (x @ _unpack_int4(w4, x.dtype)).astype(jnp.float32)

    xm = x.reshape(m, k).astype(jnp.bfloat16)
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    xe = xm[:, 0::2]                                     # [M, K/2]
    xo = xm[:, 1::2]

    bn = _block_n(n)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m_pad, k_half), lambda j: (0, 0)),
            pl.BlockSpec((m_pad, k_half), lambda j: (0, 0)),
            pl.BlockSpec((k_half, bn), lambda j: (0, j)),
            pl.BlockSpec((groups, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(xe, xo, q4, s)
    return out[:m].reshape(lead + (n,))
