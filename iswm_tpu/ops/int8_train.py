"""Experimental int8-forward training convs (QAT w/ straight-through grads).

BASELINE.md "int8 via XLA" showed XLA lowers int8 convs at the 2× MXU rate
on v5e; the bf16 train step is capped at ~280-300 tiles/s by near-peak
bf16 matmuls (the round-2 roofline).  This module makes the FORWARD conv
FLOPs run int8 while the backward stays in the compute dtype:

  fwd:  out = dequant(conv_int8(quant(x), quant(W)))  — real int8 MXU conv
        with dynamic symmetric scales (per-tensor x, per-channel W)
  bwd:  straight-through — the cotangents are those of the DENSE conv at
        the unquantized (x, W), computed via jax.linear_transpose of the
        bilinear conv (no dense forward is executed)

This is quantization-aware training, NOT bit-exact bf16 training: forward
activations carry 8-bit rounding noise, so trajectories differ from the
bf16 path (a deliberate, opt-in numerics change; ModelConfig.int8_training
defaults off, golden regressions pin the default path).  Accuracy must be
validated per-task — the synthetic-anchor experiment is recorded in
BASELINE.md.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _dyn_quant_x(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor symmetric int8 with a dynamic absmax scale."""
    amax = jax.lax.stop_gradient(jnp.max(jnp.abs(x.astype(jnp.float32))))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _dyn_quant_w(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 (HWIO -> scale over O)."""
    amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True)
    )
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _dense_conv(x, w, strides, padding, dilation):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def int8_conv_st(
    x: jax.Array,  # [B, H, W, Cin] float (bf16/f32)
    w: jax.Array,  # [kh, kw, Cin, Cout] float
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Dense conv whose forward executes int8×int8→int32 on the MXU."""
    x_q, x_s = _dyn_quant_x(x)
    w_q, w_s = _dyn_quant_w(w)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_s * w_s.reshape(-1)
    return out.astype(x.dtype)


def _fwd(x, w, strides, padding, dilation):
    return int8_conv_st(x, w, strides, padding, dilation), (x, w)


def _bwd(strides, padding, dilation, res, g):
    x, w = res
    g = g.astype(x.dtype)
    # straight-through: transpose the BILINEAR dense conv at (x, w) —
    # linear_transpose only transposes the jaxpr, no dense forward runs
    dx = jax.linear_transpose(
        lambda xx: _dense_conv(xx, w, strides, padding, dilation), x
    )(g)[0]
    dw = jax.linear_transpose(
        lambda ww: _dense_conv(x, ww, strides, padding, dilation), w
    )(g)[0]
    return dx, dw


int8_conv_st.defvjp(_fwd, _bwd)


# ------------------------------------------------- delayed (stale) scaling
#
# The dynamic path above needs TWO full reads of the activation tensor per
# conv: one reduction pass for absmax (the scale), then — only after that
# reduction completes — the quantize pass that divides by it.  XLA cannot
# fuse them because the scale depends on the whole tensor.  Delayed scaling
# (the fp8-training recipe, e.g. NVIDIA Transformer Engine's amax history)
# quantizes with the PREVIOUS step's scale — a compile-time-independent
# input — so the quantize fuses into a single pass, and the current step's
# absmax (needed only to update the running amax for the NEXT step) fuses
# into that same read.  Activations drift slowly step-to-step; the ±127
# clip absorbs one step of growth and the running-max update re-adapts the
# scale on the following step.


def int8_conv_static_amax(
    x: jax.Array,
    w: jax.Array,
    x_amax: jax.Array,  # scalar f32: running activation absmax (stale)
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    dilation: Tuple[int, int] = (1, 1),
    amax_decay: float = 0.999,
) -> Tuple[jax.Array, jax.Array]:
    """int8-forward conv with a delayed activation scale.

    Returns ``(out, new_amax)`` where ``new_amax = max(|x|, decay*x_amax)``
    is the caller's next-step running amax (store it in the model's
    "quant" collection).  Gradients are straight-through like
    ``int8_conv_st``; the amax output and scale input carry no gradient.
    """
    cur = jax.lax.stop_gradient(jnp.max(jnp.abs(x.astype(jnp.float32))))
    out = _int8_conv_static(x, w, x_amax, strides, padding, dilation)
    new_amax = jnp.maximum(cur, x_amax.astype(jnp.float32) * amax_decay)
    return out, new_amax


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _int8_conv_static(x, w, x_amax, strides, padding, dilation):
    scale = jnp.where(x_amax > 0, x_amax.astype(jnp.float32) / 127.0, 1.0)
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    w_q, w_s = _dyn_quant_w(w)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * scale * w_s.reshape(-1)
    return out.astype(x.dtype)


def _static_fwd(x, w, x_amax, strides, padding, dilation):
    return _int8_conv_static(x, w, x_amax, strides, padding, dilation), (x, w)


def _static_bwd(strides, padding, dilation, res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = jax.linear_transpose(
        lambda xx: _dense_conv(xx, w, strides, padding, dilation), x
    )(g)[0]
    dw = jax.linear_transpose(
        lambda ww: _dense_conv(x, ww, strides, padding, dilation), w
    )(g)[0]
    return dx, dw, jnp.zeros((), jnp.float32)


_int8_conv_static.defvjp(_static_fwd, _static_bwd)


# ----------------------------------------------------- int8 BACKWARD convs
#
# Round-3 follow-up: the fwd-only QAT above measured slightly NEGATIVE on
# the full train step because the forward is only ~1/3 of step FLOPs; the
# backward (dgrad + wgrad, each ≈ fwd FLOPs) stayed bf16 "by design".
# With XLA's int8 lowering measured at the 2× MXU rate (BASELINE.md "int8
# via XLA"), routing the backward too is the one live lever to the stated
# 280–300 tiles/s train target.  Numerics: the incoming cotangent g is
# quantized per-tensor (symmetric dynamic absmax) — int8 GRADIENTS are a
# deliberate, opt-in training-numerics change on top of QAT; fwd/bwd
# consistency is preserved where it matters (wgrad contracts the SAME
# quantized activations the forward consumed, dgrad the same quantized
# weights re-scaled per-tensor).


def _vjp_lhs_padding(in_size, k, stride, pad, dilation, out_size):
    """Per-dim padding of the dgrad conv (jax's transpose-lhs rule)."""
    lhs_dilated = (out_size - 1) * stride + 1
    rhs_dilated = (k - 1) * dilation + 1
    pad_before = rhs_dilated - 1 - pad[0]
    pad_after = in_size + rhs_dilated - 1 - lhs_dilated - pad_before
    return (pad_before, pad_after)


def _vjp_rhs_padding(in_size, k, stride, pad, dilation, out_size):
    """Per-dim padding of the wgrad conv (jax's transpose-rhs rule)."""
    rhs_dilated = (out_size - 1) * stride + 1
    out_dilated = (k - 1) * dilation + 1
    pad_before = pad[0]
    pad_after = out_dilated + rhs_dilated - 1 - in_size - pad_before
    return (pad_before, pad_after)


def _int8_dgrad(g_q, g_s, w, x_shape, strides, padding, dilation):
    """dx of the dense conv, computed as an int8 transposed conv.

    ``w`` is the unquantized kernel; it is re-quantized here PER-TENSOR
    (the fwd per-O scales cannot factor out of dgrad's O-contraction).
    """
    kh, kw = w.shape[0], w.shape[1]
    w_amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(w.astype(jnp.float32)))
    )
    w_s = jnp.where(w_amax > 0, w_amax / 127.0, 1.0)
    w_q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / w_s), -127, 127
    ).astype(jnp.int8)
    # spatially flipped, I/O swapped kernel
    w_t = jnp.transpose(w_q[::-1, ::-1], (0, 1, 3, 2))
    pads = [
        _vjp_lhs_padding(x_shape[1 + i], (kh, kw)[i], strides[i],
                         padding[i], dilation[i], g_q.shape[1 + i])
        for i in range(2)
    ]
    acc = jax.lax.conv_general_dilated(
        g_q, w_t, (1, 1), pads,
        lhs_dilation=strides, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (g_s * w_s)


def _int8_wgrad(x_q, x_s, g_q, g_s, k, strides, padding, dilation):
    """dw of the dense conv as an int8 conv contracting over (B, H, W):
    lhs = the SAME quantized activations the forward consumed (spec CHWN,
    batch dim = Cin), rhs = the quantized cotangent (spec IHWO, feature
    dim = B), output spatial extent = the kernel.

    1×1 kernels take the dot_general form instead: measured on v5e, the
    int8 wgrad-as-dot runs at 373 TOP/s (4× the 94 TFLOP/s bf16 dot)
    while the conv form stays at the bf16 rate (179 ≈ 177) — XLA only
    engages the 2× int8 MXU rate for the dot lowering of this
    contraction (scripts/int8_xla_bench.py wgrad1x1dot/wgrad3x3 rows).
    """
    if k == (1, 1) and tuple(map(tuple, padding)) == ((0, 0), (0, 0)):
        # subsample x to the output grid (stride s; offset 0 because the
        # zoo's 1×1 convs are unpadded — torch pads (k//2)*d = 0)
        xs = x_q[:, :: strides[0], :: strides[1], :]
        xs = xs[:, : g_q.shape[1], : g_q.shape[2], :]
        m = xs.shape[0] * xs.shape[1] * xs.shape[2]
        dw = jax.lax.dot_general(
            xs.reshape(m, xs.shape[3]),
            g_q.reshape(m, g_q.shape[3]),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [Cin, Cout]
        dw = dw.astype(jnp.float32) * (x_s * g_s)
        return dw[None, None]
    pads = [
        _vjp_rhs_padding(x_q.shape[1 + i], k[i], strides[i],
                         padding[i], dilation[i], g_q.shape[1 + i])
        for i in range(2)
    ]
    acc = jax.lax.conv_general_dilated(
        x_q, g_q, dilation, pads,
        rhs_dilation=strides,
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.int32,
    )  # [Cin, kh, kw, Cout]
    dw = acc.astype(jnp.float32) * (x_s * g_s)
    return jnp.transpose(dw, (1, 2, 0, 3))


def _quant_g(g):
    amax = jnp.max(jnp.abs(g.astype(jnp.float32)))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(g.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def int8_conv_fullq(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    padding=((1, 1), (1, 1)),
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Conv whose forward AND backward (dgrad + wgrad) run int8 on the MXU.

    Forward matches :func:`int8_conv_st` (dynamic per-tensor x scale,
    per-O w scales).  Backward quantizes the cotangent per-tensor and
    reuses the forward's quantized activations as the wgrad operand (they
    are kept as int8 residuals — half the bf16 residual bytes).
    ``padding`` must be explicit per-dim pairs (no "SAME" strings): the
    transpose padding rules need the numbers.
    """
    x_q, x_s = _dyn_quant_x(x)
    w_q, w_s = _dyn_quant_w(w)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_s * w_s.reshape(-1)
    return out.astype(x.dtype)


def _fullq_fwd(x, w, strides, padding, dilation):
    x_q, x_s = _dyn_quant_x(x)
    w_q, w_s = _dyn_quant_w(w)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * x_s * w_s.reshape(-1)).astype(x.dtype)
    # zero-size dtype witness: residuals must be JAX types, and keeping x
    # itself would defeat the int8 residual savings
    return out, (x_q, x_s, w, jnp.zeros((0,), x.dtype))


def _fullq_bwd(strides, padding, dilation, res, g):
    x_q, x_s, w, x_wit = res
    x_shape, x_dtype = x_q.shape, x_wit.dtype
    g_q, g_s = _quant_g(jax.lax.stop_gradient(g))
    dx = _int8_dgrad(
        g_q, g_s, w, x_shape, strides, padding, dilation
    ).astype(x_dtype)
    dw = _int8_wgrad(
        x_q, x_s, g_q, g_s, (w.shape[0], w.shape[1]),
        strides, padding, dilation,
    ).astype(w.dtype)
    return dx, dw


int8_conv_fullq.defvjp(_fullq_fwd, _fullq_bwd)


def int8_conv_fullq_static(
    x: jax.Array,
    w: jax.Array,
    x_amax: jax.Array,  # scalar f32: running activation absmax (stale)
    strides: Tuple[int, int] = (1, 1),
    padding=((1, 1), (1, 1)),
    dilation: Tuple[int, int] = (1, 1),
    amax_decay: float = 0.999,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`int8_conv_fullq` with a DELAYED forward activation scale.

    Composes the two measured-efficient pieces: the forward quantize uses
    the previous step's running amax (one fusable pass, like
    :func:`int8_conv_static_amax`), and the backward runs int8 dgrad/wgrad
    like :func:`int8_conv_fullq` (the cotangent quantize is necessarily
    dynamic — gradients have no slowly-drifting scale to carry).  Returns
    ``(out, new_amax)``; store ``new_amax`` in the "quant" collection.
    """
    cur = jax.lax.stop_gradient(jnp.max(jnp.abs(x.astype(jnp.float32))))
    out = _int8_conv_fullq_static(x, w, x_amax, strides, padding, dilation)
    new_amax = jnp.maximum(cur, x_amax.astype(jnp.float32) * amax_decay)
    return out, new_amax


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _int8_conv_fullq_static(x, w, x_amax, strides, padding, dilation):
    out, _ = _fullq_static_fwd(x, w, x_amax, strides, padding, dilation)
    return out


def _fullq_static_fwd(x, w, x_amax, strides, padding, dilation):
    scale = jnp.where(x_amax > 0, x_amax.astype(jnp.float32) / 127.0, 1.0)
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    w_q, w_s = _dyn_quant_w(w)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * scale * w_s.reshape(-1)).astype(x.dtype)
    return out, (x_q, scale, w, jnp.zeros((0,), x.dtype))


def _fullq_static_bwd(strides, padding, dilation, res, g):
    dx, dw = _fullq_bwd(strides, padding, dilation, res, g)
    return dx, dw, jnp.zeros((), jnp.float32)


_int8_conv_fullq_static.defvjp(_fullq_static_fwd, _fullq_static_bwd)


# ------------------------------------------- int8 valid-tap atrous conv
#
# Training QAT for the ASPP ShiftedDilatedConv branches (dilation 6/12/18
# valid-tap matmuls, models/layers.dilated_conv3x3).  The forward runs the
# tap dots int8 (like serving's ops/int8_xla.int8_shifted_dilated_conv);
# the backward either stays dense bf16 (straight-through, int8_bwd=False)
# or runs int8 too: wgrad keeps the valid-tap form as int8 DOTS (the
# lowering measured at 4x the bf16 dot rate — scripts/int8_xla_bench.py
# wgrad1x1dot), dgrad is one int8 dilated conv of the quantized cotangent
# with the per-tensor re-quantized rotated kernel.
#
# No delayed-scale variant: all ASPP branches quantize the SAME input
# tensor, so XLA CSEs the dynamic absmax+quantize to one pass across the
# branches — the delayed mode's saving is already amortized here.


def _int8_taps(x_q, w_q, d):
    """Valid-tap shifted int8 matmuls -> int32 accumulator [B,H,W,F]."""
    b, h, w_, c = x_q.shape
    acc = None
    for i, dy in enumerate((-d, 0, d)):
        for j, dx_ in enumerate((-d, 0, d)):
            ys, ye = max(0, -dy), h - max(0, dy)
            xs, xe = max(0, -dx_), w_ - max(0, dx_)
            if ye <= ys or xe <= xs:
                continue  # tap entirely in padding
            src = jax.lax.slice(
                x_q, (0, ys + dy, xs + dx_, 0), (b, ye + dy, xe + dx_, c)
            )
            t = jax.lax.dot_general(
                src, w_q[i, j], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            t = jax.lax.pad(
                t, jnp.zeros((), jnp.int32),
                ((0, 0, 0), (ys, h - ye, 0), (xs, w_ - xe, 0), (0, 0, 0)),
            )
            acc = t if acc is None else acc + t
    return acc


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_dilated_conv3x3(
    x: jax.Array, w: jax.Array, d: int, int8_bwd: bool = False
) -> jax.Array:
    """QAT valid-tap atrous conv: int8 forward, selectable backward.

    Math matches Conv2d(3,3,dilation=d,padding=d,bias=False) under the
    symmetric-quantization contract (models/layers.dilated_conv3x3 is the
    dense counterpart, reference _deeplab.py:121-128 ASPPConv behavior).
    """
    out, _ = _dil_fwd(x, w, d, int8_bwd)
    return out


def _dil_fwd(x, w, d, int8_bwd):
    x_q, x_s = _dyn_quant_x(x)
    w_q, w_s = _dyn_quant_w(w)
    acc = _int8_taps(x_q, w_q, d)
    out = (acc.astype(jnp.float32) * x_s * w_s.reshape(-1)).astype(x.dtype)
    if int8_bwd:
        # int8 residuals (the dense x is not kept)
        return out, (x_q, x_s, w, jnp.zeros((0,), x.dtype))
    return out, (x, w, None, None)


def _dil_bwd(d, int8_bwd, res, g):
    if not int8_bwd:
        x, w, _, _ = res
        # straight-through: the dense tap-decomposition backward
        from ..models.layers import _dilated_bwd

        return _dilated_bwd(d, (x, w), g.astype(x.dtype))

    x_q, x_s, w, x_wit = res
    b, h, w_, c = x_q.shape
    g_q, g_s = _quant_g(jax.lax.stop_gradient(g))
    # dgrad: one int8 dilated conv of g with the rot180, I/O-swapped,
    # per-tensor re-quantized kernel
    w_amax = jax.lax.stop_gradient(jnp.max(jnp.abs(w.astype(jnp.float32))))
    w_s_pt = jnp.where(w_amax > 0, w_amax / 127.0, 1.0)
    w_q_pt = jnp.clip(
        jnp.round(w.astype(jnp.float32) / w_s_pt), -127, 127
    ).astype(jnp.int8)
    k_rot = jnp.flip(w_q_pt, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g_q, k_rot, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    dx = (dx.astype(jnp.float32) * (g_s * w_s_pt)).astype(x_wit.dtype)
    # wgrad: per valid tap, int8 dot of the forward's quantized input
    # window against the quantized cotangent window
    dk_taps = []
    for i, dy in enumerate((-d, 0, d)):
        row = []
        for j, dx_ in enumerate((-d, 0, d)):
            ys, ye = max(0, -dy), h - max(0, dy)
            xs, xe = max(0, -dx_), w_ - max(0, dx_)
            if ye <= ys or xe <= xs:
                row.append(jnp.zeros((c, w.shape[-1]), jnp.float32))
                continue
            src = jax.lax.slice(
                x_q, (0, ys + dy, xs + dx_, 0), (b, ye + dy, xe + dx_, c)
            )
            gv = jax.lax.slice(g_q, (0, ys, xs, 0), (b, ye, xe, g_q.shape[-1]))
            dw = jax.lax.dot_general(
                src, gv, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            row.append(dw.astype(jnp.float32) * (x_s * g_s))
        dk_taps.append(jnp.stack(row))
    dk = jnp.stack(dk_taps).astype(w.dtype)
    return dx, dk


int8_dilated_conv3x3.defvjp(_dil_fwd, _dil_bwd)


# ------------------------------------------------ per-site routing cost model
#
# The round-3 gate sweep (BASELINE.md "int8 fwd+bwd TRAINING") showed the
# int8-vs-bf16 trade is PER-LAYER: a scalar input-channel threshold admits a
# narrow 1x1 whenever it admits its wide 3x3 sibling, yet the 1x1 loses (its
# quantize passes cost more HBM time than its small matmul saves on the MXU)
# while the 3x3 wins.  This roofline model decides each conv site from its
# static geometry alone at TRACE time — no measurement loop, no dynamism.
#
# Everything is normalized PER INPUT ACTIVATION VALUE (one channel of one
# pixel), which cancels B*H*W and makes the decision shape-independent:
#   MACs/value      = k^2 * cout / stride^2     (each value feeds k^2 taps of
#                                                cout outputs; stride^2 fewer
#                                                output pixels)
#   MXU time saved  = 2 * MACs * (1/bf16_peak - 1/int8_peak)   [s/value]
#   quantize cost   = bytes_touched / hbm_bw                   [s/value]
# Weight quantization is ignored: its k^2*cin*cout values amortize over
# B*H*W activations (<<1% at segmentation shapes).

# v5e per-chip peaks (public spec; BASELINE.md roofline section measured
# 190 TFLOP/s bf16 and 381 TOP/s int8 achievable on large convs).
V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0
V5E_HBM_GBPS = 819.0


def int8_cost_route(
    cin: int,
    cout: int,
    k: int,
    stride: int,
    *,
    delayed: bool = False,
    want_bwd: bool = False,
    quant_bytes: float = 3.0,
) -> Tuple[bool, bool]:
    """(route_fwd, route_bwd) for one conv site, from static geometry.

    ``quant_bytes`` is the incremental HBM traffic one DYNAMIC activation
    quantize charges per value: an absmax reduction read + a quantize-pass
    read + an int8 write ≈ 2*bf16 + 1 = 5 raw bytes, of which XLA fuses
    part into neighbouring consumers — 3.0 matched the measured gate-256
    optimum at 512² (the implied fwd threshold k²·cout/stride² ≳ 722
    routes exactly the layer2+ 3x3s and the wide 1x1 expansions that the
    winning scalar gate routed, while also skipping the narrow 1x1
    reducers it could not).  Delayed scaling folds absmax+quantize into
    one fused pass: charged a third.  NOTE: because quant_bytes was
    back-fitted to the measured gate-256 optimum, the round-4 cost-vs-gate
    wash on the flagship is partly circular.  Round-5 off-calibration A/Bs
    (BASELINE.md "Measured (round 5)"): OS=8 512²/bs4 cost 66.47 vs
    gate-256 67.08 tiles/s (−0.9%, wash) and mobilenetv2 200²/bs32 cost
    2983.4 vs gate-256 2927.3 (**+1.9% — the one measured win**, on the
    depthwise/pointwise mix where channel width is not the cost proxy).
    Verdict: gate 256 stays the default; "cost" is a mild opt-in for
    depthwise-heavy backbones.  Known conservatism: sites that
    share one quantized input (the five ASPP branches, ConcatConvBN
    parts) are each charged a full quantize pass although XLA CSEs the
    dynamic quantize across them.

    bwd: dgrad + wgrad each save the same MXU time as the forward conv;
    their only new quantize is the cotangent (cout/stride² values per
    input value — wgrad reuses the forward's quantized activations and
    dgrad's quantized cotangent, ops/int8_train.py:232).
    """
    mxu_sec_saved = (
        2.0 * k * k * cout / (stride * stride)
        * (1.0 / (V5E_BF16_TFLOPS * 1e12) - 1.0 / (V5E_INT8_TOPS * 1e12))
    )
    q_sec = quant_bytes / (V5E_HBM_GBPS * 1e9)
    if delayed:
        q_sec /= 3.0
    fwd = mxu_sec_saved > q_sec
    if not (fwd and want_bwd):
        # bwd reuses the forward's quantized activations; without the fwd
        # routed there is no int8 residual to reuse, so bwd follows fwd.
        return fwd, False
    g_values_per_input = cout / (cin * stride * stride)
    # cotangent quantize is always dynamic (a gradient has no slowly-
    # drifting scale to carry), so full quant_bytes regardless of mode
    bwd_cost = (quant_bytes / (V5E_HBM_GBPS * 1e9)) * g_values_per_input
    return True, 2.0 * mxu_sec_saved > bwd_cost
