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
