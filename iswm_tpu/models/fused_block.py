"""Flax integration of the fused BatchNorm-training bottleneck path.

``fused_bottleneck_apply`` computes the full ResNet Bottleneck residual
block (reference network/backbone/resnet.py:78-120 semantics) through the
Pallas kernels in :mod:`iswm_tpu.ops.pallas.fused_block`, so that in
training mode every intermediate tensor crosses HBM once per direction
instead of the stats-then-normalize double pass XLA emits for
``ConvBN`` chains (see that module's docstring for the roofline math).

The variable tree it declares is IDENTICAL to the unfused
``Bottleneck`` composition (``conv1/{conv,bn}``, ``conv2/...``,
``conv3/...``, ``downsample/...`` with flax ``BatchNorm`` batch_stats
``mean``/``var``), so reference-checkpoint import, Orbax checkpoints and
the torch exporter are unaffected by the dispatch, and a model can flip
between fused/unfused per call.

Statistics/normalization semantics match ``flax.linen.BatchNorm``
(f32 stats over the rounded conv output, fast variance, momentum update
``m*ra + (1-m)*batch``); summation order differs, so training curves
agree to bf16 rounding rather than bitwise (tests pin this tolerance).

Scope: training-mode, stride-1/dilation-1 Bottlenecks on a single chip
(like the fused-CE loss, an opaque ``pallas_call`` under a multi-device
jit would force GSPMD gathers; the sharded variant is future work —
ROADMAP "Performance").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas.fused_block import (
    _pick_tile_m,
    conv3x3_bn_stats,
    matmul_bn_stats,
)
from .layers import BNVars, ConvVars

Dtype = Any
f32 = jnp.float32


class ConvBNVars(nn.Module):
    """``ConvBN``-shaped variable declaration (children ``conv``, ``bn``)."""

    features: int
    kernel_size: int = 1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = ConvVars(
            self.features, self.kernel_size, self.param_dtype, name="conv"
        )(in_ch)
        scale, bias, ra_mean, ra_var = BNVars(self.param_dtype, name="bn")(
            self.features
        )
        return kernel, scale, bias, ra_mean, ra_var


def fused_block_eligible(shape) -> bool:
    """Can the Pallas path handle this activation shape?"""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    return _pick_tile_m(b * h * w) > 0 and h >= 3 and w >= 3


def _finalize_stats(s, q, count, scale, bias, eps):
    """flax-_compute_stats + affine fold: returns (mean, var, a, b) with
    ``normalize(y) = a*y + b`` (all f32)."""
    mean = s / count
    var = jnp.maximum(0.0, q / count - mean * mean)
    a = jax.lax.rsqrt(var + eps) * scale
    return mean, var, a, bias - mean * a


def fused_bottleneck_apply(
    block: nn.Module,
    x: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run one Bottleneck block through the fused kernels.

    Must be called from within ``block.__call__`` (declares the block's
    variables in its scope).  ``block`` provides planes/downsample/dtype
    attrs; strides/dilation must be 1 (checked by the caller).
    """
    planes = block.planes
    cdt = block.dtype
    pdt = block.param_dtype
    mom = block.bn_momentum
    eps = block.bn_epsilon

    bsz, h, w, cin = x.shape
    count = float(bsz * h * w)
    x2 = x.reshape(bsz * h * w, cin)
    zk = jnp.zeros((cin,), f32)
    updating = not block.is_initializing()

    def declare(name, features, ksize, in_ch):
        return ConvBNVars(features, ksize, pdt, name=name)(in_ch)

    def update_running(ra_mean, ra_var, mean, var):
        if updating:
            ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
            ra_var.value = mom * ra_var.value + (1.0 - mom) * var

    # conv1: 1x1, no prologue (block input is already post-ReLU)
    k1, sc1, bi1, rm1, rv1 = declare("conv1", planes, 1, cin)
    y1, s1, q1 = matmul_bn_stats(
        x2, k1.reshape(cin, planes).astype(cdt), zk, zk, False, interpret
    )
    mean1, var1, a1, b1 = _finalize_stats(s1, q1, count, sc1, bi1, eps)
    update_running(rm1, rv1, mean1, var1)

    # conv2: 3x3, normalize+ReLU prologue
    k2, sc2, bi2, rm2, rv2 = declare("conv2", planes, 3, planes)
    y2, s2, q2 = conv3x3_bn_stats(
        y1.reshape(bsz, h, w, planes), a1, b1, k2, interpret
    )
    mean2, var2, a2, b2 = _finalize_stats(s2, q2, count, sc2, bi2, eps)
    update_running(rm2, rv2, mean2, var2)

    # conv3: 1x1 expand, normalize+ReLU prologue
    k3, sc3, bi3, rm3, rv3 = declare("conv3", planes * 4, 1, planes)
    y3, s3, q3 = matmul_bn_stats(
        y2.reshape(bsz * h * w, planes),
        k3.reshape(planes, planes * 4).astype(cdt),
        a2, b2, True, interpret,
    )
    mean3, var3, a3, b3 = _finalize_stats(s3, q3, count, sc3, bi3, eps)
    update_running(rm3, rv3, mean3, var3)

    # identity path (+ optional 1x1 downsample projection)
    if block.downsample:
        kd, scd, bid, rmd, rvd = declare("downsample", planes * 4, 1, cin)
        yd, sd, qd = matmul_bn_stats(
            x2, kd.reshape(cin, planes * 4).astype(cdt), zk, zk, False, interpret
        )
        meand, vard, ad, bd = _finalize_stats(sd, qd, count, scd, bid, eps)
        update_running(rmd, rvd, meand, vard)
        identity = yd.astype(f32) * ad + bd
    else:
        identity = x2.astype(f32)

    # final normalize + residual add + ReLU: one XLA elementwise fusion
    out = jnp.maximum(y3.astype(f32) * a3 + b3 + identity, 0.0)
    return out.astype(cdt).reshape(bsz, h, w, planes * 4)
