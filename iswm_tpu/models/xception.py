"""Dilated Xception backbone (entry/middle/exit flow).

NHWC re-design of the reference's Xception (reference
network/backbone/xception.py:45-222), which is registered there but
unreachable from the factory (network/modeling.py:70-71 raises for
non-resnet) — here it is a first-class backbone.

Structure: conv 3x3/2 (VALID, as the reference uses padding=0) -> conv 3x3
-> block1(64->128, /4) -> block2(128->256, /8) -> block3(256->728, /16)
-> blocks4-11 (728, middle flow) -> block12(728->1024, exit, grow_last)
-> sepconv 1536 -> sepconv 2048.  ``replace_stride_with_dilation`` is a
4-tuple over (block1, block2, block3+middle, block12) exactly as the
reference's ``_make_block`` dilation accounting (xception.py:175-179).

Deliberate deviation: the reference's exit-flow conv3/conv4 keep
padding=1 even when dilated (xception.py:155,160), which shrinks the map
by 2px per conv and crashes outright on small feature maps — dead code
there (the factory never builds Xception, modeling.py:70-71).  Here they
use the standard size-preserving pad=dilation; parity with the reference
module is pinned in the undilated config (tests/test_backbone_import.py).

Feature dict: 'low_level' = block1 output (128ch, stride 4),
'out' = final 2048ch map.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    QUANT_OFF, ConvBN, QuantSpec, kaiming_normal, max_pool_torch,
)

Dtype = Any


class SepConvBN(nn.Module):
    """SeparableConv2d + BN, no activation (reference xception.py:45-55)."""

    features: int
    dilation: int = 1
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        pad = self.dilation
        x = nn.Conv(
            in_ch, (3, 3), padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=in_ch, use_bias=False,
            kernel_init=kaiming_normal,
            dtype=self.dtype, param_dtype=self.param_dtype, name="depthwise",
        )(x)
        from .layers import qat_pointwise_conv

        pw_fwd, pw_bwd = self.quant.conv_routing(x.shape[-1], self.features, 1, 1)
        if pw_fwd:
            x = qat_pointwise_conv(
                x, self.features, self.dtype, self.param_dtype, bwd=pw_bwd
            )
        else:
            x = nn.Conv(
                self.features, (1, 1), use_bias=False,
                kernel_init=kaiming_normal,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="pointwise",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn",
        )(x)
        return x


class XceptionBlock(nn.Module):
    """Residual block of `reps` separable convs (reference xception.py:58-105)."""

    out_filters: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dilation: int = 1
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        inp = x
        in_filters = x.shape[-1]

        widths = []
        filters = in_filters
        if self.grow_first:
            widths.append(self.out_filters)
            filters = self.out_filters
        widths.extend([filters] * (self.reps - 1))
        if not self.grow_first:
            widths.append(self.out_filters)

        for i, w in enumerate(widths):
            if i > 0 or self.start_with_relu:
                x = nn.relu(x)
            x = SepConvBN(w, dilation=self.dilation, name=f"sep{i}", **kw)(x, train)

        if self.strides != 1:
            x = max_pool_torch(x, 3, self.strides, 1)

        if self.out_filters != in_filters or self.strides != 1:
            skip = ConvBN(
                self.out_filters, 1, strides=self.strides, use_relu=False,
                name="skip", **kw,
            )(inp, train)
        else:
            skip = inp
        return x + skip


class Xception(nn.Module):
    arch: str = "xception"
    replace_stride_with_dilation: Sequence[bool] = (False, False, False, True)
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        rswd = self.replace_stride_with_dilation

        # Entry stem: the reference's conv1 uses padding=0 (xception.py:130),
        # conv2 padding=0 (3x3 valid).
        x = ConvBN(32, 3, strides=2, padding=[(0, 0), (0, 0)], name="stem1", **kw)(
            x, train
        )
        x = ConvBN(64, 3, padding=[(0, 0), (0, 0)], name="stem2", **kw)(x, train)

        dilation = 1

        def stage(flag: bool, strides: int):
            nonlocal dilation
            if flag:
                dilation *= strides
                return 1, dilation
            return strides, dilation

        s, d = stage(rswd[0], 2)
        x = XceptionBlock(128, 2, strides=s, start_with_relu=False,
                          dilation=d, name="block1", **kw)(x, train)
        low_level = x
        s, d = stage(rswd[1], 2)
        x = XceptionBlock(256, 2, strides=s, dilation=d, name="block2", **kw)(x, train)
        s, d = stage(rswd[2], 2)
        x = XceptionBlock(728, 2, strides=s, dilation=d, name="block3", **kw)(x, train)
        for i in range(4, 12):  # middle flow shares block3's dilation
            x = XceptionBlock(728, 3, dilation=d, name=f"block{i}", **kw)(x, train)
        s, d = stage(rswd[3], 2)
        x = XceptionBlock(1024, 2, strides=s, grow_first=False,
                          dilation=d, name="block12", **kw)(x, train)

        x = nn.relu(SepConvBN(1536, dilation=d, name="conv3", **kw)(x, train))
        x = nn.relu(SepConvBN(2048, dilation=d, name="conv4", **kw)(x, train))
        return {"low_level": low_level, "out": x}
