"""MobileNetV2 backbone with output-stride control.

The reference snapshot lacks a MobileNet backbone but its baseline config
names ``deeplabv3plus_mobilenet`` as a target (SURVEY §0.1.3); this is the
standard MobileNetV2 inverted-residual stack with stride->dilation
substitution once the running stride reaches the requested output stride
(the scheme VainF's upstream DeepLabV3Plus-Pytorch uses for its mobilenet
deeplab variant).

Feature dict: 'low_level' = end of the 24ch stage (stride 4),
'out' = final 320ch inverted-residual output (stride = output_stride).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import QUANT_OFF, ConvBN, QuantSpec

Dtype = Any

# (expansion t, channels c, repeats n, stride s) — MobileNetV2 paper table 2.
_INVERTED_RESIDUAL_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),  # low_level tap after this stage (stride 4)
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.strides == 1 and in_ch == self.features

        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, 1, use_relu=False, name="expand_conv", **kw)(y, train)
            y = nn.relu6(y)
        y = ConvBN(
            hidden, 3, strides=self.strides, dilation=self.dilation,
            groups=hidden, use_relu=False, name="depthwise", **kw,
        )(y, train)
        y = nn.relu6(y)
        y = ConvBN(self.features, 1, use_relu=False, name="project", **kw)(y, train)
        if use_res:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    arch: str = "mobilenetv2"
    output_stride: int = 16
    width_mult: float = 1.0
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        input_channel = _make_divisible(32 * self.width_mult)

        x = ConvBN(input_channel, 3, strides=2, use_relu=False, name="stem", **kw)(
            x, train
        )
        x = nn.relu6(x)

        features = {}
        current_stride = 2
        dilation = 1
        for stage_idx, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_SETTINGS):
            out_ch = _make_divisible(c * self.width_mult)
            for block_idx in range(n):
                stride = s if block_idx == 0 else 1
                if stride > 1 and current_stride >= self.output_stride:
                    # Trade stride for dilation past the requested OS.
                    dilation *= stride
                    stride = 1
                x = InvertedResidual(
                    out_ch,
                    strides=stride,
                    expand_ratio=t,
                    dilation=dilation,
                    name=f"stage{stage_idx}_{block_idx}",
                    **kw,
                )(x, train)
                current_stride *= stride
            if stage_idx == 1:  # 24ch stage -> stride 4 low-level feature
                features["low_level"] = x
        features["out"] = x  # 320ch
        return features
