"""DeepLabV3 / DeepLabV3+ heads and the full segmentation model.

TPU-native redesign of the reference head stack (reference
network/_deeplab.py:33-172, network/utils.py:7-25):

  - ASPP: 1x1 + three 3x3 atrous branches + global-pool branch, concat to
    1280ch, 1x1 project to 256 + dropout(0.1).  On TPU the five branches
    are independent matmul/conv fusions XLA schedules onto the MXU; the
    concat+1x1 projection contracts 1280->256 in one matmul.
  - DeepLabHeadV3Plus: low-level 1x1->48ch projection, ASPP on the deep
    feature, bilinear x(OS/4) upsample, concat (304ch), 3x3/3x3/1x1
    classifier.
  - DeepLabV3Model: backbone -> head -> bilinear upsample to input H,W,
    returning raw NHWC logits (reference returns NCHW; layout is the one
    intentional API difference).

The ``separable`` flag swaps every k>1 head conv for an atrous separable
conv — the reference defines this (``AtrousSeparableConvolution``,
_deeplab.py:95-119) but never wires it (SURVEY §0.1.6); here it is a
first-class variant.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .layers import (
    QUANT_OFF,
    ConcatConvBN,
    ConvBN,
    QuantSpec,
    SeparableConvBN,
    global_avg_pool,
    kaiming_normal,
)

Dtype = Any


def _conv3x3(separable: bool):
    return SeparableConvBN if separable else ConvBN


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (reference _deeplab.py:143-172)."""

    atrous_rates: Sequence[int]
    out_channels: int = 256
    separable: bool = False
    dropout_rate: float = 0.1
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        Conv3 = _conv3x3(self.separable)

        branches = [ConvBN(self.out_channels, 1, name="b0", **kw)(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                Conv3(self.out_channels, 3, dilation=rate, name=f"b{i + 1}", **kw)(
                    x, train
                )
            )
        # Image-level pooling branch (reference ASPPPooling, _deeplab.py:130-141).
        pooled = global_avg_pool(x)
        pooled = ConvBN(self.out_channels, 1, name="pool", **kw)(pooled, train)

        if train:
            # concat(5x256) + 1x1 project as a sum of per-branch
            # projections (ConcatConvBN) — measured +2.5 tiles/s on the
            # v5e train step (the concat and its backward split vanish).
            # The pooled part enters as a single pixel: projection of a
            # broadcast is the broadcast of the projection, so its slice
            # of the matmul runs on [B,1,1,256] and broadcast-adds into
            # the sum; the HxW pooled tensor never exists.  Both module
            # types declare the identical conv/kernel + bn variable tree,
            # so train and eval share parameters.
            branches.append(pooled)
            y = ConcatConvBN(self.out_channels, 1, name="project", **kw)(
                branches, train
            )
        else:
            # Forward-only programs schedule ONE 1280-deep projection
            # matmul better than five partial ones (measured -52 tiles/s
            # from splitting at eval), so inference keeps the reference's
            # broadcast + concat + single 1x1 form (a broadcast instead of
            # the reference's 1x1 bilinear upsample — same values, no
            # gather).
            pooled = jnp.broadcast_to(
                pooled, (x.shape[0], x.shape[1], x.shape[2], self.out_channels)
            )
            branches.append(pooled)
            y = jnp.concatenate(branches, axis=-1)  # 5*256 = 1280ch
            y = ConvBN(self.out_channels, 1, name="project", **kw)(y, train)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class DeepLabHeadV3Plus(nn.Module):
    """V3+ decoder head (reference _deeplab.py:33-69)."""

    num_classes: int
    atrous_rates: Sequence[int]
    separable: bool = False
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: dict, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        Conv3 = _conv3x3(self.separable)

        low = ConvBN(48, 1, name="project", **kw)(features["low_level"], train)
        out = ASPP(
            self.atrous_rates, separable=self.separable, name="aspp", **kw
        )(features["out"], train)
        out = resize_bilinear(out, (low.shape[1], low.shape[2]))
        if self.separable:
            # depthwise convs need the materialized concat
            x = jnp.concatenate([low, out.astype(low.dtype)], axis=-1)  # 304ch
            x = Conv3(256, 3, name="cls0", **kw)(x, train)
        else:
            # conv over a channel concat == sum of per-part convs with the
            # weight sliced in-graph; the 304-ch concat tensor (reference
            # _deeplab.py:58-61) never materializes — XLA fuses gathers
            # into conv inputs but not concatenates (profiled as 0.25 ms
            # of data formatting per eval step at 8x512x512).
            x = ConcatConvBN(256, 3, name="cls0", **kw)(
                [low, out.astype(low.dtype)], train
            )
        x = Conv3(256, 3, name="cls1", **kw)(x, train)
        x = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cls_out",
        )(x)
        return x


class DeepLabHead(nn.Module):
    """Plain V3 head: ASPP -> 3x3 -> 1x1 (reference _deeplab.py:71-93)."""

    num_classes: int
    atrous_rates: Sequence[int]
    separable: bool = False
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: dict, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        Conv3 = _conv3x3(self.separable)
        x = ASPP(
            self.atrous_rates, separable=self.separable, name="aspp", **kw
        )(features["out"], train)
        x = Conv3(256, 3, name="cls0", **kw)(x, train)
        x = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cls_out",
        )(x)
        return x


class DeepLabV3Model(nn.Module):
    """backbone -> head -> full-resolution logits (reference network/utils.py:16-25).

    The reference's Quant/DeQuantStubs (network/utils.py:19,24) are torch-int8
    artifacts with no TPU meaning; quantized serving lives in
    ``iswm_tpu.infer.quantization`` instead.
    """

    backbone: nn.Module
    head: nn.Module
    # None: keep the compute dtype (bf16) — the full-resolution logits are
    # the widest tensor in the network and casting them to f32 costs pure
    # HBM bandwidth; every consumer (loss, softmax, argmax) does its math
    # in f32 internally anyway.  Set jnp.float32 for f32-out parity tests.
    logits_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        input_hw = (x.shape[1], x.shape[2])
        features = self.backbone(x, train)
        logits = self.head(features, train)
        logits = resize_bilinear(logits, input_hw)
        if self.logits_dtype is not None:
            logits = logits.astype(self.logits_dtype)
        return logits
