"""ResNet backbones with output-stride control (dilated residual stages).

Functional NHWC re-design of the reference backbone (reference
network/backbone/resnet.py:38-348): conv1 7x7/2 -> maxpool 3x3/2 ->
layer1..layer4 with ``replace_stride_with_dilation`` semantics —
when a stage trades its stride for dilation, the stage's first block keeps
the *previous* dilation for its 3x3 conv and later blocks use the doubled
one, exactly like torchvision's ``_make_layer`` (so reference checkpoints
import weight-for-weight).

Returns a feature dict ``{'low_level': layer1_out (C=256, stride 4),
'out': layer4_out (C=2048, stride 8/16)}`` replacing the reference's
IntermediateLayerGetter (network/utils.py:28-93).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    QUANT_OFF,
    ConvBN,
    FusedStemPool,
    PackedStemConvBN,
    QuantSpec,
    fused_stem_eligible,
    max_pool_torch,
)

Dtype = Any


class BasicBlock(nn.Module):
    """Two 3x3 convs; expansion 1 (reference resnet.py:38-75)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)
        identity = x
        out = ConvBN(
            self.planes, 3, strides=self.strides, dilation=self.dilation,
            name="conv1", **kw
        )(x, train)
        out = ConvBN(self.planes, 3, dilation=self.dilation, use_relu=False,
                     name="conv2", **kw)(out, train)
        if self.downsample:
            identity = ConvBN(self.planes, 1, strides=self.strides,
                              use_relu=False, name="downsample", **kw)(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1(x4) (reference resnet.py:78-120).
    The residual add is a plain ``+`` — the reference's FloatFunctional
    (resnet.py:97,117) exists only for torch-int8 bookkeeping.

    ``groups``/``base_width`` follow torchvision's Bottleneck semantics:
    the inner width is ``int(planes * base_width / 64) * groups`` and the
    3x3 conv is grouped — resnext50_32x4d etc. (reference
    network/backbone/resnet.py:287-346 constructors).

    ``fused_mode`` selects the Pallas fused-BN training path for
    stride-1/dilation-1 blocks ("compiled" on TPU, "interpret" for CPU
    tests, "never" = plain ConvBN chain).  Both paths declare the same
    variable tree; see models/fused_block.py.
    """

    planes: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    fused_mode: str = "never"
    quant: QuantSpec = QUANT_OFF
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if (
            self.fused_mode != "never"
            and train
            and self.strides == 1
            and self.dilation == 1
            and self.groups == 1
            and self.base_width == 64
            and not self.quant.int8  # fused Pallas block is bf16-only
        ):
            from .fused_block import fused_block_eligible, fused_bottleneck_apply

            if fused_block_eligible(x.shape):
                return fused_bottleneck_apply(
                    self, x, interpret=self.fused_mode == "interpret"
                )
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
                  quant=self.quant)
        width = int(self.planes * self.base_width / 64) * self.groups
        identity = x
        out = ConvBN(width, 1, name="conv1", **kw)(x, train)
        out = ConvBN(width, 3, strides=self.strides, groups=self.groups,
                     dilation=self.dilation, name="conv2", **kw)(out, train)
        out = ConvBN(self.planes * 4, 1, use_relu=False, name="conv3", **kw)(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * 4, 1, strides=self.strides,
                              use_relu=False, name="downsample", **kw)(x, train)
        return nn.relu(out + identity)


_ARCHS = {
    # name: (block, layers, groups, base_width)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    # grouped / wide variants (reference resnet.py:287-346; same layer
    # naming, so reference checkpoints import weight-for-weight)
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), 1, 128),
}


def resnet_feature_channels(arch: str) -> Tuple[int, int]:
    """(low_level, out) channel counts."""
    block = _ARCHS[arch][0]
    return 64 * block.expansion, 512 * block.expansion


class ResNet(nn.Module):
    """Dilated ResNet backbone.

    ``replace_stride_with_dilation`` is a 3-tuple for layers 2-4; OS=8 uses
    (False, True, True), OS=16 (False, False, True) (reference
    network/modeling.py:14-19).
    """

    arch: str = "resnet50"
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    in_channels: int = 3  # recorded for checkpoint import; input must match
    fused_mode: str = "never"  # Pallas fused-BN block path (see Bottleneck)
    fused_stem: str = "never"  # Pallas fused stem tail (see FusedStemPool)
    quant: QuantSpec = QUANT_OFF  # int8 QAT + grouped-blockdiag routing
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict:
        block, layer_sizes, groups, base_width = _ARCHS[self.arch]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant)

        # 7x7/s2 stem evaluated space-to-depth packed: a stride-2 conv on a
        # 3-channel image runs at ~4% of MXU peak; packed it is a 4x4/s1
        # conv over 12 channels with identical math (see PackedStrided2Conv).
        # (the stem never int8-routes — 3->12 packed input channels are far
        # below any gate — so it takes no QuantSpec)
        stem_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_stem != "never" and fused_stem_eligible(x.shape, 7):
            # Post-conv chain (BN+relu+pool, fwd AND bwd) fused in Pallas;
            # identical parameter tree, so checkpoints interchange freely.
            x = FusedStemPool(
                64, 7, name="stem",
                interpret=self.fused_stem == "interpret", **stem_kw,
            )(x, train)
        else:
            x = PackedStemConvBN(64, 7, name="stem", **stem_kw)(x, train)
            x = max_pool_torch(x, 3, 2, 1)

        features = {}
        dilation = 1
        in_planes_matches = False  # stem out (64) != 64*expansion for Bottleneck
        for stage_idx, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layer_sizes)
        ):
            stride = 1 if stage_idx == 0 else 2
            previous_dilation = dilation
            if stage_idx > 0 and self.replace_stride_with_dilation[stage_idx - 1]:
                dilation *= stride
                stride = 1
            for block_idx in range(blocks):
                first = block_idx == 0
                needs_ds = first and (
                    stride != 1 or x.shape[-1] != planes * block.expansion
                )
                fused_kw = (
                    {
                        "fused_mode": self.fused_mode,
                        "groups": groups,
                        "base_width": base_width,
                    }
                    if block is Bottleneck
                    else {}
                )
                x = block(
                    planes=planes,
                    strides=stride if first else 1,
                    # torchvision: first block of a dilated stage uses the
                    # pre-doubling dilation; later blocks use the new one.
                    dilation=previous_dilation if first else dilation,
                    downsample=needs_ds,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                    **fused_kw,
                    **kw,
                )(x, train)
            if stage_idx == 0:
                features["low_level"] = x
        features["out"] = x
        return features
