"""Shared flax building blocks for the model zoo.

Conventions (TPU-native, NOT a torch port):
  - NHWC activations, HWIO kernels — XLA's preferred TPU layout.
  - Explicit symmetric padding reproducing torch Conv2d geometry so that
    reference checkpoints import exactly (torch pads (k//2)*d on both sides;
    XLA 'SAME' pads asymmetrically for even sizes under stride 2).
  - compute dtype bf16 / params f32 by default (MXU-friendly).
  - BatchNorm batch stats reduce over (N, H, W); under a sharded ``jit`` the
    batch-axis reduction lowers to an ICI all-reduce automatically, giving
    cross-replica synced BN — stronger than the reference's per-GPU BN
    (nn.DataParallel, reference train.py:970).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Torch kaiming_normal_ default: gain^2=2, fan_in, untruncated normal
# (reference _deeplab.py:63-69 applies it to every head conv).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_conv_padding(kernel_size: int, dilation: int = 1) -> Tuple[int, int]:
    """Symmetric per-side padding torch uses: (k//2)*d for odd k."""
    pad = (kernel_size // 2) * dilation
    return (pad, pad)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + optional ReLU — the reference's
    ubiquitous trio (e.g. _deeplab.py:36-40,121-128)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    use_relu: bool = True
    padding: Optional[Sequence[Tuple[int, int]]] = None  # default: torch geometry
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = [torch_conv_padding(self.kernel_size, self.dilation)] * 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SeparableConvBN(nn.Module):
    """Atrous separable conv: depthwise(k, dilation) + pointwise 1x1, then
    BN(+ReLU).  Mirrors AtrousSeparableConvolution (reference
    _deeplab.py:95-119) but is actually reachable from the factory here."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        pad = [torch_conv_padding(self.kernel_size, self.dilation)] * 2
        x = nn.Conv(
            in_ch,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=in_ch,
            use_bias=False,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def max_pool_torch(x: jax.Array, window: int, strides: int, padding: int) -> jax.Array:
    """Torch-geometry max pool (pads with -inf symmetrically)."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1) equivalent: NHWC -> N11C."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
