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

import functools

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Torch kaiming_normal_ default: gain^2=2, fan_in, untruncated normal
# (reference _deeplab.py:63-69 applies it to every head conv).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


# Experimental int8-forward training (QAT), consulted by ConvBN at trace
# time.  Process-wide because ConvBN is instantiated at ~26 sites across
# the zoo; build_model sets it from ModelConfig.int8_training on every
# build (last build wins — do not interleave int8 and bf16 model builds
# that retrace later in one process).  The value is the minimum input
# channel count to route (0 = off): HBM-bound narrow layers lose from the
# extra absmax+quantize passes, so a higher gate routes only the
# MXU-bound convs (measured sweep in BASELINE.md).
_INT8_TRAINING = [0]


def set_int8_training(min_channels) -> int:
    """Set the process-wide int8-forward-conv gate; returns the old value.

    ``min_channels``: 0/False = off, True = 64 (default gate), or an
    explicit minimum input-channel count.
    """
    prev = _INT8_TRAINING[0]
    if min_channels is True:
        min_channels = 64
    _INT8_TRAINING[0] = int(min_channels or 0)
    return prev


def int8_training_min_channels() -> int:
    return _INT8_TRAINING[0]


def int8_training_enabled() -> bool:
    return _INT8_TRAINING[0] > 0


# Activation-scale mode for the int8-forward convs (ModelConfig.
# int8_scale_mode, wired by build_model like the gate above):
#   "dynamic" — per-step absmax of the current tensor (two passes: the
#               scale reduction must complete before the quantize divide).
#   "delayed" — quantize with the running amax carried in the model's
#               "quant" collection (fp8-style delayed scaling: one fusable
#               pass; the current absmax only feeds the NEXT step's scale).
#               Falls back to dynamic when the collection isn't provided
#               (e.g. a bare eval apply with only params/batch_stats).
_INT8_SCALE_MODE = ["dynamic"]


def set_int8_scale_mode(mode: str) -> str:
    if mode not in ("dynamic", "delayed"):
        raise ValueError(f"int8_scale_mode {mode!r}")
    prev = _INT8_SCALE_MODE[0]
    _INT8_SCALE_MODE[0] = mode
    return prev


def int8_scale_mode() -> str:
    return _INT8_SCALE_MODE[0]


# int8 BACKWARD (dgrad/wgrad on the int8 MXU path too) for the gated
# convs — ModelConfig.int8_training_bwd, wired by build_model:
_INT8_BWD = [False]


def set_int8_bwd(enabled: bool) -> bool:
    prev = _INT8_BWD[0]
    _INT8_BWD[0] = bool(enabled)
    return prev


def int8_bwd_enabled() -> bool:
    return _INT8_BWD[0]


# Grouped convs re-expressed as one DENSE conv with a block-diagonal
# kernel (ModelConfig.grouped_blockdiag, wired by build_model).  XLA's
# native grouped-conv lowering runs at 1.3-12 TFLOP/s on v5e while dense
# convs in the same program hit 130-190 (logs/profile/
# attribution_resnext.txt); burning G x the MACs at the dense rate wins
# where channels are narrow — measured -29% op time on the resnext50
# layer1 conv2 shape, +40% (a loss) at layer4's 1024 channels
# (scripts/grouped_conv_bench.py).  The gate is therefore a MAXIMUM
# input-channel count; 0 = off (the default — opt in per measurement).
# The parameter keeps nn.Conv's grouped shape (k,k,Cin/G,Cout) so
# checkpoints and torch import/export are unaffected.
_GROUPED_BLOCKDIAG = [0]


def set_grouped_blockdiag(max_channels) -> int:
    """Set the process-wide grouped-as-blockdiag gate; returns the old
    value.  ``max_channels``: 0/False = off, True = 256, or an explicit
    maximum input-channel count."""
    prev = _GROUPED_BLOCKDIAG[0]
    if max_channels is True:
        max_channels = 256
    _GROUPED_BLOCKDIAG[0] = int(max_channels or 0)
    return prev


def grouped_blockdiag_max() -> int:
    return _GROUPED_BLOCKDIAG[0]


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
    # Experimental QAT: forward conv executes int8 on the MXU (2x rate),
    # backward stays dense in compute dtype (ops/int8_train.int8_conv_st).
    # Deliberate numerics change — see ModelConfig.int8_training; also
    # enabled process-wide by set_int8_training (build_model wires it).
    int8_fwd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = [torch_conv_padding(self.kernel_size, self.dilation)] * 2
        min_ch = 64 if self.int8_fwd else int8_training_min_channels()
        if (
            (self.int8_fwd or int8_training_enabled())
            and self.groups == 1
            and x.shape[-1] >= min_ch
            and self.dilation < 6  # the valid-tap branch handles >= 6
        ):
            from ..ops.int8_train import (
                int8_conv_fullq, int8_conv_fullq_static, int8_conv_st,
                int8_conv_static_amax,
            )

            kernel = ConvVars(
                self.features, self.kernel_size, self.param_dtype, name="conv"
            )(x.shape[-1])
            geometry = (
                (self.strides, self.strides),
                tuple(tuple(p) for p in pad),
                (self.dilation, self.dilation),
            )
            bwd = int8_bwd_enabled()
            delayed = int8_scale_mode() == "delayed" and (
                self.is_initializing()
                or self.has_variable("quant", "x_amax")
                or self.is_mutable_collection("quant")
            )
            if delayed:
                amax = self.variable(
                    "quant", "x_amax", lambda: jnp.zeros((), jnp.float32)
                )
                fn = int8_conv_fullq_static if bwd else int8_conv_static_amax
                x, new_amax = fn(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    amax.value, *geometry,
                )
                if self.is_mutable_collection("quant"):
                    amax.value = new_amax
            elif bwd:
                # fwd AND bwd on the int8 MXU path with dynamic scales
                # (the cotangent quantize is dynamic in both modes — a
                # gradient has no slowly-drifting scale to carry)
                x = int8_conv_fullq(
                    x.astype(self.dtype), kernel.astype(self.dtype), *geometry
                )
            else:
                x = int8_conv_st(
                    x.astype(self.dtype), kernel.astype(self.dtype), *geometry
                )
            return self._bn_relu(x, train)
        if (
            self.kernel_size == 3
            and self.dilation >= 6
            and self.strides == 1
            and self.groups == 1
            and self.padding is None
        ):
            # Large-rate atrous conv: valid-tap shifted matmuls beat the
            # padded lax.conv on TPU (see ShiftedDilatedConv).
            x = ShiftedDilatedConv(
                self.features,
                self.dilation,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
            return self._bn_relu(x, train)
        if self.groups > 1 and 0 < x.shape[-1] <= grouped_blockdiag_max():
            # same math as the grouped conv, executed as one dense conv
            # with a block-diagonal kernel (see set_grouped_blockdiag);
            # parameter shape/name match nn.Conv's grouped layout exactly
            cin = x.shape[-1]
            cg, og = cin // self.groups, self.features // self.groups
            kernel = ConvVars(
                self.features, self.kernel_size, self.param_dtype,
                name="conv",
            )(cg)
            k = self.kernel_size
            dense = jnp.zeros(
                (k, k, cin, self.features), kernel.dtype
            )
            for gi in range(self.groups):
                dense = jax.lax.dynamic_update_slice(
                    dense,
                    jax.lax.slice_in_dim(kernel, gi * og, (gi + 1) * og, axis=3),
                    (0, 0, gi * cg, gi * og),
                )
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                dense.astype(self.dtype),
                (self.strides, self.strides),
                tuple(tuple(p) for p in pad),
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return self._bn_relu(x, train)
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
        return self._bn_relu(x, train)

    def _bn_relu(self, x: jax.Array, train: bool) -> jax.Array:
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


class ConcatConvBN(nn.Module):
    """ConvBN over the channel-concatenation of several inputs, computed as
    a SUM of per-part convs with the kernel sliced in-graph:

        conv(cat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])

    XLA folds gathers into a conv's input fusion but materializes
    concatenates (measured: the decoder's 304-ch concat costs ~0.25 ms of
    data formatting per 8x512x512 eval step, reference _deeplab.py:58-61);
    the split form skips that tensor entirely, the adds fuse into the conv
    epilogue, and each part's gradient flows straight to its producer with
    no concat/split pair in the backward.  The parameter keeps the
    canonical concatenated [k,k,sum(C),F] ``kernel`` under ``conv`` and a
    standard ``bn``, so the variable tree is identical to ConvBN and
    checkpoints interchange freely.  Summation order differs from the
    single-conv form, so bf16 outputs can differ in the last bit.
    """

    features: int
    kernel_size: int = 3
    use_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, parts, train: bool = False) -> jax.Array:
        cin = sum(p.shape[-1] for p in parts)
        kernel = ConvVars(
            self.features, self.kernel_size, self.param_dtype, name="conv"
        )(cin)
        pad = torch_conv_padding(self.kernel_size)
        min_ch = int8_training_min_channels()
        qat = int8_training_enabled()
        acc = None
        off = 0
        for i, p in enumerate(parts):
            c = p.shape[-1]
            kp = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            if qat and c >= min_ch:
                # QAT routing, per part (each part is its own conv here,
                # so the ConvBN int8 path applies part-wise; a narrow
                # part — cls0's 48-ch low-level projection — stays dense
                # under the same channel gate)
                t = self._int8_part_conv(i, p, kp, pad)
            else:
                t = jax.lax.conv_general_dilated(
                    p.astype(self.dtype),
                    kp.astype(self.dtype),
                    (1, 1),
                    [pad, pad],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            acc = t if acc is None else acc + t
            off += c
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(acc)
        if self.use_relu:
            x = nn.relu(x)
        return x

    def _int8_part_conv(self, i, p, kp, pad):
        """One part's conv on the QAT int8 path (mirrors ConvBN's routing:
        dynamic / delayed fwd scales × bf16 / int8 backward)."""
        from ..ops.int8_train import (
            int8_conv_fullq, int8_conv_fullq_static, int8_conv_st,
            int8_conv_static_amax,
        )

        geometry = ((1, 1), (tuple(pad), tuple(pad)), (1, 1))
        bwd = int8_bwd_enabled()
        name = f"x_amax_p{i}"
        delayed = int8_scale_mode() == "delayed" and (
            self.is_initializing()
            or self.has_variable("quant", name)
            or self.is_mutable_collection("quant")
        )
        if delayed:
            amax = self.variable(
                "quant", name, lambda: jnp.zeros((), jnp.float32)
            )
            fn = int8_conv_fullq_static if bwd else int8_conv_static_amax
            t, new_amax = fn(
                p.astype(self.dtype), kp.astype(self.dtype),
                amax.value, *geometry,
            )
            if self.is_mutable_collection("quant"):
                amax.value = new_amax
            return t
        if bwd:
            return int8_conv_fullq(
                p.astype(self.dtype), kp.astype(self.dtype), *geometry
            )
        return int8_conv_st(
            p.astype(self.dtype), kp.astype(self.dtype), *geometry
        )


def qat_pointwise_conv(x, features, dtype, param_dtype, name="pointwise"):
    """1×1 unpadded conv on the QAT int8 path, variable-tree-identical to
    ``nn.Conv(use_bias=False, name=name)``.  Call from a compact module
    ONLY when the int8 gate holds (int8_training_enabled() and the channel
    gate) — the pointwise halves of separable convs are ~all of their
    FLOPs (xception int8 serving measured +41%, BASELINE.md).  Dynamic
    scales only; the delayed-amax machinery stays in ConvBN where the
    flagship trains."""
    from ..ops.int8_train import int8_conv_fullq, int8_conv_st

    kernel = ConvVars(features, 1, param_dtype, name=name)(x.shape[-1])
    geometry = ((1, 1), ((0, 0), (0, 0)), (1, 1))
    fn = int8_conv_fullq if int8_bwd_enabled() else int8_conv_st
    return fn(x.astype(dtype), kernel.astype(dtype), *geometry)


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
        if int8_training_enabled() and x.shape[-1] >= int8_training_min_channels():
            x = qat_pointwise_conv(
                x, self.features, self.dtype, self.param_dtype
            )
        else:
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


def _shifted_dilated_taps(x: jax.Array, kernel: jax.Array, d: int) -> jax.Array:
    """sum over valid taps of shift(x @ W_tap); see ShiftedDilatedConv."""
    b, h, w, c = x.shape
    terms = []
    for i, dy in enumerate((-d, 0, d)):
        for j, dx in enumerate((-d, 0, d)):
            ys, ye = max(0, -dy), h - max(0, dy)
            xs, xe = max(0, -dx), w - max(0, dx)
            if ye <= ys or xe <= xs:
                continue  # tap entirely in padding
            src = jax.lax.slice(x, (0, ys + dy, xs + dx, 0), (b, ye + dy, xe + dx, c))
            t = jax.lax.dot_general(src, kernel[i, j], (((3,), (0,)), ((), ())))
            t = jax.lax.pad(
                t,
                jnp.zeros((), t.dtype),
                ((0, 0, 0), (ys, h - ye, 0), (xs, w - xe, 0), (0, 0, 0)),
            )
            terms.append(t)
    return sum(terms)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dilated_conv3x3(x: jax.Array, kernel: jax.Array, d: int) -> jax.Array:
    """3x3 atrous conv, padding=d, stride 1, as valid-tap shifted matmuls.

    Custom VJP: the input gradient of the tap decomposition would be 9
    full-size padded accumulations in the wide C_in domain (profiled at
    ~39 TFLOP/s); XLA's native transposed conv does that accumulation in
    one pass, so dgrad uses lax.conv with a rotated kernel while wgrad
    keeps the valid-tap matmuls (~160 TFLOP/s).
    """
    return _shifted_dilated_taps(x, kernel, d)


def _dilated_fwd(x, kernel, d):
    return _shifted_dilated_taps(x, kernel, d), (x, kernel)


def _dilated_bwd(d, res, g):
    x, kernel = res
    b, h, w, c = x.shape
    # dgrad: dx = conv(g, rot180(W)^T) with the same dilation.
    k_rot = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, k_rot, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    # wgrad per valid tap: dW[i,j] = src_tap^T @ g_valid.
    dk_taps = []
    for i, dy in enumerate((-d, 0, d)):
        row = []
        for j, dx_ in enumerate((-d, 0, d)):
            ys, ye = max(0, -dy), h - max(0, dy)
            xs, xe = max(0, -dx_), w - max(0, dx_)
            if ye <= ys or xe <= xs:
                row.append(jnp.zeros((c, kernel.shape[-1]), kernel.dtype))
                continue
            src = jax.lax.slice(
                x, (0, ys + dy, xs + dx_, 0), (b, ye + dy, xe + dx_, c)
            )
            gv = jax.lax.slice(g, (0, ys, xs, 0), (b, ye, xe, g.shape[-1]))
            dw = jax.lax.dot_general(
                src, gv, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=kernel.dtype,
            )
            row.append(dw)
        dk_taps.append(jnp.stack(row))
    dk = jnp.stack(dk_taps)
    return dx, dk


dilated_conv3x3.defvjp(_dilated_fwd, _dilated_bwd)


class ShiftedDilatedConv(nn.Module):
    """3x3 atrous conv computed as <=9 valid-region shifted matmuls.

    At the reference's ASPP rates (6/12/18 on an OS=16 feature map of
    32x32, reference _deeplab.py:161-166) the dilation is comparable to
    the map extent, so most taps land mostly in padding: XLA's conv
    computes all 9 taps over the padded extent anyway (profiled at 69-128
    TFLOP/s, logs/profile/attribution.txt), while only ~39% of the tap
    area is valid at d=18.  Computing each tap as a dot_general over its
    valid input window skips the padding FLOPs entirely and keeps every
    matmul MXU-shaped (rows = B*valid_h*valid_w, K = C_in, N = C_out).

    Math matches Conv2d(3,3,dilation=d,padding=d,bias=False) exactly (the
    skipped taps multiply zeros); summation order differs, so bf16 outputs
    can differ in the last bit vs the lax.conv path.

    The parameter is the canonical [3,3,C,F] ``kernel`` so checkpoint
    import and initialization are identical to nn.Conv.
    """

    features: int
    dilation: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", kaiming_normal, (3, 3, c, self.features), self.param_dtype
        )
        if int8_training_enabled() and c >= int8_training_min_channels():
            # QAT: tap dots run int8 (all ASPP branches quantize the SAME
            # input, so XLA CSEs the dynamic quantize across them — no
            # delayed-scale variant needed here)
            from ..ops.int8_train import int8_dilated_conv3x3

            return int8_dilated_conv3x3(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.dilation, int8_bwd_enabled(),
            )
        return dilated_conv3x3(
            x.astype(self.dtype), kernel.astype(self.dtype), self.dilation
        )


def pack_stem_kernel(kernel: jax.Array, k: int) -> jax.Array:
    """Repack a canonical [k,k,C,F] stride-2 kernel for the space-to-depth
    packed conv: [ku,ku,4C,F] with ku=(k+2)//2 (see PackedStrided2Conv)."""
    ku = (k + 2) // 2
    c, features = kernel.shape[2], kernel.shape[3]
    front = (k // 2) % 2
    kk = jnp.pad(
        kernel,
        ((front, 2 * ku - front - k), (front, 2 * ku - front - k), (0, 0), (0, 0)),
    )
    kk = kk.reshape(ku, 2, ku, 2, c, features)
    return kk.transpose(0, 2, 1, 3, 4, 5).reshape(ku, ku, 4 * c, features)


def pack_stem_input(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,(2,2,C)] space-to-depth, via parity TAKES:
    XLA lowers the gathers straight into the consumer conv's input fusion,
    while the reshape+transpose form materializes two full data-formatting
    passes (measured on v5e: pack+conv 1.35 ms vs 1.96 ms at 8x512x512,
    identical results)."""
    b, h, w, c = x.shape
    re = jnp.arange(0, h, 2)
    ro = jnp.arange(1, h, 2)
    ce_ = jnp.arange(0, w, 2)
    co = jnp.arange(1, w, 2)
    xe = jnp.take(x, re, axis=1)
    xo = jnp.take(x, ro, axis=1)
    return jnp.concatenate(
        [
            jnp.take(xe, ce_, axis=2),
            jnp.take(xe, co, axis=2),
            jnp.take(xo, ce_, axis=2),
            jnp.take(xo, co, axis=2),
        ],
        axis=-1,
    )


class PackedStrided2Conv(nn.Module):
    """Odd-k, stride-2 conv evaluated as a stride-1 conv on 2x2
    space-to-depth packed input (the MLPerf-ResNet stem trick).

    Motivation: a stride-2 conv on a 3-channel image leaves the MXU's
    128-deep contraction almost empty — profiled at 7 TFLOP/s on v5e for
    the ResNet stem (logs/profile/attribution.txt).  Packing 2x2 pixels
    into channels quadruples the contraction depth and halves the spatial
    extent; with the kernel repacked to match, the math is bit-identical
    (the extra taps multiply explicit zeros).

    Derivation (per spatial axis, k odd, pad p=k//2, stride 2):
      out[i] = sum_ky W[ky] * x[2i - p + ky].  Writing x[2u+d] for the
      packed input (d in {0,1}) gives ky = 2(u-i) + d + p, so output i
      reads packed taps u-i in [-(p+1)//2, ...], a K=(k+2)//2 tap stride-1
      conv with left pad (p+1)//2 and the kernel repacked via
      ky = 2*ku + d - 1 (after one leading zero row/col of padding).

    The parameter keeps the canonical [k,k,C,F] shape under the name
    ``kernel`` so torch checkpoint import (compat/torch_import.py) and
    initialization are unchanged from a plain nn.Conv.
    """

    features: int
    kernel_size: int = 7
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        assert k % 2 == 1, "packed stem requires odd kernel"
        c = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, c, self.features), self.param_dtype
        )

        b, h, w, _ = x.shape
        if h % 2 or w % 2:  # odd extents can't pack; fall back to plain conv
            pad = torch_conv_padding(k)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2),
                [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ku = (k + 2) // 2  # packed tap count per axis
        pad_l = (k // 2 + 1) // 2
        pad_r = ku - 1 - pad_l
        kk = pack_stem_kernel(kernel, k)
        xp = pack_stem_input(x)
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype),
            kk.astype(self.dtype),
            (1, 1),
            [(pad_l, pad_r), (pad_l, pad_r)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PackedStemConvBN(nn.Module):
    """Drop-in replacement for ``ConvBN(features, k, strides=2)`` on the
    image input, using the space-to-depth packed conv.  Child module names
    (``conv``, ``bn``) and parameter shapes match ConvBN exactly."""

    features: int
    kernel_size: int = 7
    use_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = PackedStrided2Conv(
            self.features,
            self.kernel_size,
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


class ConvVars(nn.Module):
    """Declares exactly the parameters flax ``nn.Conv(use_bias=False)``
    would, without computing — for fused paths that must share a plain
    module's variable tree (used here and by models/fused_block.py)."""

    features: int
    kernel_size: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_ch: int) -> jax.Array:
        k = self.kernel_size
        return self.param(
            "kernel", kaiming_normal, (k, k, in_ch, self.features), self.param_dtype
        )


class BNVars(nn.Module):
    """Declares exactly the variables flax ``nn.BatchNorm`` would
    (params: scale/bias; batch_stats: mean/var)."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ch: int):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (ch,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (ch,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (ch,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (ch,)
        )
        return scale, bias, ra_mean, ra_var


class FusedStemPool(nn.Module):
    """PackedStemConvBN + max_pool(3,2,1) with the post-conv chain fused in
    Pallas (ops/pallas/fused_stem.py): BN stats / normalize+relu+pool
    forward, and a backward that recomputes the pool scatter in VMEM and
    contracts dz straight into the conv weight gradient.

    Parameter/variable tree is identical to
    ``PackedStemConvBN(name=...)`` followed by ``max_pool_torch(x,3,2,1)``
    (children ``conv``/``bn``), so checkpoints are interchangeable with the
    unfused path.  Pool-gradient ties are EQUAL-SPLIT (see kernel module
    docstring) — a subgradient choice that differs from XLA's
    select-and-scatter only on exact float ties.
    """

    features: int = 64
    kernel_size: int = 7
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ..ops.pallas.fused_stem import stem_fused_eval, stem_fused_train

        assert self.kernel_size == 7, (
            "FusedStemPool is specialized to the 7x7/s2 stem: the packed "
            "pads (2,1) and 4x4-tap wgrad geometry assume k=7"
        )
        c = x.shape[-1]
        kernel = ConvVars(
            self.features, self.kernel_size, self.param_dtype, name="conv"
        )(c)
        scale, bias, ra_mean, ra_var = BNVars(self.param_dtype, name="bn")(
            self.features
        )

        kk = pack_stem_kernel(kernel, self.kernel_size).astype(self.dtype)
        xp = pack_stem_input(x.astype(self.dtype))
        xp_pad = jnp.pad(xp, ((0, 0), (0, 0), (2, 1), (0, 0)))

        if train:
            p, mean, var = stem_fused_train(
                xp_pad, kk, scale, bias, self.bn_epsilon, self.interpret
            )
            if not self.is_initializing():
                m = self.bn_momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            si = jax.lax.rsqrt(ra_var.value.astype(jnp.float32) + self.bn_epsilon)
            sc = scale.astype(jnp.float32) * si
            bi = bias.astype(jnp.float32) - ra_mean.value.astype(jnp.float32) * sc
            p = stem_fused_eval(xp_pad, kk, sc, bi, interpret=self.interpret)
        return p.astype(self.dtype)


def fused_stem_eligible(x_shape, kernel_size: int = 7) -> bool:
    """The fused stem is specialized to the 7x7/s2 stem (packed pads and
    wgrad tap geometry are k=7-specific) and needs square spatial dims
    divisible by 4 (space-to-depth pack + halvable conv output)."""
    h, w = x_shape[1], x_shape[2]
    return (
        kernel_size == 7
        and h % 4 == 0
        and w % 4 == 0
        and h == w
        and h >= 8
    )


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
