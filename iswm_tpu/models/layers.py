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

import dataclasses
import functools

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Torch kaiming_normal_ default: gain^2=2, fan_in, untruncated normal
# (reference _deeplab.py:63-69 applies it to every head conv).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Per-model quantized-execution routing, captured at module
    CONSTRUCTION.

    ``build_model`` derives one from ``ModelConfig`` and threads it
    through every backbone/head module down to the conv layers — there is
    no process-global state, so two differently-configured models coexist
    and retrace independently in one process (the round-3 global gates
    were a "last build wins" footgun).  Frozen + hashable so it is a
    legal flax module field and participates in jit cache keys.

    int8_min_channels — minimum INPUT channel count for int8-forward
        training convs (QAT on the 2x-rate int8 MXU path); 0 = off.
        HBM-bound narrow layers lose from the extra quantize passes, so a
        higher gate routes only MXU-bound convs (sweep in BASELINE.md).
    int8_scale_mode — "dynamic": per-step absmax of the current tensor
        (two passes: the scale reduction completes before the quantize
        divide); "delayed": quantize with the running amax carried in the
        model's "quant" collection (fp8-style, one fusable pass); falls
        back to dynamic when the collection isn't provided.
    int8_bwd — dgrad/wgrad on the int8 MXU path too (quantized
        cotangents + int8 activation residuals; the measured train-side
        win, BASELINE.md "int8 fwd+bwd TRAINING").
    int8_route — "gate": route every eligible conv above the channel
        gate; "cost": per-site roofline cost model (ops/int8_train.
        int8_cost_route) that weighs each conv's MXU time saved against
        its quantize-pass HBM cost — the channel gate then only sets the
        eligibility floor.  The gate sweep showed the cost structure is
        per-layer (narrow 1x1s lose at any gate that admits their wide
        3x3 siblings), which is exactly what a scalar threshold cannot
        express.
    int8_cost_bytes — incremental HBM bytes/element the cost model
        charges one dynamic quantize pass (absmax + divide); the delayed
        mode is charged 1/3 of it (single fused pass).  Tunable for
        sweeps (scripts/int8_train_bench.sh).
    grouped_blockdiag_max — execute grouped convs (resnext 3x3s) whose
        INPUT channels are <= this as ONE dense conv with a
        block-diagonal kernel: XLA's grouped lowering runs at 1.3-12
        TFLOP/s on v5e vs 130-190 dense, so G x the MACs at the dense
        rate wins on narrow layers (-29% measured on the resnext50
        layer1 conv2 shape; +40% i.e. a LOSS at layer4's 1024 channels —
        scripts/grouped_conv_bench.py).  0 = off.  Parameters keep
        nn.Conv's grouped (k,k,Cin/G,Cout) layout either way.
    """

    int8_min_channels: int = 0
    int8_scale_mode: str = "dynamic"
    int8_bwd: bool = False
    int8_route: str = "gate"
    int8_cost_bytes: float = 3.0
    grouped_blockdiag_max: int = 0

    def __post_init__(self):
        if self.int8_scale_mode not in ("dynamic", "delayed"):
            raise ValueError(f"int8_scale_mode {self.int8_scale_mode!r}")
        if self.int8_route not in ("gate", "cost"):
            raise ValueError(f"int8_route {self.int8_route!r}")

    @property
    def int8(self) -> bool:
        return self.int8_min_channels > 0

    def conv_routing(
        self, cin: int, cout: int, k: int, stride: int
    ) -> Tuple[bool, bool]:
        """(int8_fwd, int8_bwd) decision for one conv site.

        "gate" mode routes fwd (and bwd if requested) whenever
        ``cin >= int8_min_channels``; "cost" mode additionally applies the
        per-site roofline model, with the channel gate as a floor.
        (Dilation does not enter the cost model: a dilated conv has the
        same MACs/value and quantize bytes as its dense-k sibling.)

        "cost" assumes delayed-mode sites actually execute the fused
        single-pass quantize.  ConvBN falls back to DYNAMIC quantization
        when the "quant" collection is absent (bare eval apply), where the
        model then under-charges those sites by 3x — an eval-only perf-
        model mismatch, no numerics impact; training applies always carry
        the collection.
        """
        if not self.int8 or cin < self.int8_min_channels:
            return False, False
        if self.int8_route == "gate":
            return True, self.int8_bwd
        from ..ops.int8_train import int8_cost_route

        return int8_cost_route(
            cin, cout, k, stride,
            delayed=self.int8_scale_mode == "delayed",
            want_bwd=self.int8_bwd,
            quant_bytes=self.int8_cost_bytes,
        )


QUANT_OFF = QuantSpec()


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
    # Quantized-execution routing (int8 QAT fwd/bwd + grouped-as-blockdiag),
    # threaded from ModelConfig by build_model; captured per-module at
    # construction, so differently-configured models coexist in-process.
    quant: QuantSpec = QUANT_OFF

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = [torch_conv_padding(self.kernel_size, self.dilation)] * 2
        int8_fwd, int8_bwd = False, False
        if self.quant.int8 and self.groups == 1 and self.dilation < 6:
            # (the valid-tap ShiftedDilatedConv branch handles dilation>=6)
            int8_fwd, int8_bwd = self.quant.conv_routing(
                x.shape[-1], self.features, self.kernel_size, self.strides,
            )
        if int8_fwd:
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
            delayed = self.quant.int8_scale_mode == "delayed" and (
                self.is_initializing()
                or self.has_variable("quant", "x_amax")
                or self.is_mutable_collection("quant")
            )
            if delayed:
                amax = self.variable(
                    "quant", "x_amax", lambda: jnp.zeros((), jnp.float32)
                )
                fn = int8_conv_fullq_static if int8_bwd else int8_conv_static_amax
                x, new_amax = fn(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    amax.value, *geometry,
                )
                if self.is_mutable_collection("quant"):
                    amax.value = new_amax
            elif int8_bwd:
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
                quant=self.quant,
                name="conv",
            )(x)
            return self._bn_relu(x, train)
        if (
            self.groups > 1
            and 0 < x.shape[-1] <= self.quant.grouped_blockdiag_max
            # the dense re-expression burns G x the MACs; exclude
            # depthwise-style groupings (cg < 4, e.g. MobileNet's cg=1)
            # where G equals the channel count and no grouped-vs-dense
            # rate gap can repay it — only resnext-style cg>=4 measured
            and x.shape[-1] // self.groups >= 4
        ):
            # same math as the grouped conv, executed as one dense conv
            # with a block-diagonal kernel (QuantSpec.grouped_blockdiag_max);
            # parameter shape/name match nn.Conv's grouped layout exactly.
            # A dedicated module so the int8 serving interceptor can target
            # it (infer/quantization.py routes it like any dense conv).
            x = BlockDiagConv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                dilation=self.dilation,
                groups=self.groups,
                padding=tuple(tuple(p) for p in pad),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
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


class BlockDiagConv(nn.Module):
    """Grouped conv executed as ONE dense conv with a block-diagonal kernel.

    XLA's grouped-conv lowering runs at 1.3-12 TFLOP/s on v5e while dense
    convs in the same program hit 130-190 (logs/profile/
    attribution_resnext.txt); burning G x the MACs at the dense rate wins
    where channels are narrow (scripts/grouped_conv_bench.py).  The
    parameter keeps nn.Conv's grouped (k,k,Cin/G,Cout) layout under the
    canonical ``kernel`` name, so checkpoints and torch import/export
    (reference network/backbone/resnet.py:78-120 grouped Bottleneck) are
    unaffected; the in-graph scatter to the dense kernel is free at
    trace time (XLA constant-folds the zero blocks' layout).

    A dedicated module (rather than inline in ConvBN) so the int8 serving
    interceptor can recognize and route it: the block-diagonal dense conv
    is int8-exact under per-O weight scales because the off-block zeros
    quantize to exactly 0 (infer/quantization.py).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1))
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def expand_kernel(self, kernel: jax.Array, cin: int) -> jax.Array:
        """Scatter the grouped (k,k,Cin/G,Cout) kernel into the dense
        block-diagonal (k,k,Cin,Cout) kernel (off-block entries zero)."""
        k = self.kernel_size
        cg, og = cin // self.groups, self.features // self.groups
        dense = jnp.zeros((k, k, cin, self.features), kernel.dtype)
        for gi in range(self.groups):
            dense = jax.lax.dynamic_update_slice(
                dense,
                jax.lax.slice_in_dim(kernel, gi * og, (gi + 1) * og, axis=3),
                (0, 0, gi * cg, gi * og),
            )
        return dense

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            kaiming_normal,
            (self.kernel_size, self.kernel_size, cin // self.groups, self.features),
            self.param_dtype,
        )
        dense = self.expand_kernel(kernel, cin)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense.astype(self.dtype),
            (self.strides, self.strides),
            tuple(tuple(p) for p in self.padding),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


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
    quant: QuantSpec = QUANT_OFF

    @nn.compact
    def __call__(self, parts, train: bool = False) -> jax.Array:
        cin = sum(p.shape[-1] for p in parts)
        kernel = ConvVars(
            self.features, self.kernel_size, self.param_dtype, name="conv"
        )(cin)
        pad = torch_conv_padding(self.kernel_size)
        acc = None
        off = 0
        for i, p in enumerate(parts):
            c = p.shape[-1]
            kp = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            part_fwd, part_bwd = self.quant.conv_routing(
                c, self.features, self.kernel_size, 1
            )
            if part_fwd:
                # QAT routing, per part (each part is its own conv here,
                # so the ConvBN int8 path applies part-wise; a narrow
                # part — cls0's 48-ch low-level projection — stays dense
                # under the same channel gate)
                t = self._int8_part_conv(i, p, kp, pad, part_bwd)
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

    def _int8_part_conv(self, i, p, kp, pad, bwd):
        """One part's conv on the QAT int8 path (mirrors ConvBN's routing:
        dynamic / delayed fwd scales × bf16 / int8 backward)."""
        from ..ops.int8_train import (
            int8_conv_fullq, int8_conv_fullq_static, int8_conv_st,
            int8_conv_static_amax,
        )

        geometry = ((1, 1), (tuple(pad), tuple(pad)), (1, 1))
        name = f"x_amax_p{i}"
        delayed = self.quant.int8_scale_mode == "delayed" and (
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


def qat_pointwise_conv(x, features, dtype, param_dtype, bwd=False,
                       name="pointwise"):
    """1×1 unpadded conv on the QAT int8 path, variable-tree-identical to
    ``nn.Conv(use_bias=False, name=name)``.  Call from a compact module
    ONLY when its QuantSpec routing holds — the pointwise halves of
    separable convs are ~all of their FLOPs (xception int8 serving
    measured +41%, BASELINE.md).  Dynamic scales only; the delayed-amax
    machinery stays in ConvBN where the flagship trains."""
    from ..ops.int8_train import int8_conv_fullq, int8_conv_st

    kernel = ConvVars(features, 1, param_dtype, name=name)(x.shape[-1])
    geometry = ((1, 1), ((0, 0), (0, 0)), (1, 1))
    fn = int8_conv_fullq if bwd else int8_conv_st
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
    quant: QuantSpec = QUANT_OFF

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
        pw_fwd, pw_bwd = self.quant.conv_routing(x.shape[-1], self.features, 1, 1)
        if pw_fwd:
            x = qat_pointwise_conv(
                x, self.features, self.dtype, self.param_dtype, bwd=pw_bwd
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
    quant: QuantSpec = QUANT_OFF

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", kaiming_normal, (3, 3, c, self.features), self.param_dtype
        )
        tap_fwd, tap_bwd = self.quant.conv_routing(c, self.features, 3, 1)
        if tap_fwd:
            # QAT: tap dots run int8 (all ASPP branches quantize the SAME
            # input, so XLA CSEs the dynamic quantize across them — no
            # delayed-scale variant needed here)
            from ..ops.int8_train import int8_dilated_conv3x3

            return int8_dilated_conv3x3(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.dilation, tap_bwd,
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
