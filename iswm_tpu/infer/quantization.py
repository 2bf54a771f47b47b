"""Quantized serving: bf16 / int8-weight variants + parity harness.

TPU-native replacement for the reference's torch-fbgemm PTQ pipeline
(reference evaluate_quantization.py:112-154) and its FP32-vs-INT8 report
(:187-354), plus the tiered logit-agreement diagnostic of
tensorrt_tools/quick_diagnostic.py:98-217.

On TPU there is no fbgemm/TensorRT engine: bf16 is the native serving
dtype, and int8 is weight-only per-output-channel symmetric quantization
(the 4x size reduction the reference's PTQ advertises,
evaluate_quantization.py:240) with on-the-fly dequant feeding the MXU.
The harness reports the same table columns: avg latency ms / model size
MB / MIoU / FIoU / FF1 and their deltas.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import StreamMetrics

# Tiers in the spirit of the reference diagnostic (quick_diagnostic.py
# verdict bands), applied at the decision level: what fraction of output
# pixels change their argmax class vs the reference variant.  Raw logit
# diffs mislead across precisions (bf16 logits differ ~1% everywhere while
# every mask pixel agrees); mask agreement is what serving actually ships.
AGREEMENT_TIERS = (
    (0.999, "excellent: masks effectively identical"),
    (0.99, "good: sub-percent mask disagreement"),
    (0.95, "warning: noticeable mask divergence — inspect calibration"),
    (0.0, "broken: masks disagree materially"),
)


def logit_diff_verdict(a: np.ndarray, b: np.ndarray) -> Tuple[float, str]:
    """(mask agreement fraction, tiered verdict) between two logit maps."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    for bound, verdict in AGREEMENT_TIERS:
        if agree >= bound:
            return agree, verdict
    return agree, AGREEMENT_TIERS[-1][1]


# ----------------------------------------------------------- int8 weights
def _is_conv_kernel(path: Tuple[str, ...], leaf: jax.Array) -> bool:
    return leaf.ndim == 4 and path[-1] == "kernel"


def quantize_params_int8(params: Any) -> Tuple[Any, Any]:
    """Per-output-channel symmetric int8 for conv kernels (HWIO -> scale per
    O).  Returns (quantized tree with int8 kernels, scales tree)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    q_leaves = []
    s_leaves = []
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if _is_conv_kernel(keys, leaf):
            w = np.asarray(leaf, np.float32)
            amax = np.max(np.abs(w), axis=(0, 1, 2), keepdims=True)
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            q_leaves.append(jnp.asarray(q))
            s_leaves.append(jnp.asarray(scale))
        else:
            q_leaves.append(leaf)
            s_leaves.append(None)
    return (
        jax.tree_util.tree_unflatten(treedef, q_leaves),
        jax.tree_util.tree_unflatten(treedef, s_leaves),
    )


def dequantize_params(q_params: Any, scales: Any, dtype=jnp.bfloat16) -> Any:
    """int8 kernels * scales -> compute dtype (on device, fused by XLA)."""

    def deq(q, s):
        if s is None:
            return q
        return (q.astype(jnp.float32) * s).astype(dtype)

    return jax.tree.map(
        deq, q_params, scales, is_leaf=lambda x: x is None or isinstance(x, jax.Array)
    )


def param_bytes(params: Any) -> int:
    return int(
        sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params))
    )


def cast_params(params: Any, dtype) -> Any:
    """Cast float params to dtype (bf16 serving variant)."""

    def cast(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, params)


# --------------------------------------------------- activation calibration
def _activation_sites(module) -> bool:
    """Quantization sites: post-BN/ReLU block outputs (the tensors fbgemm
    quantizes between fused conv blocks)."""
    from ..models.layers import ConvBN, PackedStemConvBN, SeparableConvBN

    try:
        from ..models.xception import SepConvBN

        types = (ConvBN, PackedStemConvBN, SeparableConvBN, SepConvBN)
    except Exception:  # pragma: no cover
        types = (ConvBN, PackedStemConvBN, SeparableConvBN)
    return isinstance(module, types)


def calibrate_activations(
    model, params, batch_stats, batches, max_batches: int = 25
) -> Dict[str, float]:
    """Per-site symmetric activation scales from <=25 calibration batches
    (the reference's PTQ calibration pass, evaluate_quantization.py:130-141).

    Returns {module-path: scale} with scale = absmax/127.
    """
    import flax.linen as nn

    site_vals: Dict[str, jax.Array] = {}

    def observer(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if _activation_sites(context.module) and context.method_name == "__call__":
            key = "/".join(context.module.path)
            site_vals[key] = jnp.max(jnp.abs(out.astype(jnp.float32)))
        return out

    # jitted observer pass: one compiled program per batch shape instead of
    # eager per-op dispatches (minutes-slow on remote backends); the trees
    # are jit arguments so the program carries topology only
    @jax.jit
    def observe(images, params_t, stats_t):
        site_vals.clear()
        with nn.intercept_methods(observer):
            model.apply(
                {"params": params_t, "batch_stats": stats_t}, images,
                train=False,
            )
        return dict(site_vals)

    absmax: Dict[str, float] = {}
    for i, images in enumerate(batches):
        if i >= max_batches:
            break
        obs = jax.device_get(observe(images, params, batch_stats))
        for key, v in obs.items():
            absmax[key] = max(absmax.get(key, 0.0), float(v))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in absmax.items()}


def make_act_quant_fn(model, batch_stats, params, scales: Dict[str, float]) -> Callable:
    """Full PTQ simulation: int8 weights + fake-quantized activations at the
    calibrated sites (numerics of an int8 engine; compute stays on the MXU
    in bf16 pending Pallas int8 matmul kernels — see ROADMAP)."""
    import flax.linen as nn

    q, s = quantize_params_int8(params)

    def quantizer(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if _activation_sites(context.module) and context.method_name == "__call__":
            key = "/".join(context.module.path)
            if key in scales:
                sc = scales[key]
                out_f = out.astype(jnp.float32)
                out = (jnp.clip(jnp.round(out_f / sc), -127, 127) * sc).astype(
                    out.dtype
                )
        return out

    # Weight trees are jit ARGUMENTS, not closure constants: closed-over
    # arrays embed into the lowered program, which blows the remote-compile
    # request-body limit on wide models and duplicates the weights in HBM.
    @jax.jit
    def _apply(images, deq_t, stats):
        with nn.intercept_methods(quantizer):
            logits = model.apply(
                {"params": deq_t, "batch_stats": stats}, images, train=False
            )
        return logits.astype(jnp.float32)

    # Dequantize ONCE at build (int8 weight rounding is baked into the
    # bf16 tree — the variant's numerics): per-call dequant inside jit
    # measured +27% latency for the weight-only variant (BASELINE.md).
    deq = dequantize_params(q, s, jnp.bfloat16)

    def fn(images):
        return _apply(images, deq, batch_stats)

    fn.stored_params = q
    fn.inner = _apply  # (images, *bound_args) form for outer-jit callers
    fn.bound_args = (deq, batch_stats)
    return fn


# ------------------------------------------------------- executed int8
def _int8_exec_eligible(
    module, wide: bool = False, grouped: bool = False, stem: bool = False
) -> bool:
    """int8-executable conv sites.

    Default (Pallas backend): 1x1 stride-1 dense convs whose channel counts
    tile the MXU lanes — the sites quantized_conv1x1 can execute as real
    int8 matmuls (ASPP b0 2048->256, ASPP projection 1280->256, the resnet
    bottleneck 1x1s from layer2 up; reference hot spots _deeplab.py:161-172).

    ``wide`` (XLA backend): ANY dense conv — XLA's int8 conv lowering
    handles arbitrary kernel/stride/dilation at the 2× MXU rate
    (BASELINE.md "int8 via XLA"); zero padding is exact under symmetric
    quantization.  Wide mode also covers the ShiftedDilatedConv valid-tap
    atrous branches (the ASPP hot spots) via int8 tap matmuls
    (ops/int8_xla.int8_shifted_dilated_conv) and ConcatConvBN (the
    decoder's 304-ch cls0, the single largest op of the int8 serving
    profile at 19.5% — logs/profile/attribution_int8.txt) via per-part
    int8 convs with per-part input scales.  The interceptor still gates
    plain convs on input channels (>=64) to keep the stem in bf16.

    ``grouped`` (XLA backend, opt-in): also route grouped/depthwise convs
    (resnext 3x3s, the mobilenetv2/xception depthwise stages) — exact
    under per-O weight scales (quantized_conv_xla docstring).  MEASURED
    wash-to-NEGATIVE on v5e (round-3 --grouped A/B, BASELINE.md:
    mobilenetv2 −0.5%, xception −5.4% — the hoped-for depthwise bandwidth
    win doesn't materialize and the per-stage quantize passes add VPU
    cost), so it stays default-off as a documented negative.

    ``stem`` (XLA backend, opt-in): also route the space-to-depth packed
    stem conv (PackedStrided2Conv) via ops/int8_xla.int8_packed_stem_conv
    — quantize-first so the pack gathers/concat move int8 bytes, then the
    packed conv runs int8×int8→int32.  Measured NEGATIVE on v5e: −17%
    serving throughput (BASELINE.md round-5 stem A/B) — the quantize pass
    runs at FULL input resolution before the stem halves spatial extent,
    and that elementwise cost exceeds what the HBM-bound stem conv saves.
    Accuracy is a non-issue (mask agreement 1.0; the 8-bit image source
    quantizes losslessly).  Default-off, kept for sweeps.
    """
    import flax.linen as nn

    if wide:
        from ..models.layers import (
            BlockDiagConv, ConcatConvBN, PackedStrided2Conv,
            ShiftedDilatedConv,
        )

        if stem and isinstance(module, PackedStrided2Conv):
            return True

        # BlockDiagConv (grouped_blockdiag execution of resnext 3x3s,
        # default-on for resnext backbones) EXECUTES as a dense conv, so
        # it routes like any dense conv — exact under per-O weight scales
        # because the off-block zeros quantize to exactly 0.  No
        # ``grouped`` opt-in needed: the MXU-rate win is the dense one.
        if isinstance(module, (BlockDiagConv, ConcatConvBN, ShiftedDilatedConv)):
            return True
    if not isinstance(module, nn.Conv):
        return False
    if module.feature_group_count != 1 and not (wide and grouped):
        return False
    if wide:
        return True
    strides = module.strides
    if isinstance(strides, int):
        strides = (strides, strides)
    return (
        tuple(module.kernel_size) == (1, 1)
        and tuple(strides or (1, 1)) == (1, 1)
    )


def calibrate_conv_inputs(
    model, params, batch_stats, batches, max_batches: int = 25,
    wide: bool = False, grouped: bool = False, stem: bool = False,
) -> Dict[str, float]:
    """Per-conv input absmax/127 scales for the int8-executable sites.

    The observer pass is JITTED: the interceptor records each eligible
    site's traced ``max(|x|)`` during tracing and the wrapper returns them
    all, so calibration is ONE compiled program per batch shape instead of
    hundreds of eager op dispatches (minutes-slow on remote backends)."""
    import flax.linen as nn

    site_vals: Dict[str, jax.Array] = {}
    from ..models.layers import ConcatConvBN, PackedStrided2Conv

    def observer(next_fn, args, kwargs, context):
        if (
            _int8_exec_eligible(context.module, wide, grouped, stem)
            and context.method_name == "__call__"
            and args
        ):
            key = "/".join(context.module.path)
            if isinstance(context.module, ConcatConvBN):
                # per-part input scales (the parts have distinct ranges)
                for i, p in enumerate(args[0]):
                    site_vals[f"{key}#p{i}"] = jnp.max(
                        jnp.abs(p.astype(jnp.float32))
                    )
                return next_fn(*args, **kwargs)
            x = args[0]
            if isinstance(context.module, PackedStrided2Conv):
                # the stem input is the 3-channel image — no channel gate
                if x.ndim == 4:
                    site_vals[key] = jnp.max(jnp.abs(x.astype(jnp.float32)))
                return next_fn(*args, **kwargs)
            ch_ok = (
                x.shape[-1] >= 64 if wide else x.shape[-1] % 128 == 0
            )
            if x.ndim == 4 and ch_ok:
                site_vals[key] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return next_fn(*args, **kwargs)

    @jax.jit
    def observe(images, params_t, stats_t):
        site_vals.clear()
        with nn.intercept_methods(observer):
            model.apply(
                {"params": params_t, "batch_stats": stats_t}, images,
                train=False,
            )
        return dict(site_vals)

    absmax: Dict[str, float] = {}
    for i, images in enumerate(batches):
        if i >= max_batches:
            break
        obs = jax.device_get(observe(images, params, batch_stats))
        for key, v in obs.items():
            absmax[key] = max(absmax.get(key, 0.0), float(v))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in absmax.items()}


def conv_scales_from_quant(quant: Any) -> Dict[str, float]:
    """Serving ``conv_scales`` from a QAT checkpoint's "quant" collection.

    int8-forward training with delayed scaling (ModelConfig.int8_training +
    int8_scale_mode="delayed") learns a running activation absmax per
    routed conv, stored as ``x_amax`` at the ConvBN's path in the model's
    "quant" collection (models/layers.ConvBN) and checkpointed with the
    TrainState.  Those amaxes are exactly what ``calibrate_conv_inputs``
    reconstructs from calibration batches — but learned over the whole
    training distribution instead of a few serving tiles.  This converts
    them to the ``{conv-site-path: absmax/127}`` dict the int8_exec
    interceptors key on (the inner conv module lives at ``<ConvBN>/conv``).

    Only the convs the QAT gate routed carry an amax (e.g. the stem and any
    below-gate narrow layers do not), so the result is typically a PARTIAL
    site map: merge it over calibrated scales (QAT values winning) rather
    than using it alone, unless the gate covered every eligible site.
    """
    out: Dict[str, float] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(quant)[0]:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if not keys:
            continue
        amax = float(np.asarray(leaf))
        scale = amax / 127.0 if amax > 0 else 1.0
        if keys[-1] == "x_amax":
            out["/".join(keys[:-1]) + "/conv"] = scale
        elif keys[-1].startswith("x_amax_p"):
            # ConcatConvBN part amaxes (models/layers.py x_amax_p{i}) map
            # to the serving interceptor's per-part keys "<site>#p{i}",
            # keyed at the ConcatConvBN module path (no "/conv" suffix)
            out["/".join(keys[:-1]) + "#p" + keys[-1][len("x_amax_p"):]] = scale
    return out


def make_int8_exec_fn(
    model, batch_stats, params, conv_scales: Dict[str, float],
    backend: str = "pallas",
    wide: Optional[bool] = None,
    grouped: bool = False,
    stem: bool = False,
) -> Callable:
    """EXECUTED int8: eligible convs run as int8 x int8 -> int32
    contractions with calibrated input scales; everything else dequantizes
    to bf16 as in the weight-only variant.  This is the measured-latency
    int8 row the reference's fbgemm pipeline has
    (evaluate_quantization.py:112-154).

    ``backend`` selects the lowering: 'pallas'
    (ops/pallas/int8_matmul.quantized_conv1x1, 1x1 sites only, measured at
    ≈bf16 rate on v5e — Mosaic limitation, BASELINE.md) or 'xla'
    (ops/int8_xla: lax.conv with int8 operands, lowered by XLA at the 2×
    int8 MXU rate — BASELINE.md "int8 via XLA").  ``wide`` (default: True
    for the xla backend) extends eligibility to every dense conv with
    >=64 input channels (3x3s, strided, dilated); calibrate with the same
    ``wide`` flag.  ``wide`` requires the xla backend: the wide-only
    module routes (ShiftedDilatedConv taps, ConcatConvBN per-part convs,
    BlockDiagConv dense expansion) have no Pallas lowering, and silently
    feeding their non-1x1 kernels to quantized_conv1x1 would compute
    wrong outputs.

    Memory: the built fn holds BOTH the int8 tree (``fn.stored_params``)
    and the dequantized bf16 tree (``fn.bound_args[0]``) alive — ~1.5× the
    weight-only footprint — because per-call dequant measured +27% latency
    (BASELINE.md).  Fine single-variant on v5e; if many variants are ever
    held concurrently, drop ``fn.stored_params`` to a shape/dtype summary."""
    import flax.linen as nn

    from ..models.layers import ConcatConvBN

    if wide is None:
        wide = backend == "xla"
    if wide and backend != "xla":
        raise ValueError(
            "wide=True int8 execution requires backend='xla' (the wide "
            "module routes have no Pallas lowering)"
        )
    if backend == "xla":
        from ..models.layers import (
            BlockDiagConv, PackedStrided2Conv, ShiftedDilatedConv,
        )
        from ..ops.int8_xla import (
            int8_packed_stem_conv,
            int8_shifted_dilated_conv,
            quantized_conv_xla,
        )

        def run_conv(x, w_q, w_scale, x_scale, module):
            if isinstance(module, ShiftedDilatedConv):
                return int8_shifted_dilated_conv(
                    x, w_q, w_scale, x_scale, module.dilation
                )
            if isinstance(module, PackedStrided2Conv):
                return int8_packed_stem_conv(
                    x, w_q, w_scale, x_scale, module.kernel_size
                )
            if isinstance(module, BlockDiagConv):
                # expand the stored grouped (k,k,Cin/G,Cout) int8 kernel
                # to the dense block-diagonal kernel IN int8 — the
                # off-block zeros are exact under symmetric quantization,
                # and per-O scales are identical grouped vs dense (each
                # O's block is its only nonzero slice)
                dense_q = module.expand_kernel(w_q, x.shape[-1])
                return quantized_conv_xla(
                    x, dense_q, w_scale, x_scale,
                    strides=(module.strides, module.strides),
                    padding=tuple(tuple(p) for p in module.padding),
                    dilation=(module.dilation, module.dilation),
                )
            return quantized_conv_xla(
                x, w_q, w_scale, x_scale,
                strides=module.strides or (1, 1),
                padding=module.padding,
                dilation=module.kernel_dilation or (1, 1),
                feature_group_count=getattr(module, "feature_group_count", 1),
            )
    else:
        from ..ops.pallas.int8_matmul import quantized_conv1x1

        interpret = jax.default_backend() != "tpu"

        def run_conv(x, w_q, w_scale, x_scale, module):
            return quantized_conv1x1(
                x, w_q, w_scale, x_scale, interpret=interpret
            )

    q, s = quantize_params_int8(params)
    routed = []

    def _lookup(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    # The weight/stat trees are threaded through jit as ARGUMENTS (not
    # closure constants): closed-over arrays embed into the lowered
    # program as literals, which (a) blew the remote-compile helper's
    # request-body limit on wide_resnet50_2 (HTTP 413, logs/r3_tpu_queue
    # .log) and (b) duplicates the weights in HBM.  The interceptor is
    # therefore built inside the traced function so it closes over the
    # traced trees.
    @jax.jit
    def _apply(images, deq_t, stats, q_t, s_t):
        def run_concat_conv_bn(parts, module, path, key):
            """ConcatConvBN replacement: per-part int8 convs (per-part
            input scale, shared per-O weight scale from the canonical
            concatenated kernel) summed in f32, then inference
            BatchNorm(+ReLU) from the running stats — the whole module,
            since BN lives inside it."""
            from ..models.layers import torch_conv_padding

            node_q = _lookup(q_t, path)
            w_q = node_q["conv"]["kernel"]
            if w_q.dtype != jnp.int8:
                return None
            w_scale = _lookup(s_t, path)["conv"]["kernel"]
            pad = torch_conv_padding(module.kernel_size)
            acc = None
            off = 0
            for i, p in enumerate(parts):
                c = p.shape[-1]
                x_scale = conv_scales.get(f"{key}#p{i}")
                if x_scale is None:
                    return None  # missing calibration for a part: fall back
                kp = jax.lax.slice_in_dim(w_q, off, off + c, axis=2)
                t = quantized_conv_xla(
                    p, kp, w_scale, x_scale,
                    strides=(1, 1), padding=[pad, pad], dilation=(1, 1),
                )
                acc = t if acc is None else acc + t
                off += c
            bn_p = _lookup(deq_t, path)["bn"]
            bn_s = _lookup(stats, path)["bn"]
            inv = jax.lax.rsqrt(
                bn_s["var"].astype(jnp.float32) + module.bn_epsilon
            )
            y = (acc - bn_s["mean"].astype(jnp.float32)) * inv * bn_p[
                "scale"
            ].astype(jnp.float32) + bn_p["bias"].astype(jnp.float32)
            if module.use_relu:
                y = jax.nn.relu(y)
            return y.astype(parts[0].dtype)

        def interceptor(next_fn, args, kwargs, context):
            if not (
                _int8_exec_eligible(context.module, wide, grouped, stem)
                and context.method_name == "__call__"
                and args
            ):
                return next_fn(*args, **kwargs)
            key = "/".join(context.module.path)
            if isinstance(context.module, ConcatConvBN):
                train = (
                    args[1] if len(args) > 1 else kwargs.get("train", False)
                )
                out = (
                    None
                    if train or backend != "xla"
                    else run_concat_conv_bn(
                        args[0], context.module, context.module.path, key
                    )
                )
                if out is None:
                    return next_fn(*args, **kwargs)
                routed.append(key)
                return out
            x = args[0]
            if backend == "xla" and isinstance(
                context.module, PackedStrided2Conv
            ):
                ch_ok = True  # the stem input is the 3-channel image
            else:
                ch_ok = (
                    x.shape[-1] >= 64 if wide else x.shape[-1] % 128 == 0
                )
            if x.ndim != 4 or not ch_ok or key not in conv_scales:
                return next_fn(*args, **kwargs)
            w_q = _lookup(q_t, context.module.path)["kernel"]
            if w_q.dtype != jnp.int8 or (not wide and w_q.shape[-1] % 128):
                return next_fn(*args, **kwargs)
            w_scale = _lookup(s_t, context.module.path)["kernel"]
            routed.append(key)
            out = run_conv(x, w_q, w_scale, conv_scales[key], context.module)
            if getattr(context.module, "use_bias", False):
                # not used by ConvBN/ShiftedDilatedConv, kept for safety
                out = out + _lookup(q_t, context.module.path)["bias"]
            return out.astype(x.dtype)

        with nn.intercept_methods(interceptor):
            logits = model.apply(
                {"params": deq_t, "batch_stats": stats},
                images,
                train=False,
            )
        return logits.astype(jnp.float32)

    # Dequantize ONCE at load (per-call dequantize measured +27% latency
    # for the weight-only variant, BASELINE.md); the bf16 tree is a call
    # argument, so serving latency and program size stay independent of it.
    deq_template = dequantize_params(q, s, jnp.bfloat16)

    def fn(images):
        return _apply(images, deq_template, batch_stats, q, s)

    fn.stored_params = q
    fn.routed_sites = routed  # populated at trace time
    fn.inner = _apply  # (images, *bound_args) form for outer-jit callers
    fn.bound_args = (deq_template, batch_stats, q, s)
    return fn


# -------------------------------------------------------------- variants
def make_variant_fn(
    model,
    batch_stats,
    params,
    name: str,
    act_scales: Optional[Dict[str, float]] = None,
    conv_scales: Optional[Dict[str, float]] = None,
    grouped: bool = False,
    stem: bool = False,
) -> Callable:
    """Build a jitted full-precision/bf16/int8 inference fn.

    name in {'f32', 'bf16', 'int8', 'int8_act', 'int8_exec'}.  'int8'
    stores int8 kernels in HBM and dequantizes into bf16 right before each
    conv (weight-only PTQ); 'int8_act' additionally fake-quantizes
    activations at calibrated sites (requires ``act_scales`` from
    ``calibrate_activations``); 'int8_exec' EXECUTES the eligible 1x1
    convs as int8 Pallas matmuls (requires ``conv_scales`` from
    ``calibrate_conv_inputs``).

    All variants pass the variable trees through jit as arguments rather
    than closure constants, so the lowered program carries topology only
    (closure-constant weights blew the remote-compile request-body limit
    on wide models and duplicated the weights in HBM).
    """

    @jax.jit
    def _apply_variables(images, variables):
        logits = model.apply(variables, images, train=False)
        return logits.astype(jnp.float32)

    if name == "int8_act":
        if act_scales is None:
            raise ValueError("int8_act requires act_scales (run calibration)")
        return make_act_quant_fn(model, batch_stats, params, act_scales)
    if name in ("int8_exec", "int8_exec_xla"):
        if conv_scales is None:
            raise ValueError(f"{name} requires conv_scales (run calibration)")
        return make_int8_exec_fn(
            model, batch_stats, params, conv_scales,
            backend="xla" if name.endswith("_xla") else "pallas",
            grouped=grouped,
            stem=stem,
        )
    if name == "f32":
        use_params = cast_params(params, jnp.float32)
    elif name == "bf16":
        use_params = cast_params(params, jnp.bfloat16)
    elif name == "int8":
        # int8 is the AT-REST format (4x smaller on disk/transfer, the
        # reference's PTQ size claim, evaluate_quantization.py:240);
        # dequantize ONCE at load so serving latency is bf16's by
        # construction — re-dequantizing per call inside jit measured
        # +27% latency on v5e for zero benefit (BASELINE.md).
        q, s = quantize_params_int8(params)
        deq = dequantize_params(q, s, jnp.bfloat16)

        def int8_fn(images):
            return _apply_variables(
                images, {"params": deq, "batch_stats": batch_stats}
            )

        int8_fn.stored_params = q  # for size accounting
        int8_fn.inner = _apply_variables
        int8_fn.bound_args = ({"params": deq, "batch_stats": batch_stats},)
        return int8_fn
    else:
        raise ValueError(f"unknown variant {name!r}")

    def fn(images):
        return _apply_variables(
            images, {"params": use_params, "batch_stats": batch_stats}
        )

    fn.stored_params = use_params
    fn.inner = _apply_variables
    fn.bound_args = ({"params": use_params, "batch_stats": batch_stats},)
    return fn


# ---------------------------------------------------------------- harness
def evaluate_variant(
    fn: Callable,
    dataset,
    *,
    sequence_length: int = 7,
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    """Per-image latency (first excluded, reference
    evaluate_quantization.py:261-263) + StreamMetrics over the set."""
    metrics = StreamMetrics(2, sequence_length=sequence_length)
    latencies = []
    samples = []
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for i in range(n):
        image, label = dataset[i][:2]
        x = jnp.asarray(image, jnp.float32)[None] / 255.0
        from ..data.transforms import normalize

        x = normalize(x)
        t0 = time.perf_counter()
        logits = fn(x)
        jax.block_until_ready(logits)
        dt = time.perf_counter() - t0
        if i > 0:  # first-iteration warm-up excluded
            latencies.append(dt)
        pred = np.argmax(np.asarray(logits[0]), axis=-1)
        samples.append((dataset.images[i], pred, np.asarray(label)))

    samples.sort(key=lambda s: s[0])
    if len(samples) >= sequence_length:
        for i in range(len(samples) - sequence_length + 1):
            window = samples[i : i + sequence_length]
            metrics.update(
                np.stack([s[2] for s in window]),
                np.stack([s[1] for s in window]),
                sequence_data=True,
            )
    else:
        for _, p, g in samples:
            metrics.update(g, p, sequence_data=False)

    results = metrics.get_results()
    return {
        "avg_latency_ms": float(np.mean(latencies) * 1e3) if latencies else 0.0,
        "miou": results["MIoU"],
        "fiou": results["Foreground IoU"],
        "ff1": results["Foreground F1"],
        "weighted": results["Best Score"],
    }


def save_comparison_images(
    out_dir: str,
    image,
    gt,
    preds_by_variant: Dict[str, Any],
    name: str,
) -> str:
    """Side-by-side (image | gt | per-variant preds) comparison panel
    (reference evaluate_quantization.py:156-184)."""
    from ..utils.visualizer import Visualizer

    vis = Visualizer(out_dir)
    import numpy as _np

    first_two = list(preds_by_variant.items())[:2]
    return vis.vis_segmentation_panel(
        name,
        _np.asarray(image),
        gt=_np.asarray(gt) * 255,
        pred=_np.asarray(first_two[0][1]) * 255 if first_two else None,
        confidence=_np.asarray(first_two[1][1]) * 255 if len(first_two) > 1 else None,
    )


def compare_variants(
    model,
    params,
    batch_stats,
    dataset,
    variants=("f32", "int8"),
    *,
    sequence_length: int = 7,
    max_images: Optional[int] = None,
    comparison_dir: Optional[str] = None,
    calibration_batches: int = 25,
) -> Dict[str, Dict[str, float]]:
    """The FP32-vs-quantized comparison report (reference
    evaluate_quantization.py:301-354 table: latency / size / metric deltas).
    With ``comparison_dir``, per-image variant comparison panels are written
    (reference evaluate_quantization.py:156-184).  The 'int8_act' variant
    calibrates activation ranges on the first <=``calibration_batches``
    eval images (reference :130-141)."""
    report: Dict[str, Dict[str, float]] = {}
    probe = None
    first_preds: Dict[str, Any] = {}

    act_scales = None
    conv_scales = None
    if "int8_act" in variants or any(v.startswith("int8_exec") for v in variants):
        from ..data.transforms import normalize

        def calib_iter():
            n = min(calibration_batches, len(dataset))
            for i in range(n):
                img = dataset[i][0]
                yield normalize(jnp.asarray(img, jnp.float32)[None] / 255.0)

        if "int8_act" in variants:
            act_scales = calibrate_activations(
                model, params, batch_stats, calib_iter(), calibration_batches
            )
        if any(v.startswith("int8_exec") for v in variants):
            # wide calibration is a superset of the 1x1-only site set, so
            # it serves both backends when the xla variant is requested
            conv_scales = calibrate_conv_inputs(
                model, params, batch_stats, calib_iter(), calibration_batches,
                wide=any(v == "int8_exec_xla" for v in variants),
            )

    for name in variants:
        fn = make_variant_fn(
            model, batch_stats, params, name,
            act_scales=act_scales, conv_scales=conv_scales,
        )
        stats = evaluate_variant(
            fn, dataset, sequence_length=sequence_length, max_images=max_images
        )
        stats["size_mb"] = param_bytes(fn.stored_params) / 1e6
        # tiered logit agreement vs the first (reference) variant
        image = jnp.asarray(dataset[0][0], jnp.float32)[None] / 255.0
        from ..data.transforms import normalize

        logits = np.asarray(fn(normalize(image)))
        first_preds[name] = np.argmax(logits[0], axis=-1)
        if probe is None:
            probe = logits
            stats["mask_agreement"], stats["verdict"] = 1.0, "reference variant"
        else:
            stats["mask_agreement"], stats["verdict"] = logit_diff_verdict(
                probe, logits
            )
        report[name] = stats

    if comparison_dir is not None:
        img0, gt0 = dataset[0][:2]
        save_comparison_images(
            comparison_dir, img0, gt0, first_preds, "variant_comparison"
        )

    base = report[variants[0]]
    for name in variants[1:]:
        r = report[name]
        r["speedup"] = (
            base["avg_latency_ms"] / r["avg_latency_ms"]
            if r["avg_latency_ms"]
            else 0.0
        )
        r["size_reduction"] = base["size_mb"] / r["size_mb"] if r["size_mb"] else 0.0
        r["miou_delta"] = r["miou"] - base["miou"]
        r["fiou_delta"] = r["fiou"] - base["fiou"]
        r["ff1_delta"] = r["ff1"] - base["ff1"]
    return report


def format_report(report: Dict[str, Dict[str, float]]) -> str:
    lines = [
        f"{'variant':<9}{'lat ms':>9}{'size MB':>10}{'MIoU':>8}{'FIoU':>8}"
        f"{'FF1':>8}{'dMIoU':>8}{'speedup':>9}{'agree':>8}  verdict"
    ]
    for name, r in report.items():
        lines.append(
            f"{name:<9}{r['avg_latency_ms']:>9.2f}{r['size_mb']:>10.2f}"
            f"{r['miou']:>8.4f}{r['fiou']:>8.4f}{r['ff1']:>8.4f}"
            f"{r.get('miou_delta', 0.0):>8.4f}{r.get('speedup', 1.0):>9.2f}"
            f"{r.get('mask_agreement', 1.0):>8.4f}  {r.get('verdict', '')}"
        )
    if "int8" in report:
        lines.append(
            "note: 'int8' is weight-only (size play; compute stays bf16 by "
            "construction — its speedup column measures dequant overhead, "
            "not an int8 claim). 'int8_exec' runs eligible 1x1 convs as "
            "real int8 MXU matmuls; see BASELINE.md for the v5e int8-rate "
            "finding."
        )
    return "\n".join(lines)
