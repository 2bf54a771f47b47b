"""Model zoo factory.

Replaces the reference factory (reference network/modeling.py:12-83) and
removes its gaps: every registered backbone is actually constructible
(the reference raises NotImplementedError for anything but resnet,
modeling.py:70-71, and hardcodes resnet50 in train.py:412-419).

Factory names follow the reference convention:
    deeplabv3plus_resnet50, deeplabv3plus_resnet101, deeplabv3_resnet50, ...
    deeplabv3plus_mobilenet, deeplabv3plus_xception, ...
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import ModelConfig, aspp_dilations
from .deeplab import ASPP, DeepLabHead, DeepLabHeadV3Plus, DeepLabV3Model
from .layers import QUANT_OFF, QuantSpec
from .mobilenetv2 import MobileNetV2
from .resnet import ResNet, resnet_feature_channels
from .xception import Xception

_RESNETS = (
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    # grouped / wide variants (reference network/backbone/resnet.py:287-346)
    "resnext50_32x4d", "resnext101_32x8d",
    "wide_resnet50_2", "wide_resnet101_2",
)
BACKBONES = _RESNETS + ("mobilenetv2", "xception")
HEADS = ("deeplabv3plus", "deeplabv3")


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
        name
    ]


def _resolve_fused_mode(value: str, setting: str = "fused_blocks") -> str:
    """Map a ModelConfig fused-kernel setting (fused_blocks / fused_stem)
    to a resolved mode.

    "auto" enables the compiled Pallas path only for single-device TPU
    processes — like the fused-CE gate in ops/losses.py, an opaque
    pallas_call under a multi-device jit would force GSPMD to gather
    activations (sharded variant: ROADMAP).
    """
    if value == "auto":
        import jax

        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        return "compiled" if (on_tpu and jax.device_count() == 1) else "never"
    if value == "always":
        return "compiled"
    if value in ("never", "interpret"):
        return value
    raise ValueError(f"unknown {setting} setting {value!r}")


# auto grouped_blockdiag gate per grouped backbone: the measured optima
# (r3/r4 TPU sweeps, BASELINE.md).  resnext50_32x4d: gate 256 (+32% train
# / +37% infer; 512 loses on its wide layer4).  resnext101_32x8d: gate 512
# (427.7 vs 409.0 train tiles/s and 1659.5 vs 1528.0 int8-infer at 256 —
# its 8-wide groups keep blockdiag winning one stage deeper).
_GROUPED_BACKBONES = {"resnext50_32x4d": 256, "resnext101_32x8d": 512}


def quant_spec(cfg: ModelConfig) -> QuantSpec:
    """Derive the per-model QuantSpec from a ModelConfig.

    The spec is captured by every module at CONSTRUCTION (no process
    globals), so differently-configured models coexist and retrace
    independently in one process.

    grouped_blockdiag -1 = auto: the per-backbone measured optimum for
    grouped (resnext) backbones — see _GROUPED_BACKBONES — and off
    elsewhere (dense backbones have no grouped convs; MobileNet's
    depthwise convs are cg=1 and excluded from blockdiag regardless,
    see ConvBN).
    """
    int8 = getattr(cfg, "int8_training", 0)
    if int8 is True:
        int8 = 64
    gb = getattr(cfg, "grouped_blockdiag", -1)
    if gb is True:
        gb = 256
    if gb in (-1, None):
        gb = _GROUPED_BACKBONES.get(cfg.backbone, 0)
    return QuantSpec(
        int8_min_channels=int(int8 or 0),
        int8_scale_mode=getattr(cfg, "int8_scale_mode", "dynamic"),
        int8_bwd=bool(getattr(cfg, "int8_training_bwd", False)),
        int8_route=getattr(cfg, "int8_route", "gate"),
        int8_cost_bytes=float(getattr(cfg, "int8_cost_bytes", 3.0)),
        grouped_blockdiag_max=int(gb or 0),
    )


def build_model(cfg: ModelConfig) -> DeepLabV3Model:
    """Build a segmentation model from config.

    OS=8 -> dilate resnet layers 3&4 / ASPP [12,24,36]; OS=16 -> dilate
    layer 4 only / [6,12,18] (reference network/modeling.py:14-19).
    """
    if cfg.name not in HEADS:
        raise ValueError(f"unknown model name {cfg.name!r}; expected one of {HEADS}")
    if cfg.backbone not in BACKBONES:
        raise ValueError(
            f"unknown backbone {cfg.backbone!r}; expected one of {BACKBONES}"
        )
    dtype = _dtype(cfg.compute_dtype)
    param_dtype = _dtype(cfg.param_dtype)
    rates = aspp_dilations(cfg.output_stride)
    quant = quant_spec(cfg)
    kw = dict(dtype=dtype, param_dtype=param_dtype, quant=quant)

    if cfg.backbone in _RESNETS:
        rswd = (False, True, True) if cfg.output_stride == 8 else (False, False, True)
        backbone = ResNet(
            arch=cfg.backbone,
            replace_stride_with_dilation=rswd,
            in_channels=cfg.in_channels,
            fused_mode=_resolve_fused_mode(getattr(cfg, "fused_blocks", "never")),
            fused_stem=_resolve_fused_mode(
                getattr(cfg, "fused_stem", "never"), "fused_stem"
            ),
            **kw,
        )
    elif cfg.backbone == "mobilenetv2":
        backbone = MobileNetV2(output_stride=cfg.output_stride, **kw)
    else:  # xception
        # 4-tuple over (block1, block2, block3+middle, block12):
        # OS=16 dilates the exit flow; OS=8 also dilates block3+middle.
        rswd = (
            (False, False, True, True)
            if cfg.output_stride == 8
            else (False, False, False, True)
        )
        backbone = Xception(replace_stride_with_dilation=rswd, **kw)

    head_cls = DeepLabHeadV3Plus if cfg.name == "deeplabv3plus" else DeepLabHead
    head = head_cls(
        num_classes=cfg.num_classes,
        atrous_rates=rates,
        separable=cfg.separable_conv,
        **kw,
    )
    return DeepLabV3Model(backbone=backbone, head=head)


def build_model_by_name(
    factory_name: str,
    num_classes: int = 2,
    output_stride: int = 16,
    **overrides: Any,
) -> DeepLabV3Model:
    """Reference-style factory: e.g. ``deeplabv3plus_resnet50`` (reference
    network/modeling.py:75-83)."""
    head, _, backbone = factory_name.partition("_")
    if backbone == "mobilenet":
        backbone = "mobilenetv2"
    cfg = ModelConfig(
        name=head,
        backbone=backbone,
        num_classes=num_classes,
        output_stride=output_stride,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return build_model(cfg)


__all__ = [
    "ASPP",
    "BACKBONES",
    "DeepLabHead",
    "DeepLabHeadV3Plus",
    "DeepLabV3Model",
    "HEADS",
    "MobileNetV2",
    "QUANT_OFF",
    "QuantSpec",
    "ResNet",
    "Xception",
    "build_model",
    "build_model_by_name",
    "quant_spec",
    "resnet_feature_channels",
]
