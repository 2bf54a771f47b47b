"""Unified configuration for ISWM-TPU.

Replaces the reference's three-tier flag sprawl (argparse per entry point +
bash env-var frontends + env vars; reference train.py:272-351, predict.py:19-67,
scripts/training/run_ce_loss.sh:41-116) with one dataclass tree that can be
built from YAML, from CLI flags, or programmatically.  Every consumed
reference flag has a field here; dead reference flags (--test_only,
--step_size, --training_stage; reference train.py:296,303,346) are dropped.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

try:  # PyYAML is available in the image; gate anyway.
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover
    _HAS_YAML = False


@dataclass
class ModelConfig:
    """Model zoo selection (reference network/modeling.py:12-83)."""

    name: str = "deeplabv3plus"  # deeplabv3plus | deeplabv3
    backbone: str = "resnet50"  # resnet18/34/50/101/152 | resnext50_32x4d |
    #   resnext101_32x8d | wide_resnet50_2 | wide_resnet101_2 | mobilenetv2 | xception
    num_classes: int = 2
    output_stride: int = 16  # 8 -> aspp [12,24,36]; 16 -> [6,12,18]
    in_channels: int = 3
    separable_conv: bool = False  # actually wired here (reference declares, never calls)
    pretrained_backbone: bool = False
    # TPU-native knobs (no reference analogue):
    compute_dtype: str = "bfloat16"  # dtype of activations/matmuls
    param_dtype: str = "float32"  # dtype of parameters / BN stats
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum(0.1)
    bn_epsilon: float = 1e-5
    # Pallas fused-BN residual blocks for training (models/fused_block.py).
    # Measured SLOWER than XLA's conv fusions on v5e (ROADMAP
    # "Performance"), so default off; auto = on for single-chip TPU runs,
    # always | never | interpret (tests).
    fused_blocks: str = "never"
    # Pallas fused stem tail (BN+relu+maxpool fwd/bwd, ops/pallas/
    # fused_stem.py).  Same auto|always|never|interpret semantics; pool
    # gradient uses equal-split ties (see kernel docstring).  RESTRICTION:
    # the fused stem's custom VJP does not propagate a gradient to the
    # input image (its input cotangent is NaN-filled by design) — keep
    # this "never" for saliency / adversarial workflows that
    # differentiate w.r.t. the image.
    fused_stem: str = "never"
    # EXPERIMENTAL quantization-aware training: forward convs (dilation<6,
    # input channels >= this gate; True = 64, 0/False = off) execute int8
    # on the MXU at the 2x rate with straight-through bf16 gradients
    # (ops/int8_train.py).  A deliberate training-numerics change —
    # bf16-parity goldens do not apply; see BASELINE.md "int8 via XLA"
    # for the measured effect (narrow HBM-bound layers LOSE from the
    # extra quantize passes; gate higher to route only MXU-bound convs).
    int8_training: int = 0
    # Activation-scale mode for int8_training convs: "dynamic" = per-step
    # absmax (two passes per conv input: the scale reduction serializes
    # before the quantize); "delayed" = fp8-style stale scaling — quantize
    # with the running amax carried in the model's "quant" collection
    # (threaded by TrainState.quant), one fusable pass, with the current
    # absmax only feeding the next step's scale.  Measured on v5e in
    # BASELINE.md "int8 via XLA".
    int8_scale_mode: str = "dynamic"
    # EXPERIMENTAL int8 BACKWARD for the int8_training convs: dgrad and
    # wgrad also run int8 on the MXU (ops/int8_train.int8_conv_fullq) —
    # the cotangent is quantized per-tensor, wgrad reuses the forward's
    # quantized activations (int8 residuals, half the bf16 bytes).  A
    # further numerics change on top of QAT (quantized gradients);
    # requires int8_training > 0 to have any effect.  Composes with
    # int8_scale_mode="delayed" (stale fwd scale + int8 bwd,
    # ops/int8_train.int8_conv_fullq_static).
    int8_training_bwd: bool = False
    # How int8_training picks conv sites: "gate" = every eligible conv
    # whose input channels meet the int8_training threshold; "cost" =
    # per-site roofline model (ops/int8_train.int8_cost_route) that
    # weighs each conv's MXU time saved against its quantize-pass HBM
    # cost, with the channel threshold as an eligibility floor.  The
    # round-3 gate sweep showed the win/lose structure is per-layer
    # (BASELINE.md "int8 fwd+bwd TRAINING"), which a scalar gate cannot
    # express.
    int8_route: str = "gate"
    # Incremental HBM bytes/value the cost model charges one dynamic
    # quantize pass (see int8_cost_route docstring; delayed scaling is
    # charged a third).  Exposed for sweeps.
    int8_cost_bytes: float = 3.0
    # Execute grouped convs (resnext) whose INPUT channels are <= this
    # as one dense conv with a block-diagonal kernel: XLA's grouped
    # lowering runs at 1.3-12 TFLOP/s on v5e vs 130-190 dense, so G x
    # the MACs at the dense rate wins on narrow layers (-29% measured on
    # the resnext50 layer1 conv2 shape; +40% i.e. a LOSS at layer4's
    # 1024 channels — scripts/grouped_conv_bench.py).  -1 = auto: 256
    # for grouped backbones (resnext; +32% train / +37% infer measured
    # at that gate, BASELINE.md r3 zoo), 0 elsewhere.  0 = off; the math
    # is bit-identical either way (tests/test_models.py) and parameters
    # keep the grouped (k,k,Cin/G,Cout) layout, so checkpoints and torch
    # import/export are unaffected by the setting.
    grouped_blockdiag: int = -1


@dataclass
class DataConfig:
    """Dataset + augmentation chain (reference train.py:355-380, utils/ext_transforms.py)."""

    data_root: str = "./datasets/data"
    dataset: str = "binary"
    crop_size: int = 513  # reference default; production runs use 200 (run_ce_loss.sh:47)
    scale_range: tuple = (0.5, 2.0)  # ExtRandomScale (ext_transforms.py:94)
    hflip_prob: float = 0.5  # ExtRandomHorizontalFlip (ext_transforms.py:212)
    # ImageNet constants (reference train.py:360-361, predict.py:95-96)
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)
    ignore_index: int = 255
    batch_size: int = 64
    val_batch_size: int = 4
    num_workers: int = 4
    # synthetic fixture generator (replaces the snapshot-missing datasets/ pkg)
    synthetic: bool = False
    synthetic_train_size: int = 64
    synthetic_val_size: int = 16
    synthetic_image_size: int = 200
    # validation split as temporally-coherent sequences (exercises the
    # 7-frame temporal metrics with real wave motion)
    synthetic_sequence_val: bool = False
    cache_in_memory: bool = True  # keep decoded arrays in host RAM


@dataclass
class LossConfig:
    """Loss selection (reference train.py:454-459, utils/loss.py:14-39)."""

    loss_type: str = "ce_loss"  # ce_loss | IWce_loss | focal_loss
    focal_alpha: float = 1.0
    focal_gamma: float = 0.0
    ignore_index: int = 255
    # Pallas fused softmax-CE kernel for binary CE:
    # auto | always | never | interpret (CPU tests)
    fused_kernel: str = "auto"


@dataclass
class OptimConfig:
    """Optimizer + LR schedule (reference train.py:421-452)."""

    optimizer: str = "sgd"  # sgd | adam | adamw
    lr: float = 0.01
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 1e-4
    schedule: str = "cosine"  # cosine (reference default, per-iteration) | poly
    # cosine: eta_min = lr * cosine_min_factor (reference train.py:449-451)
    cosine_min_factor: float = 0.01
    # poly: (1 - it/max)^power with min_lr floor (reference utils/scheduler.py:3-12)
    poly_power: float = 0.9
    poly_min_lr: float = 1e-6


@dataclass
class MetricsConfig:
    """Composite weighted score (reference train.py:842-850, stream_metrics.py:65-100)."""

    sequence_length: int = 7
    wave_presence_threshold: float = 0.005
    max_fte: float = 10.0
    weights: dict = field(
        default_factory=lambda: {
            "MIoU": 0.05,
            "Foreground IoU": 0.25,
            "Foreground F1": 0.25,
            "Front Tracking Error": 0.25,
            "Temporal Consistency": 0.10,
            "Region Continuity": 0.10,
        }
    )


@dataclass
class TrainConfig:
    """Training loop (reference train.py:272-351, 840-1116)."""

    total_itrs: int = 30_000
    val_interval: int = 500
    # cheap device-side CM-only eval every N iters (0 = off): preds stay on
    # device, only a CxC matrix crosses to host — monitoring between the
    # full (host StreamMetrics) validations that gate the best checkpoint
    quick_eval_interval: int = 0
    print_interval: int = 10
    random_seed: int = 1
    continue_training: bool = False
    ckpt: Optional[str] = None
    checkpoints_dir: str = "checkpoints"
    val_results_dir: str = "val_results"
    metrics_plots_dir: str = "metrics_plots"
    save_val_results: bool = True
    # How many val samples to dump on a new best.  The reference dumps the
    # WHOLE val set (reference train.py:461-523); we default to 8 to bound
    # disk/IO on large val sets — set 0 for reference parity (dump all).
    val_dump_limit: int = 8
    save_confidence_map: bool = False
    log_dir: str = "logs"  # JSONL metric log (MLflow-compatible names)
    use_mlflow: bool = False  # enable if mlflow importable + MLFLOW_TRACKING_URI set
    experiment_tag: str = ""
    # jax.profiler: trace this many steps starting at profile_start (0 = off)
    profile_steps: int = 0
    profile_start: int = 10
    # fault tolerance: write a rolling 'latest' checkpoint every N iters
    # (0 = off); auto_resume restores it at startup when present
    latest_interval: int = 0
    auto_resume: bool = False
    # int8-early / bf16-finish hybrid schedule (0 = off): with
    # model.int8_training > 0, iterations >= this switch the train step
    # (and validation forward) to the plain bf16 model — parameters,
    # optimizer state and BN stats carry over unchanged (QAT adds no
    # parameters; a delayed-mode "quant" collection is dropped at the
    # switch).  Motivated by the multi-seed int8_bwd study (BASELINE.md
    # round 4): the int8 arms track ~0.01 weighted BELOW bf16 but PEAK
    # LATER, so taking the +9-14% int8_bwd throughput early and finishing
    # the last ~20-25% of iterations in bf16 may recover the accuracy
    # deficit at most of the speed win.  Measured verdict in BASELINE.md
    # (round 5).
    int8_switch_iter: int = 0


@dataclass
class ParallelConfig:
    """Mesh layout — TPU-native replacement for nn.DataParallel (reference train.py:970)."""

    data_axis: int = -1  # -1: all devices on the data axis
    model_axis: int = 1  # >1 enables spatial/channel model parallelism
    axis_names: tuple = ("data", "model")
    # Remat policy for memory/flops trade (no reference analogue)
    remat: bool = False


@dataclass
class PredictConfig:
    """Inference products (reference predict.py:19-67)."""

    input_dir: str = ""
    output_dir: str = "predictions"
    pred_threshold: float = 0.5  # fg-prob threshold (predict.py:275)
    use_argmax: bool = False  # validation semantics (train.py:644) vs predict's threshold
    save_confidence: bool = False
    save_binary: bool = False
    binary_threshold: int = 200
    min_prob: float = 0.2  # broken-area band (predict.py:214-256)
    max_prob: float = 0.7
    enable_wave_processing: bool = False
    save_feature_maps: bool = False  # backbone/ASPP activation heatmaps
    synthetic_damage_prob: float = 0.8  # predict.py:144
    synthetic_damage_ratio: float = 0.05  # predict.py:152
    # Tile engine (TPU-native replacement for whole-image single-shot predict)
    tile_size: int = 512
    tile_overlap: int = 64
    tile_batch: int = 8
    # Serving precision: bf16 (native) | int8 (weight-only, 4x smaller) |
    # int8_exec_xla (XLA int8 convs — measured FASTER than bf16 on v5e,
    # BASELINE.md "int8 via XLA"; calibrates activation scales on the
    # first scene's tiles)
    serving_variant: str = "bf16"
    # With int8_exec_xla: also route grouped/depthwise convs (resnext 3x3s,
    # mobilenetv2/xception depthwise stages) — exact under per-O weight
    # scales.  MEASURED wash-to-NEGATIVE on v5e (round 3 --grouped A/B,
    # BASELINE.md: mobilenetv2 −0.5%, xception −5.4% — XLA's int8
    # grouped/depthwise convs are no faster than bf16 and the per-stage
    # quantize passes add VPU cost), so default-off; kept for sweeps.
    int8_grouped: bool = False
    # With int8_exec_xla: also route the space-to-depth packed stem conv
    # (quantize-first packed int8 conv, ops/int8_xla.int8_packed_stem_conv).
    # Measured NEGATIVE on v5e: −17% (1037.6 vs 1252.9 tiles/s, round-5
    # stem A/B in BASELINE.md) — the full-resolution input quantize pass
    # costs more than the HBM-bound stem conv saves.  Accuracy is not the
    # issue (mask agreement 1.0); default-off, kept for sweeps.
    int8_stem: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    predict: PredictConfig = field(default_factory=PredictConfig)

    # ------------------------------------------------------------------ io
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            if _HAS_YAML:
                yaml.safe_dump(_plain(self.to_dict()), f, sort_keys=False)
            else:  # pragma: no cover
                json.dump(_plain(self.to_dict()), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section, values in (d or {}).items():
            if not hasattr(cfg, section):
                raise KeyError(f"Unknown config section: {section!r}")
            sub = getattr(cfg, section)
            if not isinstance(values, dict):
                raise TypeError(f"Section {section!r} must be a mapping")
            for k, v in values.items():
                if not hasattr(sub, k):
                    raise KeyError(f"Unknown config key: {section}.{k}")
                cur = getattr(sub, k)
                if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                    v = tuple(v)
                setattr(sub, k, v)
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            if _HAS_YAML:
                d = yaml.safe_load(f)
            else:  # pragma: no cover
                d = json.load(f)
        return cls.from_dict(d or {})

    def validate(self) -> "Config":
        if self.model.output_stride not in (8, 16):
            raise ValueError("output_stride must be 8 or 16")
        if self.loss.loss_type not in ("ce_loss", "IWce_loss", "focal_loss"):
            raise ValueError(f"unknown loss_type {self.loss.loss_type!r}")
        if self.optim.optimizer not in ("sgd", "adam", "adamw"):
            raise ValueError(f"unknown optimizer {self.optim.optimizer!r}")
        if self.optim.schedule not in ("cosine", "poly"):
            raise ValueError(f"unknown schedule {self.optim.schedule!r}")
        if self.model.num_classes < 2:
            raise ValueError("num_classes must be >= 2")
        return self


def _plain(obj: Any) -> Any:
    """Recursively convert tuples to lists for YAML friendliness."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def aspp_dilations(output_stride: int) -> Sequence[int]:
    """ASPP rates per output stride (reference network/modeling.py:14-19)."""
    if output_stride == 8:
        return (12, 24, 36)
    return (6, 12, 18)
