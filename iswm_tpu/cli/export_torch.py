"""Export a trained checkpoint to a reference-loadable torch .pth file.

``python -m iswm_tpu.cli.export_torch --ckpt checkpoints/best_... \
      --out model.pth [--model deeplabv3plus_resnet50]``

The output loads into the reference's own factory model with
``strict=True`` (reference predict.py:78-86) — models trained here flow
into the reference's predict/export_onnx/TensorRT toolchain unchanged.
Accepts Orbax checkpoint directories (this framework's format) or a
reference .pth (pass-through re-save, useful for payload normalization).
"""

from __future__ import annotations

import argparse
import sys


def get_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export checkpoint to torch .pth")
    p.add_argument("--ckpt", type=str, required=True,
                   help="Orbax checkpoint dir (or reference .pth)")
    p.add_argument("--out", type=str, required=True, help="output .pth path")
    p.add_argument("--model", type=str, default="deeplabv3plus_resnet50")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--output_stride", type=int, default=16, choices=[8, 16])
    return p


def main(argv=None) -> int:
    args = get_argparser().parse_args(argv)
    head, _, backbone = args.model.partition("_")

    import jax.numpy as jnp

    from ..compat.torch_import import save_reference_checkpoint
    from ..config import Config
    from ..infer.predictor import Predictor

    cfg = Config()
    cfg.model.name = head
    cfg.model.backbone = "mobilenetv2" if backbone == "mobilenet" else backbone
    cfg.model.num_classes = args.num_classes
    cfg.model.output_stride = args.output_stride
    cfg.model.compute_dtype = "float32"

    predictor = Predictor(cfg, ckpt_path=args.ckpt)
    path = save_reference_checkpoint(
        args.out,
        predictor.params,
        predictor.batch_stats,
        backbone=cfg.model.backbone,
        head=head,
        model_name=args.model,
        num_classes=args.num_classes,
        output_stride=args.output_stride,
    )
    print(f"exported {args.ckpt} -> {path} (reference-loadable, strict=True)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
