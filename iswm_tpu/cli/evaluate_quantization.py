"""Quantization evaluation CLI.

Replaces the reference's evaluate_quantization.py entry point
(reference evaluate_quantization.py:81-89, 187-354): compares serving
variants (f32 / bf16 / int8-weight) on an imgs/+masks/ evaluation tree and
prints the latency/size/metric-delta table with tiered logit verdicts.
"""

from __future__ import annotations

import argparse
import sys

from ..config import Config


def get_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ISWM-TPU quantization evaluation")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu, tpu)")
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory with imgs/ and masks/ subdirs")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--output_stride", type=int, default=None, choices=[8, 16])
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--variants", type=str, default="f32,bf16,int8",
                   # also available: int8_act (fake-quant PTQ sim), int8_exec
                   # (real int8 Pallas matmuls in eligible 1x1 convs),
                   # int8_exec_xla (same sites, XLA-lowered int8 convs)
                   help="comma-separated: "
                        "f32,bf16,int8,int8_act,int8_exec,int8_exec_xla")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--sequence_length", type=int, default=7)
    p.add_argument("--comparison_dir", type=str, default=None,
                   help="write per-variant comparison panels here")
    return p


def main(argv=None) -> int:
    args = get_argparser().parse_args(argv)
    from ..utils.misc import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.model:
        head, _, backbone = args.model.partition("_")
        cfg.model.name = head
        cfg.model.backbone = "mobilenetv2" if backbone == "mobilenet" else backbone
    if args.output_stride is not None:
        cfg.model.output_stride = args.output_stride
    if args.compute_dtype is not None:
        cfg.model.compute_dtype = args.compute_dtype
    cfg.validate()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ..data.datasets import EvaluationDataset
    from ..infer.quantization import compare_variants, format_report
    from ..models import build_model
    from ..train import checkpoint as ckpt_lib
    from ..train.optim import make_optimizer
    from ..train.step import create_train_state

    # a flat root with imgs/ + masks/ subdirs (reference layout,
    # evaluate_quantization.py:34-50)
    dataset = EvaluationDataset(args.data_dir, split="")

    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=1)
    sample = jnp.zeros((1, 64, 64, cfg.model.in_channels), cfg.model.compute_dtype)
    state = create_train_state(model, tx, jax.random.key(0), sample)
    if args.ckpt and args.ckpt.endswith((".pth", ".pt")):
        from ..compat.torch_import import load_reference_checkpoint

        params, batch_stats, _ = load_reference_checkpoint(
            args.ckpt, backbone=cfg.model.backbone, head=cfg.model.name
        )
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        )
    elif args.ckpt:
        state, _ = ckpt_lib.restore(args.ckpt, state)

    variants = tuple(v.strip() for v in args.variants.split(",") if v.strip())
    report = compare_variants(
        model,
        state.params,
        state.batch_stats,
        dataset,
        variants=variants,
        sequence_length=args.sequence_length,
        max_images=args.max_images,
        comparison_dir=args.comparison_dir,
    )
    print(format_report(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
