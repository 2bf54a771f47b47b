"""Benchmark: 512x512 tiles/sec/chip for the flagship model (train + infer).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N, ...}

Baseline context (BASELINE.md): the reference publishes NO numbers (its
eval harnesses print tables at runtime only), so the PRIMARY metric here
is the absolute tiles/sec/chip.  ``vs_baseline`` is a secondary,
explicitly-estimated multiplier: ~95 tiles/s is our A100 fp16 train
anchor for DeepLabV3+/RN50 @ 512x512, derived from public
MMSegmentation-class training logs (~0.33-0.36 s/iter at batch 16/2-GPU
V100 for 512x512 deeplabv3plus_r50, scaled by the commonly-reported
~2.2-2.5x A100/V100 conv-net speedup); no directly-published A100 number
for this exact config exists to cite.  See BASELINE.md "Anchor
provenance".

Usage: python bench.py [--smoke] [--batch N] [--size N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_TRAIN_TILES_PER_SEC = 95.0  # documented estimate, see module docstring


def build(batch: int, size: int, backbone: str = "resnet50", output_stride: int = 16,
          int8_training: bool = False, int8_scale_mode: str = "dynamic",
          int8_bwd: bool = False, grouped_blockdiag: int = -1,
          int8_route: str = "gate"):
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_eval_step, make_train_step

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.output_stride = output_stride
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.int8_training = int8_training  # experimental QAT fwd convs
    cfg.model.int8_scale_mode = int8_scale_mode
    cfg.model.int8_training_bwd = int8_bwd  # + int8 dgrad/wgrad
    cfg.model.int8_route = int8_route  # per-site cost model vs scalar gate
    cfg.model.grouped_blockdiag = grouped_blockdiag  # resnext blockdiag gate
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=30000)
    loss_fn = make_loss_fn("ce_loss")
    train_step = make_train_step(model, tx, loss_fn, augment=None, donate=True)
    eval_step = make_eval_step(model, normalize_input=False)

    rng = jax.random.key(0)
    sample = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    state = create_train_state(model, tx, rng, sample)

    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, size, size, 3)), jnp.bfloat16
    )
    labels = jnp.asarray(
        (np.random.default_rng(1).random((batch, size, size)) > 0.9), jnp.int32
    )
    return state, train_step, eval_step, images, labels, rng


def time_loop(fn, steps: int) -> float:
    """Median-of-3 timing of `steps` dispatches.

    Train steps are dependent (state feeds state); the inference loop's
    steps are mutually independent, so the final 1-element probe proves
    all `steps` executed only because the backend executes dispatches in
    order (true of the axon tunnel and of XLA's single-stream TPU
    execution).  On a backend that reorders independent dispatches the
    eval loop would need explicit chaining (feed a scalar of step i into
    step i+1) for the honesty argument to hold.

    The timed region ends with an explicit host fetch of ONE element of the
    final output — on remote/async backends (axon tunnel) ``block_until_ready``
    alone has been observed to return before execution completes, producing
    physically impossible throughput numbers; a device->host fetch is the
    only honest clock.  The probe is a single element, not the full array:
    fetching the whole 8.4 MB preds tensor through the ~60 MB/s tunnel
    added ~1.4-2.5 ms/step of D2H that is a tunnel artifact, not a v5e
    property (PCIe gen4 ships 8.4 MB in ~0.5 ms).  The element is gathered
    on device from the computed output, so execution cannot be skipped.
    """
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn()
        float(jax.tree.leaves(out)[0].ravel()[0])  # 1-element honest probe
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, quick check")
    ap.add_argument("--batch", type=int, default=0, help="0 = auto (try 16,8,4)")
    ap.add_argument("--size", type=int, default=512)
    # Steps per timing rep: the tunneled backend costs ~36 ms per
    # dispatch+fetch round trip (measured round 2, constant w.r.t. the
    # work inside); 100 dependent steps amortize that to <0.4 ms/step so
    # the reported number is steady-state device throughput, still
    # honestly clocked by a final host fetch.
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--int8_training", type=int, default=0,
                    help="experimental QAT: min input channels to route forward "
                         "convs through int8 (0=off; 64=all eligible; higher "
                         "gates route only the MXU-bound convs)")
    ap.add_argument("--int8_scale_mode", default="dynamic",
                    choices=("dynamic", "delayed"),
                    help="activation-scale mode for --int8_training convs "
                         "(delayed = fp8-style stale scaling, one fusable "
                         "quantize pass per conv input)")
    ap.add_argument("--int8_bwd", action="store_true",
                    help="with --int8_training: dgrad/wgrad also run int8 "
                         "(quantized cotangents, int8 activation residuals)")
    ap.add_argument("--output_stride", type=int, default=16, choices=(8, 16))
    ap.add_argument("--grouped_blockdiag", type=int, default=-1,
                    help="execute grouped convs with <= this many input "
                         "channels as block-diagonal dense convs (resnext; "
                         "-1=auto [256 for resnext backbones], 0=off — see "
                         "ModelConfig.grouped_blockdiag)")
    ap.add_argument("--int8_route", default="gate", choices=("gate", "cost"),
                    help="with --int8_training: 'cost' applies the per-site "
                         "roofline model (ops/int8_train.int8_cost_route) "
                         "above the channel-gate floor")
    args = ap.parse_args()

    if args.smoke:
        args.size, args.steps = 128, 3
        batches = [4]
    else:
        batches = [args.batch] if args.batch else [8, 4]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from iswm_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    state = train_step = None
    batch = batches[-1]
    for b in batches:
        try:
            state, train_step, eval_step, images, labels, rng = build(
                b, args.size, args.backbone, args.output_stride,
                int8_training=args.int8_training,
                int8_scale_mode=args.int8_scale_mode,
                int8_bwd=args.int8_bwd,
                grouped_blockdiag=args.grouped_blockdiag,
                int8_route=args.int8_route,
            )
            # warm up / compile both paths
            state, m = train_step(state, images, labels, rng)
            jax.block_until_ready(m["loss"])
            ev = eval_step(state.params, state.batch_stats, images)
            jax.block_until_ready(ev["preds"])
            batch = b
            break
        except Exception as e:  # OOM at this batch — try smaller
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                print(f"batch {b} OOM, trying smaller", file=sys.stderr)
                continue
            raise
    else:
        raise RuntimeError("all batch sizes failed")

    # --- train throughput (steps are dependent through donated state) ---
    def train_once():
        nonlocal state
        state, m = train_step(state, images, labels, rng)
        return m["loss"]

    t_train = time_loop(train_once, args.steps)
    train_tps = batch / t_train

    # --- inference throughput ---
    def infer_once():
        return eval_step(state.params, state.batch_stats, images)["preds"]

    t_infer = time_loop(infer_once, args.steps)
    infer_tps = batch / t_infer

    # --- executed-int8 inference (the serving speed play; BASELINE.md
    # "int8 via XLA": XLA int8 convs at the 2x MXU rate) — best-effort,
    # never fails the bench
    int8_infer_tps = None
    if not args.smoke and not args.int8_training:
        try:
            from iswm_tpu.infer.quantization import (
                calibrate_conv_inputs,
                make_variant_fn,
            )
            from iswm_tpu.models import build_model as _bm
            from iswm_tpu.config import Config as _Cfg

            _cfg = _Cfg()
            _cfg.model.backbone = args.backbone
            _cfg.model.output_stride = args.output_stride
            _cfg.model.grouped_blockdiag = args.grouped_blockdiag
            _model = _bm(_cfg.model)
            scales = calibrate_conv_inputs(
                _model, state.params, state.batch_stats,
                [images[:1].astype(jnp.float32)], wide=True,
            )
            q_fn = make_variant_fn(
                _model, state.batch_stats, state.params, "int8_exec_xla",
                conv_scales=scales,
            )
            t_q = time_loop(lambda: q_fn(images), args.steps)
            int8_infer_tps = batch / t_q
        except Exception as e:  # pragma: no cover - keep the bench robust
            print(f"int8 inference row skipped: {e}", file=sys.stderr)

    # --- int8-training throughput (the opt-in train speed play;
    # BASELINE.md "int8 fwd+bwd TRAINING": dgrad/wgrad of the >=256-channel
    # convs on the int8 MXU path, measured +9.3% over bf16 on v5e) —
    # best-effort extra row on the default config, never fails the bench.
    int8_train_tps = None
    if (
        not args.smoke
        and not args.int8_training
        and args.backbone == "resnet50"
        and args.output_stride == 16
    ):
        try:
            q_state, q_train_step, _, q_images, q_labels, q_rng = build(
                batch, args.size, args.backbone, args.output_stride,
                int8_training=256, int8_bwd=True,
            )
            q_state, qm = q_train_step(q_state, q_images, q_labels, q_rng)
            jax.block_until_ready(qm["loss"])

            def int8_train_once():
                nonlocal q_state
                q_state, qm = q_train_step(q_state, q_images, q_labels, q_rng)
                return qm["loss"]

            int8_train_tps = batch / time_loop(int8_train_once, args.steps)
        except Exception as e:  # pragma: no cover - keep the bench robust
            print(f"int8 train row skipped: {e}", file=sys.stderr)

    # plausibility: 125.4 GFLOP fwd per 512x512 resnet50+v3+ tile at OS=16
    # (measured: 3009 GFLOP/step at batch 8 from the xplane trace flops
    # counters, logs/profile/attribution.txt), ~3x for fwd+bwd+update.
    # The constant is OS=16/resnet50-specific; for other configs the
    # implied number is omitted rather than wrong.
    fwd_gflops_per_tile = 125.4 * (args.size / 512) ** 2
    implied_tflops = 3 * fwd_gflops_per_tile * train_tps / 1e3
    implied_valid = args.output_stride == 16 and args.backbone == "resnet50"

    result = {
        "metric": (
            f"{args.size}x{args.size} train tiles/sec/chip "
            f"(deeplabv3plus_{args.backbone} os{args.output_stride} "
            f"{'int8fwd>=' + str(args.int8_training) if args.int8_training else 'bf16'})"
        ),
        # record the full int8-training lever configuration so sweep rows
        # (scripts/int8_train_bench.sh) stay distinguishable in the JSON
        **(
            {
                "int8_training_gate": args.int8_training,
                "int8_scale_mode": args.int8_scale_mode,
                "int8_bwd": bool(args.int8_bwd),
            }
            if args.int8_training
            else {}
        ),
        **(
            {"grouped_blockdiag": args.grouped_blockdiag}
            if args.grouped_blockdiag
            else {}
        ),
        "value": round(train_tps, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(train_tps / A100_TRAIN_TILES_PER_SEC, 3),
        "infer_tiles_per_sec": round(infer_tps, 2),
        **(
            {"int8_infer_tiles_per_sec": round(int8_infer_tps, 2)}
            if int8_infer_tps
            else {}
        ),
        # the opt-in training mode (--int8_training 256 --int8_bwd):
        # bf16 stays the headline `value` (parity default); this row
        # records the measured throughput lever (BASELINE.md)
        **(
            {"int8_train_tiles_per_sec": round(int8_train_tps, 2)}
            if int8_train_tps
            else {}
        ),
        "batch": batch,
        "device": str(dev),
        "step_ms": round(t_train * 1e3, 2),
    }
    if implied_valid:
        result["implied_tflops"] = round(implied_tflops, 1)
    if implied_valid and implied_tflops > 250:  # v5e peak is ~197 bf16 TFLOP/s
        result["warning"] = "implied FLOPs exceed hardware peak; timing suspect"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
