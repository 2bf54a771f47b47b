"""End-to-end serving latency: bf16 vs executed-int8 variants on v5e.

Follow-up to scripts/int8_xla_bench.py (which showed XLA's int8 lowering
runs at the 2× MXU rate): measures what that buys on the FULL flagship
model (deeplabv3plus_resnet50, OS=16, 512² tiles) by timing the serving
variants of infer/quantization.py:

  bf16           — native serving dtype (the round-2 headline path)
  int8_exec      — Pallas int8 1x1 convs (r2: ≈bf16 rate, kept as the
                   measured negative)
  int8_exec_xla  — XLA int8 convs, wide coverage (every dense conv with
                   >=64 input channels incl. 3x3/strided/dilated)

Timing: bench.py methodology — N dispatches ending in a 1-element host
fetch, amortizing the ~36 ms tunnel round trip; mask agreement vs bf16 is
reported alongside (speed without parity is meaningless).

  python scripts/int8_serving_bench.py [--batch 8] [--size 512] [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def time_loop(fn, x, steps, reps=3):
    import jax

    fn(x)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn(x)
        float(jax.tree.leaves(out)[0].ravel()[0])
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--output_stride", type=int, default=16, choices=(8, 16))
    ap.add_argument("--variants", default="bf16,int8_exec,int8_exec_xla")
    ap.add_argument("--grouped", action="store_true",
                    help="int8_exec_xla also routes grouped/depthwise convs "
                         "(resnext 3x3s, mobilenet/xception depthwise) — "
                         "bandwidth play, A/B against the default")
    ap.add_argument("--stem", action="store_true",
                    help="int8_exec_xla also routes the packed stem conv "
                         "(quantize-first int8; ops/int8_xla."
                         "int8_packed_stem_conv) — measured -17% on v5e "
                         "(BASELINE.md round-5 stem A/B)")
    ap.add_argument("--grouped_blockdiag", type=int, default=-1,
                    help="blockdiag gate for grouped convs (-1=auto: 256 on "
                         "resnext, 0 elsewhere; 0=off for A/Bs — "
                         "ModelConfig.grouped_blockdiag). BlockDiagConv "
                         "sites int8-route like dense convs")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from iswm_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from iswm_tpu.config import ModelConfig
    from iswm_tpu.data.transforms import val_transform_batch
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_variant_fn,
    )
    from iswm_tpu.models import build_model

    print(f"backend: {jax.default_backend()}")
    cfg = ModelConfig(backbone=args.backbone, compute_dtype="bfloat16",
                      output_stride=args.output_stride,
                      grouped_blockdiag=args.grouped_blockdiag)
    model = build_model(cfg)
    probe = jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(0)}, probe, train=False)
    )()
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    x = val_transform_batch(
        jnp.asarray(
            rng.integers(0, 255, (args.batch, args.size, args.size, 3)), jnp.uint8
        )
    ).astype(jnp.bfloat16)

    variants = args.variants.split(",")
    conv_scales = None
    if any(v.startswith("int8_exec") for v in variants):
        calib = [x[:1].astype(jnp.float32)]
        conv_scales = calibrate_conv_inputs(
            model, params, batch_stats, calib,
            wide=any(v == "int8_exec_xla" for v in variants),
            grouped=args.grouped, stem=args.stem,
        )
        print(f"calibrated {len(conv_scales)} conv sites")

    results = {}
    ref_preds = None
    for name in variants:
        # returned fn dispatches a jitted apply with the weight trees as
        # arguments (no weights-as-constants; infer/quantization.py)
        fn = make_variant_fn(
            model, batch_stats, params, name, conv_scales=conv_scales,
            grouped=args.grouped, stem=args.stem,
        )
        ms = time_loop(fn, x, args.steps) * 1e3
        tiles_s = args.batch / (ms * 1e-3)
        preds = np.asarray(fn(x)).argmax(-1)
        if ref_preds is None:
            ref_preds = preds
            agree = 1.0
        else:
            agree = float((preds == ref_preds).mean())
        n_routed = len(set(getattr(fn, "routed_sites", [])))
        results[name] = {
            "ms_per_batch": round(ms, 3),
            "tiles_per_s": round(tiles_s, 1),
            "mask_agreement_vs_first": round(agree, 5),
            "routed_sites": n_routed,
        }
        print(name, json.dumps(results[name]))

    print(json.dumps({"batch": args.batch, "size": args.size, **results},
                     indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
