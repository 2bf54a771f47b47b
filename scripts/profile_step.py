"""Op-level profile of the 512x512 train step on the real TPU.

Captures a jax.profiler trace of a few steady-state train steps, then
parses the xplane with tensorboard_plugin_profile to print the op-level
time breakdown (the evidence VERDICT r1 asked for).  Trace artifacts land
under logs/profile/ (checked in: the summarized op table, not the raw pb).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build  # noqa: E402

LOGDIR = os.path.join(os.path.dirname(__file__), "..", "logs", "profile")


def _parse_args():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--eval", action="store_true",
                    help="profile the eval step instead of the train step")
    ap.add_argument("--int8", action="store_true",
                    help="profile the int8_exec_xla serving variant")
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    return ap.parse_args()


def main() -> int:
    args = _parse_args()
    profile_eval = args.eval
    profile_int8 = args.int8
    backbone = args.backbone
    batch = args.batch
    size = args.size
    state, train_step, eval_step, images, labels, rng = build(
        batch, size, backbone
    )

    if profile_int8:
        from iswm_tpu.config import Config
        from iswm_tpu.infer.quantization import (
            calibrate_conv_inputs,
            make_variant_fn,
        )
        from iswm_tpu.models import build_model

        cfg = Config()
        cfg.model.backbone = backbone
        model = build_model(cfg.model)
        scales = calibrate_conv_inputs(
            model, state.params, state.batch_stats,
            [images[:1].astype(jnp.float32)], wide=True,
        )
        q_fn = make_variant_fn(
            model, state.batch_stats, state.params, "int8_exec_xla",
            conv_scales=scales,
        )
        float(np.asarray(q_fn(images)).ravel()[0])  # warm/compile
        os.makedirs(LOGDIR, exist_ok=True)
        jax.profiler.start_trace(LOGDIR)
        out = None
        for _ in range(5):
            out = q_fn(images)
        float(np.asarray(out).ravel()[0])  # honest clock: host fetch
        jax.profiler.stop_trace()
    else:
        # warm up / compile
        if profile_eval:
            ev = eval_step(state.params, state.batch_stats, images)
            float(np.asarray(ev["preds"]).ravel()[0])
        else:
            state, m = train_step(state, images, labels, rng)
            float(m["loss"])

        os.makedirs(LOGDIR, exist_ok=True)
        jax.profiler.start_trace(LOGDIR)
        if profile_eval:
            ev = None
            for _ in range(5):
                ev = eval_step(state.params, state.batch_stats, images)
            float(np.asarray(ev["preds"]).ravel()[0])  # honest clock: host fetch
        else:
            for _ in range(5):
                state, m = train_step(state, images, labels, rng)
            float(m["loss"])  # honest clock: host fetch
        jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                               recursive=True), key=os.path.getmtime)
    if not xplanes:
        print("NO XPLANE CAPTURED — tunnel backend may not support device trace")
        return 1
    xplane = xplanes[-1]
    print(f"xplane: {xplane} ({os.path.getsize(xplane)} bytes)")

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:csv;"}
    for tool in ("op_profile", "framework_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], tool, params)
        except Exception as e:
            print(f"--- {tool}: FAILED ({type(e).__name__}: {e})")
            continue
        out = os.path.join(LOGDIR, f"{tool}.out")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"--- {tool}: wrote {out} ({len(data)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
