"""Whole-scene inference demo.

Generates a large synthetic Himawari-like scene, runs the batched
sliding-window TileEngine over it, and writes the prediction products —
the workflow that replaces the reference's one-image-at-a-time predict.py.

    PYTHONPATH=. python examples/whole_scene_demo.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--scene", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--tile_batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=1,
                    help="steady-state timing repetitions (median reported)")
    ap.add_argument("--no_products", action="store_true",
                    help="skip writing PNGs (pure throughput run)")
    ap.add_argument("--device_clock", action="store_true",
                    help="also report device-side s/scene: time the tile "
                         "engine's on-device program ending in a 1-element "
                         "probe, excluding the full-probs D2H fetch (a "
                         "tunnel artifact on this box, see BASELINE.md)")
    ap.add_argument("--serving_variant", default=None,
                    choices=("bf16", "int8", "int8_exec", "int8_exec_xla"),
                    help="serving precision (int8_exec_xla = executed int8 "
                         "convs at the 2x MXU rate; calibrates on the first "
                         "scene)")
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from PIL import Image

    from iswm_tpu.config import Config
    from iswm_tpu.data.synthetic import generate_scene
    from iswm_tpu.infer import Predictor

    rng = np.random.default_rng(0)
    # assemble a large scene by tiling generator outputs (the generator makes
    # wave packets at ~200px scale; a mosaic gives realistic scene statistics)
    cell = 256
    n = args.scene // cell
    scene = np.zeros((n * cell, n * cell, 3), np.uint8)
    gt = np.zeros((n * cell, n * cell), np.uint8)
    for i in range(n):
        for j in range(n):
            img, mask = generate_scene(rng, size=(cell, cell), wave_probability=0.5)
            scene[i * cell : (i + 1) * cell, j * cell : (j + 1) * cell] = img
            gt[i * cell : (i + 1) * cell, j * cell : (j + 1) * cell] = mask

    cfg = Config()
    cfg.model.backbone = "resnet50"
    if args.platform == "cpu":
        cfg.model.backbone = "resnet18"
        cfg.model.compute_dtype = "float32"
    cfg.predict.tile_size = args.tile
    cfg.predict.tile_overlap = args.tile // 8
    cfg.predict.tile_batch = args.tile_batch
    cfg.predict.save_confidence = True
    if args.serving_variant:
        cfg.predict.serving_variant = args.serving_variant

    predictor = Predictor(cfg, ckpt_path=args.ckpt)
    t0 = time.time()
    products = predictor.predict_image(scene)
    dt_cold = time.time() - t0
    times = []
    for _ in range(max(1, args.reps)):
        t0 = time.time()
        products = predictor.predict_image(scene)  # steady state (compiled)
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    h, w = scene.shape[:2]
    print(
        f"scene {h}x{w} -> {dt:.2f}s steady-state "
        f"({h * w / dt / 1e6:.1f} MPix/s; first call incl. compile {dt_cold:.1f}s)"
    )
    if args.device_clock:
        # device-side clock: the engine program (normalize is outside it,
        # matching the BASELINE.md "device-side" rows), honest 1-element
        # probe instead of the full probs fetch
        from iswm_tpu.data.transforms import val_transform_batch
        import jax.numpy as jnp

        x = val_transform_batch(jnp.asarray(scene)[None])[0]
        logits = predictor.engine.infer_scene(x)
        float(logits[0, 0, 0])  # warm (already compiled by predict_image)
        dev_times = []
        for _ in range(max(1, args.reps)):
            t0 = time.time()
            logits = predictor.engine.infer_scene(x)
            float(logits[0, 0, 0])
            dev_times.append(time.time() - t0)
        ddt = sorted(dev_times)[len(dev_times) // 2]
        print(
            f"device-side: {ddt:.3f}s/scene ({h * w / ddt / 1e6:.1f} MPix/s)"
        )
    try:  # device memory behavior (peak bytes), where the backend reports it
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"device peak memory: {peak / 1e9:.2f} GB "
                  f"(in use now: {stats.get('bytes_in_use', 0) / 1e9:.2f} GB)")
    except Exception:
        pass

    if args.no_products:
        return 0
    os.makedirs(args.out, exist_ok=True)
    Image.fromarray(scene).save(os.path.join(args.out, "scene.png"))
    Image.fromarray(gt * 255).save(os.path.join(args.out, "gt.png"))
    Image.fromarray(products["rgb"]).save(os.path.join(args.out, "predict.png"))
    Image.fromarray(products["confidence"]).save(
        os.path.join(args.out, "confidence.png")
    )
    print(f"products -> {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
