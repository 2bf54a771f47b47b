"""Probe the 462 ms/step "device-only" anomaly from trainer_attribution.

Round-5 finding (logs/r5_queue.log stage 2): a 100-step dependent chain
of the jitted train step, re-feeding the SAME device-resident batch and
ending in one host fetch, read 462 ms/step — 25x the ~18 ms device truth
that bench.py and the instrumented fit-loop (fresh batches) both see at
the same geometry.  This probe isolates which ingredient triggers it:

  A. bench.py's exact form: plain jnp device arrays, 3 reps x N steps,
     median  (expected ~18 ms)
  B. single window, same plain arrays (tests median-of-3 vs one window)
  C. single window, mesh-sharded arrays from device_prefetch_iterator
     re-fed every step  (the attribution section-2 form — the anomaly)
  D. single window, fresh mesh-sharded batches each step (the fit form)

Run on an idle host: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/dispatch_anomaly_probe.py [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--crop", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import numpy as np

    from iswm_tpu.config import Config
    from iswm_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config()
    cfg.model.backbone = "resnet50"
    cfg.data.synthetic = True
    cfg.data.data_root = "/tmp/trainer_attr/data"  # reuse attribution's tree
    cfg.data.synthetic_train_size = 64
    cfg.data.synthetic_val_size = 8
    cfg.data.synthetic_image_size = args.crop
    cfg.data.crop_size = args.crop
    cfg.data.batch_size = args.batch
    cfg.loss.loss_type = "ce_loss"
    cfg.train.total_itrs = 10
    cfg.train.checkpoints_dir = "/tmp/probe/ckpt"
    cfg.train.val_results_dir = "/tmp/probe/val"
    cfg.train.metrics_plots_dir = "/tmp/probe/plots"
    cfg.train.log_dir = "/tmp/probe/logs"

    from iswm_tpu.data import batch_iterator
    from iswm_tpu.data.loader import device_prefetch_iterator
    from iswm_tpu.train import Trainer

    trainer = Trainer(cfg)
    n = args.steps

    def chain(state, images, labels, steps):
        m = None
        for _ in range(steps):
            state, m = trainer.train_step(state, images, labels, trainer.rng)
        return state, m

    def fetch(m):
        return float(m["loss"])

    # one prefetch batch (mesh-sharded device arrays, the fit-loop input)
    it = device_prefetch_iterator(
        batch_iterator(trainer.train_ds, args.batch, shuffle=True,
                       drop_last=True, seed=1, epochs=None),
        mesh=trainer.mesh, depth=2,
    )
    sharded_images, sharded_labels = next(it)
    # the same batch as plain committed device arrays (bench.py's form)
    plain_images = jax.device_put(np.asarray(jax.device_get(sharded_images)))
    plain_labels = jax.device_put(np.asarray(jax.device_get(sharded_labels)))

    state = trainer.state
    # compile + warm (uint8 loader batch program)
    state, m = trainer.train_step(state, sharded_images, sharded_labels,
                                  trainer.rng)
    fetch(m)
    state, m = trainer.train_step(state, plain_images, plain_labels,
                                  trainer.rng)
    fetch(m)

    results = {}

    # A: bench form — plain arrays, 3 reps, median
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = chain(state, plain_images, plain_labels, n)
        fetch(m)
        times.append((time.perf_counter() - t0) / n)
    results["A plain arrays, median of 3"] = float(np.median(times)) * 1e3

    # B: plain arrays, single window
    t0 = time.perf_counter()
    state, m = chain(state, plain_images, plain_labels, n)
    fetch(m)
    results["B plain arrays, one window"] = (time.perf_counter() - t0) / n * 1e3

    # C: mesh-sharded arrays re-fed (the attribution anomaly form)
    t0 = time.perf_counter()
    state, m = chain(state, sharded_images, sharded_labels, n)
    fetch(m)
    results["C sharded arrays re-fed"] = (time.perf_counter() - t0) / n * 1e3

    # D: fresh sharded batch per step (the fit-loop form)
    t0 = time.perf_counter()
    for _ in range(n):
        images, labels = next(it)
        state, m = trainer.train_step(state, images, labels, trainer.rng)
    fetch(m)
    results["D fresh sharded batches"] = (time.perf_counter() - t0) / n * 1e3

    for k, v in results.items():
        print(f"{k}: {v:.2f} ms/step")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
