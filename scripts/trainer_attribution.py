"""Attribute end-to-end train-CLI throughput to its components (round 5).

The round-4 logs showed CLI img/s readings of 62-235 for the SAME device
program (logs/r4b_queue.log) — swings that cannot be device truth.  This
script splits one trainer-geometry run into the pieces the CLI number
mixes together, on one clock, so BASELINE.md can state which number is
the framework claim:

  1. loader-only rate  — host PNG decode + batch assembly + device_put,
     no device compute (both cold first-epoch decode and warm cached);
  2. device-only rate  — the jitted train step on a resident batch,
     100-step dependent chain ending in a host fetch (bench.py's honest
     clock — the device truth);
  3. trainer-loop rate — the real fit() data path (prefetch thread +
     device step + loss drain), instrumented per-step into
     (wait-for-batch, dispatch, drain) wall-clock buckets.

Run on an IDLE host (CLAUDE.md: the 1-core host starves the dispatch
loop under concurrent CPU load — that starvation is exactly what this
script quantifies).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trainer_attribution.py \
      [--steps 200] [--crop 200] [--batch 32] [--train_size 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--crop", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train_size", type=int, default=1024,
                    help="synthetic scene count (the IW-CE study runs used "
                         "the 64-file default; the real dataset has 4880 "
                         "train scenes — pick a size that makes the first "
                         "epoch's cold-decode share realistic)")
    ap.add_argument("--device_steps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iswm_tpu.config import Config
    from iswm_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config()
    cfg.model.backbone = "resnet50"
    cfg.model.output_stride = 16
    cfg.data.synthetic = True
    cfg.data.data_root = "/tmp/trainer_attr/data"
    cfg.data.synthetic_train_size = args.train_size
    cfg.data.synthetic_val_size = 16
    cfg.data.synthetic_image_size = args.crop
    cfg.data.crop_size = args.crop
    cfg.data.batch_size = args.batch
    cfg.loss.loss_type = "ce_loss"  # no class-weight pass; isolate the loop
    cfg.train.total_itrs = args.steps
    cfg.train.val_interval = 10 * args.steps  # no validation inside the window
    cfg.train.print_interval = 10 * args.steps
    cfg.train.checkpoints_dir = "/tmp/trainer_attr/ckpt"
    cfg.train.val_results_dir = "/tmp/trainer_attr/val"
    cfg.train.metrics_plots_dir = "/tmp/trainer_attr/plots"
    cfg.train.log_dir = "/tmp/trainer_attr/logs"

    from iswm_tpu.data import batch_iterator
    from iswm_tpu.data.loader import device_prefetch_iterator
    from iswm_tpu.train import Trainer

    print("== building trainer (data gen + init + first compile) ==")
    t0 = time.perf_counter()
    trainer = Trainer(cfg)
    print(f"build: {time.perf_counter() - t0:.1f}s")

    # ---------------------------------------------------- 1. loader-only
    def loader_rate(tag: str) -> float:
        it = device_prefetch_iterator(
            batch_iterator(trainer.train_ds, args.batch, shuffle=True,
                           drop_last=True, seed=1, epochs=None),
            mesh=trainer.mesh, depth=cfg.data.num_workers // 2 or 2,
        )
        n = args.steps
        t0 = time.perf_counter()
        for _ in range(n):
            images, labels = next(it)
        jax.block_until_ready(images)
        dt = time.perf_counter() - t0
        rate = n * args.batch / dt
        print(f"loader-only ({tag}): {rate:.1f} img/s "
              f"({dt / n * 1e3:.2f} ms/batch)")
        return rate

    # cold: includes first-epoch PNG decode (cache_in_memory fills);
    # warm: decoded arrays served from host RAM
    cold = loader_rate("cold: first-epoch PNG decode")
    warm = loader_rate("warm: cached arrays")

    # ---------------------------------------------------- 2. device-only
    # one device-resident loader batch (uint8 + device augment — the SAME
    # program the fit loop runs), stepped in a dependent chain: the device
    # truth for this geometry.
    # NOTE: the batch must be re-fed as PLAIN committed device arrays.
    # Re-feeding the same mesh-sharded (NamedSharding) arrays into a
    # dependent chain costs ~1.3 s/step through the tunneled backend
    # (isolated in scripts/dispatch_anomaly_probe.py: sharded-re-fed
    # 1314.5 ms/step vs 19.0 plain / 20.7 fresh sharded batches) — the
    # round-5 attribution run's 462 ms/step "device-only" row was this
    # artifact, not device truth.
    it0 = device_prefetch_iterator(
        batch_iterator(trainer.train_ds, args.batch, shuffle=True,
                       drop_last=True, seed=3, epochs=None),
        mesh=trainer.mesh, depth=2,
    )
    images, labels = next(it0)
    images = jax.device_put(np.asarray(jax.device_get(images)))
    labels = jax.device_put(np.asarray(jax.device_get(labels)))
    state = trainer.state
    # warm-up / compile
    state, m = trainer.train_step(state, images, labels, trainer.rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.device_steps):
        state, m = trainer.train_step(state, images, labels, trainer.rng)
    float(m["loss"])  # honest clock: host fetch
    dt = time.perf_counter() - t0
    device_rate = args.device_steps * args.batch / dt
    print(f"device-only: {device_rate:.1f} img/s "
          f"({dt / args.device_steps * 1e3:.2f} ms/step, "
          f"{args.device_steps}-step dependent chain + host fetch)")

    # ------------------------------------------------- 3. trainer loop
    # the real fit() data path, instrumented: wait-for-batch vs dispatch
    # vs loss-drain buckets.  Dispatch on this backend is asynchronous;
    # the whole pipeline's throughput shows up as wait time somewhere —
    # the buckets attribute WHERE.
    it = device_prefetch_iterator(
        batch_iterator(trainer.train_ds, args.batch, shuffle=True,
                       drop_last=True, seed=2, epochs=None),
        mesh=trainer.mesh, depth=cfg.data.num_workers // 2 or 2,
    )
    # continue from the section-2 state: the train step DONATES its state
    # argument, so trainer.state's buffers were consumed by the first call
    # warm-up: loader batches are uint8 (a different program than the bf16
    # batch of section 2 — the uint8 normalize fuses into the augment);
    # compile it OUTSIDE the timed window
    images, labels = next(it)
    state, m = trainer.train_step(state, images, labels, trainer.rng)
    float(m["loss"])
    wait = disp = drain = 0.0
    pending = []
    n = args.steps
    t_all = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        images, labels = next(it)
        t1 = time.perf_counter()
        state, m = trainer.train_step(state, images, labels, trainer.rng)
        t2 = time.perf_counter()
        pending.append(m["loss"])
        if (i + 1) % 100 == 0:
            float(np.sum(jax.device_get(pending)))
            pending.clear()
        t3 = time.perf_counter()
        wait += t1 - t0
        disp += t2 - t1
        drain += t3 - t2
    if pending:
        float(np.sum(jax.device_get(pending)))
    total = time.perf_counter() - t_all
    loop_rate = n * args.batch / total
    rem = total - wait - disp - drain  # final pending-drain: device time
    # the async dispatches enqueued but the intra-loop drains didn't absorb
    print(
        f"trainer-loop: {loop_rate:.1f} img/s over {n} steps "
        f"({total / n * 1e3:.2f} ms/step wall)\n"
        f"  wait-for-batch {wait / n * 1e3:.2f} ms/step "
        f"({wait / total * 100:.0f}%)\n"
        f"  dispatch       {disp / n * 1e3:.2f} ms/step "
        f"({disp / total * 100:.0f}%)\n"
        f"  loss drain     {drain / n * 1e3:.2f} ms/step "
        f"({drain / total * 100:.0f}%)\n"
        f"  tail drain     {rem / n * 1e3:.2f} ms/step "
        f"({rem / total * 100:.0f}%)"
    )

    print(json.dumps({
        "metric": f"trainer attribution {args.crop}2/bs{args.batch} resnet50",
        "loader_cold_img_s": round(cold, 1),
        "loader_warm_img_s": round(warm, 1),
        "device_only_img_s": round(device_rate, 1),
        "trainer_loop_img_s": round(loop_rate, 1),
        "wait_ms": round(wait / n * 1e3, 2),
        "dispatch_ms": round(disp / n * 1e3, 2),
        "drain_ms": round(drain / n * 1e3, 2),
        "tail_drain_ms": round(rem / n * 1e3, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
