"""Summarize the round-4 multi-seed int8_bwd accuracy study.

Reads each run's JSONL metric log under <root>/<tag>/logs/metrics.jsonl
(tag = {loss}_s{seed}_{bf16|int8}), extracts the weighted-score
trajectory, and prints per-seed best-weighted deltas plus mean +/- SD —
the honest statistic the r3 single-draw claim lacked.

  python scripts/r4_int8_ab_parse.py /tmp/ab_r4
"""

from __future__ import annotations

import glob
import json
import os
import sys


def trajectory(tag_dir: str) -> list:
    path = os.path.join(tag_dir, "logs", "metrics.jsonl")
    scores = []
    if not os.path.exists(path):
        return scores
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "weighted_score" in rec:
                scores.append((rec.get("step"), float(rec["weighted_score"])))
    return scores


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_r4"
    pairs = {}
    for d in sorted(glob.glob(os.path.join(root, "*_s*_*"))):
        tag = os.path.basename(d)
        loss, seed, mode = tag.rsplit("_", 2)[0], tag.split("_s")[1].split("_")[0], tag.rsplit("_", 1)[1]
        traj = trajectory(d)
        if not traj:
            print(f"{tag}: NO TRAJECTORY")
            continue
        best = max(s for _, s in traj)
        final = traj[-1][1]
        pairs.setdefault((loss, seed), {})[mode] = (best, final, traj)
        print(f"{tag}: best={best:.4f} final={final:.4f} "
              f"traj={' '.join(f'{s:.3f}' for _, s in traj)}")

    deltas = []
    for (loss, seed), arms in sorted(pairs.items()):
        if "bf16" in arms and "int8" in arms:
            d = arms["int8"][0] - arms["bf16"][0]
            deltas.append((loss, seed, d))
            print(f"[{loss} seed {seed}] best-weighted delta (int8 - bf16): {d:+.4f}")
    if deltas:
        import statistics

        vals = [d for _, _, d in deltas]
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals) if len(vals) > 1 else float("nan")
        print(f"\nacross {len(vals)} pairs: mean delta {mean:+.4f} +/- {sd:.4f} SD")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
