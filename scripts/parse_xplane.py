"""Aggregate a jax.profiler xplane trace into an op-level time table.

Standalone replacement for tensorboard_plugin_profile (whose pywrap bridge
mismatches this box's TF build): parses the XSpace proto, finds the TPU
device plane, and sums event durations by HLO op name / category.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parse_xplane.py \
            [xplane.pb] [--out logs/profile/op_table.txt]
"""

from __future__ import annotations

import argparse
import collections
import glob
import re
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def stat_value(stat, meta):
    name = meta.get(stat.metadata_id, "")
    for field in ("str_value", "ref_value", "int64_value", "uint64_value",
                  "double_value"):
        v = getattr(stat, field)
        if field == "ref_value":
            continue
        if v:
            return name, v
    return name, None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane", nargs="?", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    path = args.xplane or sorted(
        glob.glob("logs/profile/**/*.xplane.pb", recursive=True)
    )[-1]
    xs = load_xspace(path)

    lines_out = [f"# op-level profile from {path}"]
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        smeta = {k: v.name for k, v in plane.stat_metadata.items()}
        # per-event-metadata stats: hlo_category lives there in device planes
        emeta_stats = {}
        for k, v in plane.event_metadata.items():
            cat = None
            for st in v.stats:
                nm, val = stat_value(st, smeta)
                if nm == "hlo_category":
                    cat = val
            emeta_stats[k] = cat

        by_name = collections.Counter()
        by_cat = collections.Counter()
        n_events = 0
        total_ps = 0
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps
                n_events += 1
                total_ps += dur
                by_name[name] += dur
                cat = emeta_stats.get(ev.metadata_id)
                if cat is None:
                    # heuristic category from the HLO name
                    base = re.split(r"[.\d]", name, 1)[0]
                    cat = base
                by_cat[cat] += dur

        if not n_events:
            continue
        lines_out.append(
            f"\n== PLANE {plane.name}: {n_events} events, "
            f"{total_ps / 1e9:.3f} ms total =="
        )
        lines_out.append("\n-- by category --")
        for cat, ps in by_cat.most_common(25):
            lines_out.append(
                f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  {cat}"
            )
        lines_out.append(f"\n-- top {args.top} ops --")
        for name, ps in by_name.most_common(args.top):
            lines_out.append(
                f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  {name[:140]}"
            )

    text = "\n".join(lines_out)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
