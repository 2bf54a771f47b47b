"""Aggregate the latest xplane trace into a per-source-op compute table.

Reads the newest logs/profile/**/*.xplane.pb, sums XLA-Ops-line durations
per (hlo_category, jax op path), and prints ms/step with achieved TFLOP/s
and GB/s per op.  Run CPU-only: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
python scripts/attribution.py [--steps 5] [--top 50] [--grep stem]
"""

from __future__ import annotations

import argparse
import collections
import glob
import re
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--grep", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dir", default="logs/profile")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{args.dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane found"); return 1
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    out_lines = [f"# {paths[-1]}"]
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        smeta = {k: v.name for k, v in p.stat_metadata.items()}
        info = {}
        for k, v in p.event_metadata.items():
            st = {}
            for s in v.stats:
                st[smeta.get(s.metadata_id, "")] = (
                    s.str_value if s.str_value else (s.int64_value or s.double_value)
                )
            info[k] = st
        agg = collections.defaultdict(lambda: [0, 0, 0, 0])
        total = tot_flops = 0
        for l in p.lines:
            if l.name != "XLA Ops":
                continue
            for ev in l.events:
                st = info.get(ev.metadata_id, {})
                cat = st.get("hlo_category", "?")
                if cat in ("copy-start", "async-start", "copy-done", "async-done"):
                    continue
                key = re.sub(r"jit\(step_fn\)/", "", str(st.get("tf_op", "?")))
                a = agg[(cat, key)]
                a[0] += ev.duration_ps
                a[1] += int(st.get("flops") or 0)
                a[2] += int(st.get("bytes_accessed") or 0)
                a[3] += 1
                total += ev.duration_ps
                tot_flops += int(st.get("flops") or 0)
        S = args.steps
        out_lines.append(
            f"total XLA-Ops compute: {total/1e9/S:.2f} ms/step, "
            f"{tot_flops/S/1e9:.0f} GFLOP/step, "
            f"{tot_flops/(total/1e12)/1e12:.1f} TFLOP/s achieved"
        )
        out_lines.append(f"{'ms/step':>8} {'pct':>5} {'TFLOP/s':>8} {'GB/s':>7} {'n':>3}  op")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        shown = 0
        for (cat, key), (dur, fl, by, n) in rows:
            if args.grep and args.grep not in key and args.grep not in cat:
                continue
            ms = dur / 1e9 / S
            tf = fl / (dur / 1e12) / 1e12 if dur else 0
            gbs = by / (dur / 1e12) / 1e9 if dur else 0
            out_lines.append(
                f"{ms:8.3f} {100*dur/total:5.1f} {tf:8.1f} {gbs:7.0f} {n:3d}  "
                f"[{cat}] {key[:115]}"
            )
            shown += 1
            if shown >= args.top:
                break

    text = "\n".join(out_lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
