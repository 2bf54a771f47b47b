"""Measure XLA-lowered int8 matmul/conv rates on v5e vs bf16.

VERDICT r2 item 1: the Pallas/Mosaic int8 lowering plateaus at ~24 TOP/s
(≈ the bf16 rate; BASELINE.md "int8 serving"), leaving the question of the
2× int8 MXU rate open from the XLA side.  This script measures
`lax.dot_general` / `lax.conv_general_dilated` with int8 operands and
`preferred_element_type=int32`, lowered by XLA itself (no Pallas), against
identical-shape bf16 programs.

Experiments (each is a `lax.scan` of L iterations inside one jit):
  square  — dependent chain c <- cast(dot(c, W)): [M,K]@[K,K], the pure
            rate probe (cast cost excluded via xplane per-op attribution)
  aspp    — the int8_exec production shape [B*32*32, 1280]@[1280, 256]
            (ASPP concat projection at 512²/OS=16), scan over L DISTINCT
            stacked weights so the dot cannot be loop-hoisted
  conv1x1 — same contraction expressed as a 1×1 NHWC conv
  conv3x3 — [8,128,128,128]→128 3×3 conv (layer2-ish shape)

Reported per experiment: wall ms/iter (honest host-fetch clock) and, when
--profile is set, the xplane per-op time of the dot/conv alone with the
implied TOP/s (TFLOP/s for bf16).

Run (ONE TPU job at a time, PYTHONPATH=/root/repo:/root/.axon_site):
  python scripts/int8_xla_bench.py [--profile] [--iters 50] [--reps 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import time

import numpy as np


def _chain_square(dtype, m, k, iters):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype == "int8":
        c0 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (k, k)), jnp.int8)

        def body(c, _):
            out = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # truncating cast back to int8 keeps the chain dependent;
            # its cost is excluded by per-op attribution
            return out.astype(jnp.int8), None
    else:
        c0 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k)) * 0.01, jnp.bfloat16)

        def body(c, _):
            out = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(jnp.bfloat16), None

    def fn():
        final, _ = jax.lax.scan(body, c0, None, length=iters)
        return final

    flops_per_iter = 2.0 * m * k * k
    return jax.jit(fn), flops_per_iter


def _chain_aspp(dtype, m, k, n, iters):
    """Fixed activation, L distinct weights (defeats loop hoisting)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        ws = jnp.asarray(rng.integers(-127, 128, (iters, k, n)), jnp.int8)
        acc0 = jnp.zeros((m, n), jnp.int32)
        pet = jnp.int32
    else:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        ws = jnp.asarray(rng.normal(size=(iters, k, n)) * 0.01, jnp.bfloat16)
        acc0 = jnp.zeros((m, n), jnp.float32)
        pet = jnp.float32

    def body(acc, w):
        out = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=pet
        )
        return acc + out, None

    def fn():
        final, _ = jax.lax.scan(body, acc0, ws)
        return final

    return jax.jit(fn), 2.0 * m * k * n


def _chain_conv(dtype, b, h, w_, cin, cout, ksize, iters):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 128, (b, h, w_, cin)), jnp.int8)
        ks = jnp.asarray(
            rng.integers(-127, 128, (iters, ksize, ksize, cin, cout)), jnp.int8
        )
        acc0 = jnp.zeros((b, h, w_, cout), jnp.int32)
        pet = jnp.int32
    else:
        x = jnp.asarray(rng.normal(size=(b, h, w_, cin)), jnp.bfloat16)
        ks = jnp.asarray(
            rng.normal(size=(iters, ksize, ksize, cin, cout)) * 0.01, jnp.bfloat16
        )
        acc0 = jnp.zeros((b, h, w_, cout), jnp.float32)
        pet = jnp.float32

    def body(acc, kernel):
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )
        return acc + out, None

    def fn():
        final, _ = jax.lax.scan(body, acc0, ks)
        return final

    return jax.jit(fn), 2.0 * b * h * w_ * cin * cout * ksize * ksize


def _chain_wgrad(dtype, b, h, w_, cin, cout, ksize, iters):
    """Weight-gradient conv: dw[kh,kw,I,O] = sum_{b,h,w} x·g.

    Expressed the way XLA's own conv-wgrad is: a conv whose batch dim is
    Cin (lhs_spec "CHWN"), contraction feature dim is B (rhs_spec "IHWO"),
    and output spatial extent is the kernel (window = g's spatial size).
    This is the bwd op whose int8 lowering rate is NOT implied by the fwd
    conv measurements (the window is the whole feature map, not 3×3).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pad = (ksize - 1) // 2
    # varying-operand trick without an [iters, ...] stack (too big for the
    # g tensor): slice g from a channel-padded buffer at a per-iter offset
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 128, (b, h, w_, cin)), jnp.int8)
        gbuf = jnp.asarray(
            rng.integers(-127, 128, (b, h, w_, cout + iters)), jnp.int8
        )
        acc0 = jnp.zeros((cin, ksize, ksize, cout), jnp.int32)
        pet = jnp.int32
    else:
        x = jnp.asarray(
            rng.standard_normal((b, h, w_, cin), dtype=np.float32), jnp.bfloat16
        )
        gbuf = jnp.asarray(
            rng.standard_normal((b, h, w_, cout + iters), dtype=np.float32)
            * 0.01,
            jnp.bfloat16,
        )
        acc0 = jnp.zeros((cin, ksize, ksize, cout), jnp.float32)
        pet = jnp.float32

    def body(acc, off):
        g = jax.lax.dynamic_slice(gbuf, (0, 0, 0, off), (b, h, w_, cout))
        dw = jax.lax.conv_general_dilated(
            x, g, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            preferred_element_type=pet,
        )
        return acc + dw, None

    def fn():
        final, _ = jax.lax.scan(body, acc0, jnp.arange(iters))
        return final

    return jax.jit(fn), 2.0 * b * h * w_ * cin * cout * ksize * ksize


def _chain_wgrad_dot(dtype, m, k, n, iters):
    """1×1-conv wgrad as a K-major dot: [M,K]ᵀ@[M,N] with M = B·H·W."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        gbuf = jnp.asarray(rng.integers(-127, 128, (m, n + iters)), jnp.int8)
        acc0 = jnp.zeros((k, n), jnp.int32)
        pet = jnp.int32
    else:
        x = jnp.asarray(
            rng.standard_normal((m, k), dtype=np.float32), jnp.bfloat16
        )
        gbuf = jnp.asarray(
            rng.standard_normal((m, n + iters), dtype=np.float32) * 0.01,
            jnp.bfloat16,
        )
        acc0 = jnp.zeros((k, n), jnp.float32)
        pet = jnp.float32

    def body(acc, off):
        g = jax.lax.dynamic_slice(gbuf, (0, off), (m, n))
        dw = jax.lax.dot_general(
            x, g, (((0,), (0,)), ((), ())), preferred_element_type=pet
        )
        return acc + dw, None

    def fn():
        final, _ = jax.lax.scan(body, acc0, jnp.arange(iters))
        return final

    return jax.jit(fn), 2.0 * m * k * n


def _chain_dgrad_s2(dtype, b, oh, ow, cin, cout, iters):
    """Input-gradient of a stride-2 1×1 conv: lhs_dilation=2 transposed
    conv (the downsample convs' bwd) — the other lowering the fwd tables
    don't cover."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    if dtype == "int8":
        g0 = jnp.asarray(rng.integers(-127, 128, (b, oh, ow, cout)), jnp.int8)
        ks = jnp.asarray(
            rng.integers(-127, 128, (iters, 1, 1, cout, cin)), jnp.int8
        )
        acc0 = jnp.zeros((b, oh * 2, ow * 2, cin), jnp.int32)
        pet = jnp.int32
    else:
        g0 = jnp.asarray(rng.normal(size=(b, oh, ow, cout)), jnp.bfloat16)
        ks = jnp.asarray(
            rng.normal(size=(iters, 1, 1, cout, cin)) * 0.01, jnp.bfloat16
        )
        acc0 = jnp.zeros((b, oh * 2, ow * 2, cin), jnp.float32)
        pet = jnp.float32

    def body(acc, kernel):
        dx = jax.lax.conv_general_dilated(
            g0, kernel, (1, 1), [(0, 1), (0, 1)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )
        return acc + dx, None

    def fn():
        final, _ = jax.lax.scan(body, acc0, ks)
        return final

    return jax.jit(fn), 2.0 * b * oh * ow * cout * cin


def _time(fn, reps):
    import jax

    fn()  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jax.tree.leaves(out)[0].ravel()[0].astype(np.float32))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _profile_dot_ms(fn, trace_dir):
    """Run once under the profiler; return {hlo_category: total_ms} for
    convolution/dot ops on the TPU plane."""
    import jax

    with jax.profiler.trace(trace_dir):
        out = fn()
        float(jax.tree.leaves(out)[0].ravel()[0].astype(np.float32))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return {}
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = collections.defaultdict(float)
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        smeta = {k: v.name for k, v in p.stat_metadata.items()}
        cat = {}
        for k, v in p.event_metadata.items():
            for s in v.stats:
                if smeta.get(s.metadata_id, "") == "hlo_category":
                    cat[k] = s.str_value
        for line in p.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                c = cat.get(ev.metadata_id, "")
                if c:
                    agg[c] += ev.duration_ps / 1e9  # ps -> ms
    return dict(agg)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/int8_xla_trace")
    ap.add_argument("--only", default=None, help="substring filter on exp name")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from iswm_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")

    experiments = []
    for dt in ("bf16", "int8"):
        experiments += [
            (f"square_{dt}", *_chain_square(dt, 4096, 2048, args.iters)),
            (f"aspp_{dt}", *_chain_aspp(dt, 8192, 1280, 256, args.iters)),
            (f"conv1x1_{dt}", *_chain_conv(dt, 8, 32, 32, 1280, 256, 1, args.iters)),
            (f"conv3x3_{dt}", *_chain_conv(dt, 8, 128, 128, 128, 128, 3, args.iters)),
            # backward-pass lowerings (round-3 int8-bwd question): the
            # stride-1 dgrad is itself a plain conv (covered above); these
            # are the two bwd-only shapes — wgrad (window = feature map)
            # and strided dgrad (lhs_dilation transposed conv)
            (f"wgrad3x3_{dt}", *_chain_wgrad(dt, 8, 128, 128, 128, 128, 3, args.iters)),
            (f"wgrad1x1dot_{dt}", *_chain_wgrad_dot(dt, 131072, 256, 256, args.iters)),
            (f"dgrad1x1s2_{dt}", *_chain_dgrad_s2(dt, 8, 64, 64, 256, 512, args.iters)),
        ]

    results = {}
    for name, fn, flops in experiments:
        if args.only and args.only not in name:
            continue
        wall = _time(fn, args.reps)
        per_iter_ms = wall / args.iters * 1e3
        tops_wall = flops / (per_iter_ms * 1e-3) / 1e12
        row = {"wall_ms_per_iter": round(per_iter_ms, 4),
               "tops_wall": round(tops_wall, 2)}
        if args.profile:
            cats = _profile_dot_ms(fn, os.path.join(args.trace_dir, name))
            # TPU xplane categorizes the fused matmul/conv as
            # "convolution fusion"; wall-clock through the tunneled backend
            # is dominated by the ~36 ms dispatch round trip, so the xplane
            # per-op rate is the honest number here.
            dot_ms = sum(v for k, v in cats.items()
                         if "conv" in k or k == "dot")
            if dot_ms:
                row["xplane_dot_ms_per_iter"] = round(dot_ms / args.iters, 4)
                row["tops_xplane"] = round(
                    flops / (dot_ms / args.iters * 1e-3) / 1e12, 2
                )
            row["xplane_categories_ms"] = {
                k: round(v, 3) for k, v in sorted(cats.items())
            }
        results[name] = row
        print(name, json.dumps(row))

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
