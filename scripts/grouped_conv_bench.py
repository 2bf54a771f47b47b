"""Measure XLA grouped-conv lowerings on v5e: native vs block-diag vs batched dot.

The resnext50_32x4d train profile (logs/profile/attribution_resnext.txt)
shows the grouped 3x3 convs running at 1.3-12 TFLOP/s while the dense
convs in the same step hit 130-190 — XLA's grouped-conv lowering, not the
hardware, is the bottleneck (ROADMAP round-4 outlook item 4).  This
microbench A/Bs the candidate re-expressions on the two representative
shapes (forward only; the profile shows the backward is worse in the same
pattern):

  native    — lax.conv_general_dilated(feature_group_count=G)
  blockdiag — the SAME math as one dense conv with a block-diagonal
              kernel (zeros off-diagonal): G x the FLOPs at the dense rate
  batched   — im2col patches + per-group dot_general with the group axis
              as a batch dimension

All variants compute identical outputs (asserted once per shape).  The
clock is an honest host fetch after a lax.scan of --iters dependent*
iterations (*weights vary per step so nothing loop-hoists); TFLOP/s are
reported against the GROUPED FLOP count for all variants so the column
is time-comparable (blockdiag burns G x the MACs for the same math).

Run (ONE TPU job at a time): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/grouped_conv_bench.py [--iters 30] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# (name, N, H, W, C, G): resnext50_32x4d layer1/layer4 conv2 shapes at the
# 200x200/bs32 train geometry of the profile
SHAPES = [
    ("layer1_conv2", 32, 50, 50, 128, 32),
    ("layer4_conv2", 32, 13, 13, 1024, 32),
]


def _variants(n, h, w, c, g):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)) * 0.1, jnp.bfloat16)
    # [3, 3, C/G, C] HWIO grouped kernel
    k = jnp.asarray(rng.normal(size=(3, 3, c // g, c)) * 0.05, jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=g,
        )

    # dense block-diagonal kernel: out channel o in group o//(C/G) reads
    # only that group's inputs
    cg = c // g
    dense_k = jnp.zeros((3, 3, c, c), jnp.bfloat16)
    for gi in range(g):
        dense_k = dense_k.at[:, :, gi * cg : (gi + 1) * cg,
                             gi * cg : (gi + 1) * cg].set(
            k[:, :, :, gi * cg : (gi + 1) * cg]
        )

    def blockdiag(x, dk):
        return jax.lax.conv_general_dilated(
            x, dk, (1, 1), "SAME", dimension_numbers=dn,
        )

    # batched dot: im2col to [G, N*H*W, 9*C/G] x [G, 9*C/G, C/G]
    def batched(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # taps stacked on a new leading axis -> [9, N, H, W, C]
        taps = jnp.stack(
            [xp[:, dy : dy + h, dx : dx + w, :]
             for dy in range(3) for dx in range(3)], axis=0
        )
        # -> [G, N*H*W, 9*C/G]
        lhs = (
            taps.reshape(9, n * h * w, g, cg)
            .transpose(2, 1, 0, 3)
            .reshape(g, n * h * w, 9 * cg)
        )
        # kernel [3,3,C/G,C] -> [G, 9*C/G, C/G]
        rhs = (
            k.reshape(9, cg, g, cg)
            .transpose(2, 0, 1, 3)
            .reshape(g, 9 * cg, cg)
        )
        out = jax.lax.dot_general(
            lhs, rhs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, N*H*W, C/G]
        return (
            out.transpose(1, 0, 2)
            .reshape(n, h, w, c)
            .astype(jnp.bfloat16)
        )

    return x, k, dense_k, native, blockdiag, batched


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    results = {}
    for name, n, h, w, c, g in SHAPES:
        x, k, dense_k, native, blockdiag, batched = _variants(n, h, w, c, g)
        gflop_grouped = 2 * n * h * w * 9 * (c // g) * c / 1e9

        # correctness: all three agree (bf16 tolerance)
        ref = np.asarray(native(x, k), np.float32)
        for vname, out in (
            ("blockdiag", blockdiag(x, dense_k)),
            ("batched", batched(x, k)),
        ):
            got = np.asarray(out, np.float32)
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
            assert err < 0.05, f"{name}/{vname} rel err {err}"

        row = {}
        for vname, fn, weight in (
            ("native", native, k),
            ("blockdiag", blockdiag, dense_k),
            ("batched", batched, k),
        ):
            def step(carry, wi):
                # scale the weight per iteration so the conv cannot hoist
                out = fn(carry, weight * wi)
                return out.astype(jnp.bfloat16), None

            @jax.jit
            def run(x0, scales):
                y, _ = jax.lax.scan(step, x0, scales)
                return y[0, 0, 0, 0]

            scales = jnp.linspace(0.99, 1.01, args.iters, dtype=jnp.bfloat16)
            float(run(x, scales))  # compile + warm
            best = min(
                (lambda t0: (float(run(x, scales)), time.perf_counter() - t0))(
                    time.perf_counter()
                )[1]
                for _ in range(args.reps)
            )
            ms = best / args.iters * 1e3
            row[vname] = {
                "ms": round(ms, 3),
                "grouped_tflops": round(gflop_grouped / ms, 1),
            }
        results[name] = row
        print(name, json.dumps(row))

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
