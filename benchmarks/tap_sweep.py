#!/usr/bin/env python
"""Sweep the _blocked_taps schedule knobs on the real 4K flagship kernel.

One process, one tunnel window: each variant re-traces (the knobs are
read at trace time), so deltas are window-comparable.  Variants:

  base          shipped schedule (sub=128, 8 stripes, no pairing)
  nomul         TIMING-ONLY: tap multiplies dropped.  base - nomul is
                the cost of the muls: ~0 means Mosaic fuses mul+add into
                one VPU op (then pairing can't pay); large means muls
                issue separately (then symmetric pairing saves ~25%).
  pair          symmetric-tap pairing: (s_k + s_m) * w
  sub=64/256    plane-slice amortization window
  stripes=6     fewer accumulator chains (fewer merge adds)

Usage: python benchmarks/tap_sweep.py [--frames 24] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from reforge_tpu.benchmarks import build_flagship, enable_cache, make_test_image
from reforge_tpu.graph.program import FILE_INPUT, FINAL_OUTPUT, KernelContext
from reforge_tpu.kernels import pallas_ops

KNOBS = ("REFORGE_TAP_SUB", "REFORGE_TAP_PAIR", "REFORGE_TAP_NOMUL",
         "REFORGE_ACC_STRIPES")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", default="3840x2160")
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.split("x"))
    N = args.frames

    enable_cache()
    prog = build_flagship(W, H)
    _tag, conv_items, pointwise = prog._strip_plan
    plans = [plan for _, plan in conv_items]
    print("plan taps:", [(len(wh), len(ww)) for wh, ww in plans], flush=True)

    def real_epi(ci, row0, t_s, xin, blurs):
        ctx = KernelContext(width=W, height=H, time=t_s, fmt="rgba32f",
                            row_offset=row0, local_height=xin.shape[0])
        res = {FILE_INPUT: xin}
        for (node, _), blur in zip(conv_items, blurs):
            v = node.spec.conv_epilogue_cw(ctx, ci, xin, blur, node.params)
            res[node.outputs[0][0]] = v
        for node in pointwise:
            ins = {desc: res[r] for r, desc in node.inputs}
            res[node.outputs[0][0]] = node.spec.cw_fn(ctx, ci, ins, node.params)
        return res[FINAL_OUTPUT]

    img = make_test_image(H, W)
    baseline = {}

    def bench(name, env):
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            def one(xc, t):
                return pallas_ops.graph_strip_fused(
                    xc, t, plans, real_epi, tile_h=120
                )

            def seq(x0):
                def step(c, k):
                    return one(x0, 0.3 + 0.001 * k.astype(jnp.float32)), None
                return lax.scan(step, x0, jnp.arange(N))[0]

            f = jax.jit(seq)
            red = jax.jit(jnp.sum)
            t0 = time.perf_counter()
            out = f(img)
            float(red(out))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(img)
            float(red(out))
            ms = (time.perf_counter() - t0) / (N * args.reps) * 1000
            if not baseline:
                baseline["ms"] = ms
            print(f"{name:28s} {ms:7.3f} ms/frame  "
                  f"({ms - baseline['ms']:+.3f} vs base, compile {comp:.0f}s)",
                  flush=True)
            return ms
        finally:
            for k in KNOBS:
                os.environ.pop(k, None)

    bench("base", {})
    bench("nomul (timing-only)", {"REFORGE_TAP_NOMUL": "1"})
    bench("pair", {"REFORGE_TAP_PAIR": "1"})
    bench("sub=256", {"REFORGE_TAP_SUB": "256"})
    bench("sub=64", {"REFORGE_TAP_SUB": "64"})
    bench("stripes=6", {"REFORGE_ACC_STRIPES": "6"})
    bench("pair+sub=256", {"REFORGE_TAP_PAIR": "1", "REFORGE_TAP_SUB": "256"})
    bench("base (re-run)", {})
    return 0


if __name__ == "__main__":
    sys.exit(main())
