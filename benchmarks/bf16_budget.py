#!/usr/bin/env python
"""Attribute the rgba16f (fast-mode) flagship frame time at 4K.

The rgba32f budget was closed by `strip_ablation.py` (the VPU tap
schedule is at its issue floor — BENCH.md "definitive budget").  The
bf16 kernel's costs are different: both flagship convs ride the MXU as
single-product band matmuls.  Graph-substitution variants, one
process, one tunnel window (deltas are window-comparable):

  full        : the shipped 5-node flagship (two MXU conv stages)
  light-convs : same graph, sigmas shrunk so both convs fall below the
                24-tap MXU threshold (tiny VPU taps)
  conv-only   : input -> gaussian s4 -> output — one MXU stage +
                structure, no epilogue
  floor       : input -> gaussian s0.8 -> output — structure + 6 r2
                VPU passes

Measured finding (BENCH.md "rgba16f frame budget"): light-convs is
SLOWER than full — in bf16 storage the MXU band stages cost less than
even tiny VPU tap substitutes, so "full - light-convs" does NOT
isolate an MXU stage cost (it comes out negative) and the naive
decomposition fails.  The useful numbers are the variants themselves:
conv-only-s4 is the structural+one-stage floor of the mode, and a
REFORGE_MC_MXU_BF16_MIN_TAPS=4 vs 24 A/B measured neutral within
window noise, so the 24-tap default stands.

Usage: python benchmarks/bf16_budget.py [--frames 72] [--reps 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reforge_tpu.benchmarks import (
    bench_program_sequenced,
    enable_cache,
    make_test_image,
)
from reforge_tpu.config import parse
from reforge_tpu.graph import build_graph, make_program

FULL = """
input -> soften -> mixer -> tone -> vig -> output
input -> crisp -> mixer:input_image2
soften: gaussian { sigma: %s }
crisp:  unsharp  { sigma: %s, amount: 0.8 }
mixer:  mix      { factor: 0.5 }
tone:   tonemap  { exposure: 1.1 }
vig:    vignette { strength: 0.4 }
"""

CONV_ONLY = """
input -> soften -> output
soften: gaussian { sigma: %s }
"""

VARIANTS = [
    ("full", FULL % (4.0, 2.0)),
    ("light-convs", FULL % (0.8, 0.6)),
    ("conv-only-s4", CONV_ONLY % 4.0),
    ("floor-s0.8", CONV_ONLY % 0.8),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--size", default="3840x2160")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    enable_cache()
    img = make_test_image(h, w)
    results = {}
    for name, src in VARIANTS:
        cfg = parse(src, expects_input=True)
        prog = make_program(build_graph(cfg), w, h, "rgba16f")
        x = img.astype(prog.storage_dtype)
        ws = [
            bench_program_sequenced(prog, x, frames=args.frames)
            for _ in range(args.reps)
        ]
        best = max(ws, key=lambda r: r["fps"])
        results[name] = best["ms_per_frame"]
        print(
            f"{name}: {best['ms_per_frame']:.3f} ms/frame "
            f"({best['fps']:.1f} fps)", flush=True,
        )
    if all(k in results for k, _ in VARIANTS):
        print(
            f"# mode floor (structure + one MXU stage): "
            f"{results['conv-only-s4']:.3f} ms; epilogue+fan-in+2nd stage: "
            f"{results['full'] - results['conv-only-s4']:.3f} ms; "
            f"light-convs vs full: {results['light-convs'] - results['full']:+.3f} ms "
            f"(positive = VPU substitutes lose to the MXU stages)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
