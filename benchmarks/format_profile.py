#!/usr/bin/env python
"""Storage-format A/B: rgba32f vs rgba16f flagship, with profiler traces.

VERDICT r3 #4: README calls rgba16f "the fast mode" but it measures
SLOWER than f32 (532 vs 586-634 fps at 4K) even though bf16 strips halve
the HBM/DMA traffic of a DMA-latency-bound kernel.  This harness
measures both formats back to back in one session (the tunnel's
per-session dispatch swing otherwise confounds cross-session deltas) and
can dump per-op traces to locate where the bf16 path spends the extra
~0.3 ms (suspects: the whole-strip f32 staging copy, the output
downcast, bf16 DMA granularity).

Usage: python benchmarks/format_profile.py [--size 3840x2160]
           [--profile /tmp/fmttrace] [--formats rgba32f,rgba16f]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--formats", default="rgba32f,rgba16f,rgba8")
    ap.add_argument("--profile", default=None)
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from reforge_tpu.benchmarks import (
        bench_program_sequenced,
        build_flagship,
        enable_cache,
        make_test_image,
    )

    enable_cache()
    w, h = (int(v) for v in args.size.split("x"))
    img = make_test_image(h, w)

    results = {}
    for fmt in args.formats.split(","):
        prog = build_flagship(w, h, fmt)
        r = bench_program_sequenced(
            prog, img, frames=args.frames, chunk=args.chunk
        )
        if args.profile:
            tdir = os.path.join(args.profile, fmt)
            os.makedirs(tdir, exist_ok=True)
            jax.profiler.start_trace(tdir)
            bench_program_sequenced(
                prog, img, frames=args.chunk, chunk=args.chunk,
                warmup_chunks=0,
            )
            jax.profiler.stop_trace()
        results[fmt] = r
        print(json.dumps({
            "format": fmt, "size": args.size,
            "ms_per_frame": round(r["ms_per_frame"], 4),
            "fps": round(r["fps"], 2),
        }))
    if "rgba32f" in results and "rgba16f" in results:
        print(json.dumps({
            "bf16_vs_f32": round(
                results["rgba32f"]["ms_per_frame"]
                / results["rgba16f"]["ms_per_frame"], 3,
            )
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
