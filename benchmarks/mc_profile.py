#!/usr/bin/env python
"""mc megakernel vs per-node A/B at arbitrary width, with profiler traces.

The round-3 finding (BENCH.md mc table): conv-bearing mc plans lose to
per-node execution at >= 2560 px (blur s2 -> sobel -> tonemap 4K: mc
1.50 ms vs per-node 1.11) while winning every 1080p case, so they are
gated off via ops.MC_CONV_MAX_WIDTH.  This harness exists to find the
missing time: it builds the SAME graph twice — once with the gate lifted
(mc plan) and once with strip fusion disabled (per-node, whose convs run
the standalone raw-DMA kernel and whose pointwise tail XLA fuses) — and
measures both with the tunnel-safe sequenced method, optionally dumping
jax.profiler traces for op-level attribution.

Usage:
  python benchmarks/mc_profile.py --graph chain3 --sigma 2 --size 3840x2160
  python benchmarks/mc_profile.py --graph chain3 --profile /tmp/mctrace
  python benchmarks/mc_profile.py --graph blur --variants mc  # one side only
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRAPHS = {
    # conv -> stencil -> pointwise: the canonical losing case at 4K.
    "chain3": (
        "input -> gs -> edge -> tone -> output\n"
        "gs: gaussian {{ sigma: {sigma} }}\n"
        "edge: sobel {{}}\ntone: tonemap {{}}\n"
    ),
    # conv only (isolates the mc conv stage against the standalone kernel).
    "blur": "input -> gs -> output\ngs: gaussian {{ sigma: {sigma} }}\n",
    # conv of an intermediate (pointwise feeds the conv).
    "tonemap-blur": (
        "input -> tone -> gs -> output\n"
        "tone: tonemap {{}}\ngs: gaussian {{ sigma: {sigma} }}\n"
    ),
    # two chained convs.
    "blur2": (
        "input -> g1 -> g2 -> output\n"
        "g1: gaussian {{ sigma: {sigma} }}\ng2: gaussian {{ sigma: {sigma} }}\n"
    ),
    # stencil-only (mc wins at 4K already: the control case).
    "sobel": "input -> edge -> output\nedge: sobel {{}}\n",
    # conv writes a pool block with eh=ew=0 (pointwise consumer):
    # isolates conv-stores-pool + point-reads-pool against tonemap-blur's
    # conv-reads-pool and chain3's extent-carrying conv block.
    "blur-tonemap": (
        "input -> gs -> tone -> output\n"
        "gs: gaussian {{ sigma: {sigma} }}\ntone: tonemap {{}}\n"
    ),
    # conv -> stencil, no pointwise tail: chain3 minus the tonemap stage.
    "chain2": (
        "input -> gs -> edge -> output\n"
        "gs: gaussian {{ sigma: {sigma} }}\nedge: sobel {{}}\n"
    ),
    # stencil -> pointwise (no conv at all): is the stencil stage cheap
    # when its input is the strip rather than a pool block?
    "sobel-tonemap": (
        "input -> edge -> tone -> output\n"
        "edge: sobel {{}}\ntone: tonemap {{}}\n"
    ),
    # point -> conv -> point: the conv both READS and WRITES pool blocks
    # with zero extents (vs tonemap-blur where it writes o_ref directly).
    "tm-blur-tm": (
        "input -> tone -> gs -> tone2 -> output\n"
        "tone: tonemap {{}}\ngs: gaussian {{ sigma: {sigma} }}\n"
        "tone2: tonemap {{}}\n"
    ),
}


def build(graph_src, w, h, force_mc, fmt="rgba32f"):
    from reforge_tpu.config import parse
    from reforge_tpu.graph import build_graph, make_program
    from reforge_tpu.kernels import ops as _ops

    old_gate = _ops.MC_CONV_MAX_WIDTH
    if force_mc:
        _ops.MC_CONV_MAX_WIDTH = 1 << 30
    try:
        cfg = parse(graph_src, expects_input=True)
        prog = make_program(build_graph(cfg), w, h, fmt)
    finally:
        _ops.MC_CONV_MAX_WIDTH = old_gate
    return prog


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="chain3", choices=sorted(GRAPHS))
    ap.add_argument("--sigma", type=float, default=2.0)
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--profile", default=None,
                    help="directory for jax.profiler traces (one per variant)")
    ap.add_argument("--variants", default="mc,pernode")
    ap.add_argument("--format", default="rgba32f",
                    choices=["rgba32f", "rgba8", "rgba16f"])
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from reforge_tpu.benchmarks import (
        bench_program_sequenced,
        enable_cache,
        make_test_image,
    )

    enable_cache()
    w, h = (int(v) for v in args.size.split("x"))
    src = GRAPHS[args.graph].format(sigma=args.sigma)
    img = make_test_image(h, w)

    results = {}
    for variant in args.variants.split(","):
        prog = build(src, w, h, force_mc=(variant == "mc"), fmt=args.format)
        if variant == "mc":
            plan = prog._strip_plan
            if plan is None or plan[0] != "mc":
                print(f"# mc plan NOT eligible (got {plan and plan[0]}); "
                      "skipping variant", file=sys.stderr)
                continue
            # The forward silently falls back to per-node when the runtime
            # tile gate says no (e.g. a REFORGE_MC_TILE_H override that
            # doesn't divide the height) — measuring THAT as "mc" poisons
            # sweeps, so check the gate here and skip loudly instead.
            from reforge_tpu.kernels import pallas_ops as _po

            mcp = plan[1]
            if _po.mc_strip_tile_h(
                h, w, mcp["rh_in"], mcp["ew_in"], max(mcp["n_bufs"], 1),
                mxu_t_max=mcp.get("mxu_t_max", 0),
            ) is None:
                print("# mc tile gate rejects this height/override; "
                      "skipping variant (would fall back to per-node)",
                      file=sys.stderr)
                continue
        elif variant == "seg":
            # segment-level hybrid (the shipped default where the mc gate
            # rejects the whole graph): fused child megakernels for the
            # winning segments, per-node for the gated convs.
            plan = prog._strip_plan
            if plan is None or plan[0] != "segments":
                print(f"# segments plan NOT eligible (got {plan and plan[0]}); "
                      "skipping variant", file=sys.stderr)
                continue
            desc = [
                (s[0], [n.name for n in s[4]]) if s[0] == "seg"
                else (s[0], s[1].name)
                for s in plan[1]
            ]
            print(f"# segments: {desc}", file=sys.stderr)
        elif variant == "single":
            # the single-tier megakernel (input-fed convs + pointwise tail):
            # the optimized baseline the mc conv stage should match.
            plan = prog._strip_plan
            if plan is None or plan[0] != "single":
                print(f"# single plan NOT eligible (got {plan and plan[0]}); "
                      "skipping variant", file=sys.stderr)
                continue
        else:
            prog._strip_plan = None  # per-node: standalone convs + XLA tail
        r = bench_program_sequenced(
            prog, img, frames=args.frames, chunk=args.chunk
        )
        if args.profile:
            tdir = os.path.join(args.profile, variant)
            os.makedirs(tdir, exist_ok=True)
            jax.profiler.start_trace(tdir)
            bench_program_sequenced(
                prog, img, frames=args.chunk, chunk=args.chunk,
                warmup_chunks=0,
            )
            jax.profiler.stop_trace()
        results[variant] = r
        print(json.dumps({
            "variant": variant, "graph": args.graph, "sigma": args.sigma,
            "size": args.size, "ms_per_frame": round(r["ms_per_frame"], 4),
            "fps": round(r["fps"], 2),
        }))
    if "mc" in results and "pernode" in results:
        ratio = results["pernode"]["ms_per_frame"] / results["mc"]["ms_per_frame"]
        print(json.dumps({
            "graph": args.graph, "sigma": args.sigma, "size": args.size,
            "mc_speedup_vs_pernode": round(ratio, 3),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
