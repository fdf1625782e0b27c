#!/usr/bin/env python
"""Pipeline-staged vs single-device throughput: the crossover table.

Pipeline parallelism only pays when stages run on genuinely separate
chips and the per-stage compute outweighs the stage-boundary activation
transfer (ICI).  This benchmark measures both executions across a grid
of (chain length x image size) and prints one honest verdict line per
cell, so BENCH.md carries a table instead of a vibe:

  * on the 8-virtual-device CPU mesh (test environment) the "devices"
    share physical cores, so staging measures pure overhead — expect it
    to LOSE; the number documents the stage-boundary cost.
  * on a single real TPU it degenerates to one stage (measures parity).
  * on a real multi-chip TPU pod slice this is the go/no-go measurement
    for `--pipeline`.

Stages are balanced on MEASURED per-node costs (parallel.measure_costs),
and the staged execution streams frames with multiple in flight
(render_stream), so stage s works frame i while stage s-1 works frame
i+1.

Usage: python benchmarks/pipeline_throughput.py [--backend cpu]
           [--nodes 4,10] [--sizes 512,1024] [--frames 48]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--nodes", default="4,10")
    ap.add_argument("--sizes", default="512,1024")
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    if args.backend == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from reforge_tpu.benchmarks import bench_program, make_test_image
    from reforge_tpu.config import parse
    from reforge_tpu.graph import build_graph, make_program
    from reforge_tpu.parallel import PipelineStagedProgram

    dev = jax.devices()[0].platform
    print(
        f"backend={dev} devices={len(jax.devices())} frames={args.frames}",
        flush=True,
    )

    def bench_stream(staged, img, frames):
        # Warm + stream with stages+1 frames in flight.
        list(staged.render_stream([img] * 4))
        start = time.perf_counter()
        for _ in staged.render_stream([img] * frames):
            pass
        elapsed = time.perf_counter() - start
        return {"fps": frames / elapsed, "ms_per_frame": elapsed / frames * 1e3}

    for n_nodes in [int(v) for v in args.nodes.split(",")]:
        names = [f"n{i}" for i in range(n_nodes)]
        chain = " -> ".join(["input"] + names + ["output"])
        decls = "\n".join(
            f"{n}: gaussian {{ sigma: 2.{i} }}" for i, n in enumerate(names)
        )
        cfg = parse(chain + "\n" + decls, expects_input=True)
        for size in [int(v) for v in args.sizes.split(",")]:
            prog = make_program(build_graph(cfg), size, size)
            img = make_test_image(size, size)
            single = bench_program(prog, img, frames=args.frames)
            staged_prog = PipelineStagedProgram(prog, measure=True)
            staged = bench_stream(staged_prog, img, args.frames)
            ratio = staged["fps"] / single["fps"]
            verdict = (
                "BEATS" if ratio > 1.05
                else ("MATCHES" if ratio > 0.95 else "LOSES")
            )
            print(
                json.dumps(
                    {
                        "nodes": n_nodes,
                        "size": size,
                        "stages": len(staged_prog.devices),
                        "single_ms": round(single["ms_per_frame"], 2),
                        "staged_ms": round(staged["ms_per_frame"], 2),
                        "ratio": round(ratio, 2),
                        "verdict": verdict,
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
