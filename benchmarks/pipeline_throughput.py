#!/usr/bin/env python
"""Pipeline-staged vs single-device throughput on a deep node chain.

Pipeline parallelism only pays when stages run on genuinely separate
chips and the per-stage compute outweighs the stage-boundary activation
transfer (ICI).  This benchmark measures both executions on whatever
devices are present and prints an honest verdict:

  * on the 8-virtual-device CPU mesh (test environment) the "devices"
    share physical cores, so staging measures pure overhead — expect it
    to LOSE; the number documents the stage-boundary cost.
  * on a single real TPU it degenerates to one stage (measures parity).
  * on a real multi-chip TPU pod slice this is the go/no-go measurement
    for `--pipeline`.

Usage: python benchmarks/pipeline_throughput.py [--backend cpu] [--nodes 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--nodes", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=60)
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
    import jax.numpy as jnp

    from reforge_tpu.benchmarks import bench_program, make_test_image
    from reforge_tpu.config import parse
    from reforge_tpu.graph import build_graph, make_program
    from reforge_tpu.parallel import PipelineStagedProgram

    # A deep linear chain of similarly-heavy conv nodes — the best case
    # for staging.
    names = [f"n{i}" for i in range(args.nodes)]
    chain = " -> ".join(["input"] + names + ["output"])
    decls = "\n".join(f"{n}: gaussian {{ sigma: 2.{i} }}" for i, n in enumerate(names))
    cfg = parse(chain + "\n" + decls, expects_input=True)
    prog = make_program(build_graph(cfg), args.size, args.size)
    img = make_test_image(args.size, args.size)

    single = bench_program(prog, img, frames=args.frames)
    staged_prog = PipelineStagedProgram(prog)
    n_stages = len(staged_prog.devices)
    staged = bench_program(staged_prog, img, frames=args.frames)

    dev = jax.devices()[0].platform
    print(
        f"backend={dev} devices={len(jax.devices())} nodes={args.nodes} "
        f"stages={n_stages} size={args.size}"
    )
    print(f"single-device fused: {single['fps']:8.1f} fps ({single['ms_per_frame']:.2f} ms)")
    print(f"pipeline-staged:     {staged['fps']:8.1f} fps ({staged['ms_per_frame']:.2f} ms)")
    ratio = staged["fps"] / single["fps"]
    verdict = "BEATS" if ratio > 1.05 else ("MATCHES" if ratio > 0.95 else "LOSES TO")
    print(
        f"verdict: pipeline staging {verdict} single-device fusion "
        f"({ratio:.2f}x) on this {dev} topology"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
