#!/usr/bin/env python
"""Batch-path throughput vs the single-frame Pallas baseline.

VERDICT r2 #2's acceptance test: BatchProgram (shard_map + per-device
lax.map over local frames) must deliver close to single-frame Pallas fps
x local batch — i.e. the batch path must NOT ship the ~4x slower
portable jnp kernels on TPU.

On a single chip the mesh is 1-wide: the measurement isolates exactly
the kernel question (does the batched execution run the same Pallas
megakernels as the single-frame path?).  On the 8-virtual-device CPU
mesh it degenerates to a correctness smoke (CPU always runs jnp kernels).

Usage: python benchmarks/batch_throughput.py [--frames 48] [--batch 8]
           [--size 1920x1080] [--backend cpu]
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
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="1920x1080")
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

    from reforge_tpu.benchmarks import (
        bench_program_sequenced,
        build_flagship,
        enable_cache,
        make_test_image,
    )
    from reforge_tpu.parallel import BatchProgram, make_batch_mesh

    enable_cache()
    w, h = (int(v) for v in args.size.split("x"))
    prog = build_flagship(w, h)
    img = make_test_image(h, w, seed=1)

    # Single-frame device throughput (device-side sequencing).
    single = bench_program_sequenced(prog, img, frames=args.frames, chunk=12)

    # Batch path: one dispatch of B frames per call, per-frame times.
    # Tunnel discipline: every host->device transfer (times arithmetic,
    # device_put resharding) is a serialized RPC — build ALL per-dispatch
    # time vectors BEFORE the timed loop and fetch once at the end, so
    # the loop is pure async dispatches (same amortization as the
    # single-frame sequenced bench; a per-call device_put turns the loop
    # into n_disp blocking round trips and measures the tunnel, not the
    # kernel).
    mesh = make_batch_mesh(min(args.batch, len(jax.devices())))
    bp = BatchProgram(prog, mesh)
    B = args.batch
    batch = jnp.stack([img] * B)
    batch = bp.shard_input(batch)
    reduce = jax.jit(jnp.sum)
    n_disp = max(args.frames // B, 2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tsh = NamedSharding(mesh, P("batch"))
    times = [
        jax.device_put(jnp.linspace(0.0, 0.5, B) + i, tsh)
        for i in range(n_disp + 2)
    ]
    out = None
    for i in range(2):
        out = bp._fn(batch, times[i])
    float(reduce(out[-1]))
    start = time.perf_counter()
    for i in range(n_disp):
        out = bp._fn(batch, times[2 + i])
    float(reduce(out[-1]))
    elapsed = time.perf_counter() - start
    batched_ms = elapsed / (n_disp * B) * 1000.0

    ratio = single["ms_per_frame"] / batched_ms
    print(
        json.dumps(
            {
                "size": args.size,
                "batch": B,
                "devices": mesh.shape["batch"],
                "single_ms_per_frame": round(single["ms_per_frame"], 3),
                "batched_ms_per_frame": round(batched_ms, 3),
                "batched_over_single": round(ratio, 2),
                "verdict": (
                    "PALLAS-SPEED" if ratio > 0.9 else
                    ("NEAR" if ratio > 0.75 else "KERNEL-CLIFF")
                ),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
