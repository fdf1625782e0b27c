#!/usr/bin/env python
"""Isolate the batch-path KERNEL-CLIFF (hw_battery round-4 finding).

Measures, on the same flagship program and input:
  1. single      — device-sequenced single-frame baseline (lax.scan)
  2. map-nojit   — jit(lax.map(forward)) WITHOUT shard_map
  3. shardmap    — the BatchProgram path (shard_map + lax.map)
  4. scan-batch  — jit(lax.scan(forward)) over the batch dim (control:
                   the sequenced bench's own structure, batch-shaped)
Each timed with one dispatch + device-side reduction fetch so tunnel
dispatch overhead amortizes identically.  --profile dumps a trace per
variant for trace_top.py attribution.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, chain=4):
    """Best-of-reps; each rep chains ``chain`` async dispatches and
    forces completion with a 4-byte device reduction fetch (tunnel
    devices: block_until_ready returns early, and each blocking fetch
    is a full RTT — amortize it)."""
    import jax
    import jax.numpy as jnp

    reduce = jax.jit(lambda o: jnp.sum(o[-1]) if o.ndim == 4 else jnp.sum(o))
    out = fn(*args)
    float(reduce(out))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _i in range(chain):
            out = fn(*args)
        float(reduce(out))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--profile", default=None)
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--variants", default="single,map,shardmap,scan")
    args = ap.parse_args()

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
    B = args.batch
    batch = jnp.stack([img] * B)
    times = jnp.linspace(0.0, 0.5, B)
    variants = args.variants.split(",")
    res = {}

    def prof(name):
        class _Ctx:
            def __enter__(self):
                if args.profile:
                    jax.profiler.start_trace(os.path.join(args.profile, name))

            def __exit__(self, *a):
                if args.profile:
                    jax.profiler.stop_trace()

        return _Ctx()

    if "single" in variants:
        with prof("single"):
            r = bench_program_sequenced(prog, img, frames=24, chunk=12)
        res["single_ms"] = round(r["ms_per_frame"], 3)

    if "map" in variants:
        fn = jax.jit(
            lambda b, ts: jax.lax.map(
                lambda bt: prog._forward(bt[0], bt[1]), (b, ts)
            )
        )
        with prof("map"):
            dt = timeit(fn, batch, times)
        res["map_ms_per_frame"] = round(dt / B * 1000, 3)

    if "shardmap" in variants:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bp = BatchProgram(prog, make_batch_mesh(min(B, len(jax.devices()))))
        sb = bp.shard_input(batch)
        st = jax.device_put(times, NamedSharding(bp.mesh, P("batch")))
        with prof("shardmap"):
            dt = timeit(bp._fn, sb, st)
        res["shardmap_ms_per_frame"] = round(dt / B * 1000, 3)

    if "scan" in variants:
        fn = jax.jit(
            lambda b, ts: jax.lax.scan(
                lambda c, bt: (c, prog._forward(bt[0], bt[1])),
                0,
                (b, ts),
            )[1]
        )
        with prof("scan"):
            dt = timeit(fn, batch, times)
        res["scan_ms_per_frame"] = round(dt / B * 1000, 3)

    res["size"] = args.size
    res["batch"] = B
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
