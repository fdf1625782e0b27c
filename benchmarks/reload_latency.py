#!/usr/bin/env python
"""Reload-to-frame latency benchmark (BASELINE.md: p50 < 100 ms warm).

Measures, over N config edits alternating between two graphs:
  * poll latency      — trigger_reloads() cost on the frame loop (parse +
    reflect + abstract trace; the compile itself runs off-thread)
  * swap latency      — edit-to-new-program-rendering (includes compile;
    warm persistent jit cache makes repeat edits fast)

Usage: python benchmarks/reload_latency.py [--backend cpu] [--edits 12]
"""

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--edits", type=int, default=12)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from reforge_tpu.engine import Engine, RenderInfo

    graphs = [
        "input -> gs -> tone -> output\ngs: gaussian { sigma: %.1f }\ntone: tonemap { exposure: 1.1 }\n",
        "input -> gs -> vig -> output\ngs: gaussian { sigma: %.1f }\nvig: vignette { strength: 0.4 }\n",
    ]

    with tempfile.TemporaryDirectory() as d:
        cfg = os.path.join(d, "graph.rf")
        with open(cfg, "w") as f:
            f.write(graphs[0] % 2.0)
        eng = Engine(
            RenderInfo(
                width=args.size,
                height=args.size,
                config_path=cfg,
                # Point at the empty temp dir so nodes resolve to builtin
                # kernels (separable gaussian), not repo .comp files — the
                # .comp 2D gaussian compiles an order of magnitude slower.
                shader_path=d,
                has_input_image=True,
                async_compile=True,
            )
        )
        eng.load_input(
            np.random.default_rng(0).integers(
                0, 256, (args.size, args.size, 4), np.uint8
            )
        )
        eng.render_frame_blocking()  # warm the initial program

        poll_ms, swap_ms = [], []
        for i in range(args.edits):
            text = graphs[i % 2] % (2.0 + 0.5 * (i % 3))
            st = os.stat(cfg)
            with open(cfg, "w") as f:
                f.write(text)
            os.utime(cfg, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))

            t0 = time.perf_counter()
            swapped = eng.trigger_reloads()
            poll_ms.append((time.perf_counter() - t0) * 1000)
            while not swapped:
                eng.render_frame_blocking()  # old program keeps rendering
                time.sleep(0.002)
                swapped = eng.trigger_reloads()
            eng.render_frame_blocking()  # first frame of the new program
            swap_ms.append((time.perf_counter() - t0) * 1000)

        def stats(xs):
            return (
                f"p50 {statistics.median(xs):7.1f} ms   "
                f"min {min(xs):7.1f}   max {max(xs):7.1f}"
            )

        print(f"backend={jax.default_backend()} size={args.size} edits={args.edits}")
        print(f"frame-loop poll (non-blocking): {stats(poll_ms)}")
        print(f"edit -> new program rendering:  {stats(swap_ms)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
