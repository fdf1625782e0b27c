#!/usr/bin/env python
"""GLSL-graph throughput: user .comp chains vs their builtin equivalents.

The reference's primary use mode is user-authored compute shaders wired by
the config DSL (src/main.rs positional shader + --config); every node runs
the same hot loop (src/vulkan/command.rs:166-242).  This benchmark proves
the TPU build gives user GLSL the same megakernel path as builtins:

  * glsl-chain   : gaussian_h.comp -> gaussian_v.comp -> tonemap.comp
                   (conv synthesis + 1-D pair composition + point stage)
  * builtin-chain: gaussian -> tonemap  (the builtin equivalent)
  * glsl-sharpen : sharpen.comp -> tonemap.comp (stencil synthesis)
  * glsl-plain   : the same GLSL chain with conv synthesis disabled
                   (REFORGE_GLSL_CONV_SYNTH=0) — the round-4 cliff this
                   work removes.

Usage: python benchmarks/glsl_graphs.py [width height [frames]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(src: str, width: int, height: int, fmt: str = "rgba32f",
          builtins_only: bool = False):
    from reforge_tpu.config import parse, parse_file
    from reforge_tpu.graph import build_graph, make_program

    if builtins_only:
        # No shader_path: every type resolves to the builtin registry
        # (shaders/tonemap.comp would otherwise shadow the builtin).
        cfg = parse(src, expects_input=True)
    else:
        cfg = parse_file(src, expects_input=True, shader_path="shaders")
    assert cfg is not None
    prog = make_program(build_graph(cfg), width, height, fmt)
    assert prog is not None
    return prog


GLSL_CHAIN = (
    "input -> gh -> gv -> tm -> output\n"
    "gh: gaussian_h { sigma: 2.0 }\n"
    "gv: gaussian_v { sigma: 2.0 }\n"
    "tm: tonemap { exposure: 1.1 }\n"
)
BUILTIN_CHAIN = (
    "input -> gs -> tm -> output\n"
    "gs: gaussian { sigma: 2.0 }\n"
    "tm: tonemap { exposure: 1.1 }\n"
)
GLSL_SHARPEN = (
    "input -> sh -> tm -> output\n"
    "sh: sharpen { amount: 0.7 }\n"
    "tm: tonemap { exposure: 1.1 }\n"
)


def main() -> int:
    from reforge_tpu.benchmarks import (
        bench_program_sequenced,
        enable_cache,
        make_test_image,
    )

    enable_cache()
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    img = make_test_image(height, width)

    cases = [
        ("glsl-chain", GLSL_CHAIN, None, False, "rgba32f"),
        ("glsl-chain-16f", GLSL_CHAIN, None, False, "rgba16f"),
        ("builtin-chain", BUILTIN_CHAIN, None, True, "rgba32f"),
        ("glsl-sharpen", GLSL_SHARPEN, None, False, "rgba32f"),
        ("glsl-plain", GLSL_CHAIN, {"REFORGE_GLSL_CONV_SYNTH": "0"}, False,
         "rgba32f"),
    ]
    for name, src, env, builtins_only, fmt in cases:
        saved = {}
        for k, v in (env or {}).items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            prog = build(src, width, height, fmt, builtins_only=builtins_only)
            plan = prog._strip_plan[0] if prog._strip_plan else "none"
            best = None
            for _ in range(3):
                r = bench_program_sequenced(prog, img, frames=frames)
                if best is None or r["fps"] > best["fps"]:
                    best = r
            print(
                f"{name:14s} plan={plan:8s} {best['fps']:8.1f} fps "
                f"({best['ms_per_frame']:.3f} ms/frame)"
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
