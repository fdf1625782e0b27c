"""Benchmark graph definitions and measurement helpers.

The headline benchmark (BASELINE.md): 4K frames/sec through a 5-node
filter graph.  The flagship graph mirrors the BASELINE.json configs — a
real convolution (separable gaussian), an unsharp mask (second conv),
a fan-in blend, tonemapping and a vignette — shapes that exercise conv,
pointwise and gather-free spatial kernels in one fused program.
"""

from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from .config import parse
from .graph import GraphProgram, build_graph, make_program

def enable_cache() -> None:
    """Benchmarks want the warm persistent jit cache too (Engine enables it
    for the live tool; standalone bench processes call this)."""
    from .engine import _enable_persistent_cache

    _enable_persistent_cache()


FLAGSHIP_CONFIG = """
// 5-node flagship: blur + unsharp fan-in, blended, tonemapped, vignetted.
input -> soften -> mixer -> tone -> vig -> output
input -> crisp -> mixer:input_image2

soften: gaussian { sigma: 4.0 }
crisp:  unsharp  { sigma: 2.0, amount: 0.8 }
mixer:  mix      { factor: 0.5 }
tone:   tonemap  { exposure: 1.1 }
vig:    vignette { strength: 0.4 }
"""


def build_flagship(width: int, height: int, fmt: str = "rgba32f") -> GraphProgram:
    cfg = parse(FLAGSHIP_CONFIG, expects_input=True)
    assert cfg is not None
    graph = build_graph(cfg)
    assert graph is not None
    program = make_program(graph, width, height, fmt)
    assert program is not None
    return program


def bench_program(
    program,
    file_input: jnp.ndarray,
    frames: int = 60,
    warmup: int = 5,
) -> dict:
    """Steady-state frames/sec: per-frame time varies (traced), shapes fixed.

    Completion is forced by an on-device reduction of the LAST frame fetched
    to the host (4 bytes): same-device XLA programs execute in submission
    order, so the fetch completing proves all N frames completed.  This
    stays honest on remote/tunneled devices where ``block_until_ready`` can
    ack before execution finishes and bulk fetches are tunnel-bound.
    """
    reduce = jax.jit(jnp.sum)
    out = None
    for i in range(warmup):
        out = program(file_input, float(i) * 0.01)
    float(reduce(out))
    start = _time.perf_counter()
    for i in range(frames):
        out = program(file_input, 1.0 + i * 0.016)
    float(reduce(out))
    elapsed = _time.perf_counter() - start
    return {
        "frames": frames,
        "seconds": elapsed,
        "fps": frames / elapsed,
        "ms_per_frame": elapsed / frames * 1000.0,
    }


def bench_program_sequenced(
    program,
    file_input: jnp.ndarray,
    frames: int = 120,
    chunk: int = 24,
    warmup_chunks: int = 2,
) -> dict:
    """Steady-state frames/sec with device-side frame sequencing.

    Frames render in chunks of ``chunk`` per dispatch via
    ``GraphProgram.render_sequence`` (each chunk is one XLA program whose
    while-loop executes every frame; the last frame of the last chunk is
    reduced on device and fetched to force completion).  This measures
    device throughput — what a multi-frame export or a pipelined preview
    achieves — where ``bench_program`` measures per-dispatch round trips
    and is bounded by host submission cost on tunneled devices.  The
    per-chunk t0 scalars are uploaded before timing starts: every
    host->device scalar is its own serialized RPC through a tunnel."""
    frames = max(frames // chunk, 1) * chunk
    reduce = jax.jit(jnp.sum)
    dt = jnp.float32(0.016)
    t0s = [jnp.float32(1.0 + i * chunk * 0.016) for i in range(frames // chunk)]
    out = None
    for i in range(warmup_chunks):
        out = program.render_sequence(file_input, jnp.float32(float(i)), dt, chunk)
    if out is not None:
        float(reduce(out))
    start = _time.perf_counter()
    for t0 in t0s:
        out = program.render_sequence(file_input, t0, dt, chunk)
    float(reduce(out))
    elapsed = _time.perf_counter() - start
    return {
        "frames": frames,
        "seconds": elapsed,
        "fps": frames / elapsed,
        "ms_per_frame": elapsed / frames * 1000.0,
    }


def make_test_image(height: int, width: int, seed: int = 0) -> jnp.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.random((4, height, width), dtype=np.float32)
    return jnp.asarray(img)
