"""SSBO tests: reflection, atomicAdd scatter, buffer flow between nodes,
and the histogram -> equalize end-to-end pipeline (including sharded)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from reforge_tpu import utils
from reforge_tpu.config import parse_file
from reforge_tpu.glsl import translate_shader
from reforge_tpu.graph import build_graph, make_program
from reforge_tpu.kernels.base import KernelContext

SHADER_DIR = os.path.join(os.path.dirname(__file__), "..", "shaders")

HIST_SRC = open(os.path.join(SHADER_DIR, "histogram.comp")).read()

WIRING = (
    "input -> histogram\n"
    "histogram:Bins -> equalize:Bins\n"
    "input -> equalize -> output\n"
)


def rand_image(h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((4, h, w), dtype=np.float32))


class TestReflection:
    def test_histogram_bindings(self):
        spec = translate_shader(HIST_SRC, "histogram")
        assert spec.images_in == ("input_image",)
        assert spec.images_out == ()
        assert spec.ssbos_out == ("Bins",)
        assert spec.ssbo_sizes == {"Bins": 256}

    def test_equalize_bindings(self):
        src = open(os.path.join(SHADER_DIR, "equalize.comp")).read()
        spec = translate_shader(src, "equalize")
        assert spec.ssbos_in == ("Bins",)
        assert spec.ssbos_out == ()
        assert spec.images_out == ("output_image",)

    def test_runtime_sized_array_defaults(self):
        # `float data[];` — std430 runtime-sized trailing array.  shaderc
        # compiles these (reference shader.rs:73-93); with no allocated
        # buffer bound, the documented default size applies.
        from reforge_tpu.glsl.interp import DEFAULT_RUNTIME_SSBO_ELEMS

        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { float data[]; };
void main() {
    ivec2 p = ivec2(gl_GlobalInvocationID.xy);
    atomicAdd(data[0], 1.0);
    imageStore(output_image, p, vec4(float(data.length())));
}
"""
        spec = translate_shader(src, "runtime")
        assert spec.ssbo_sizes == {"B": DEFAULT_RUNTIME_SSBO_ELEMS}
        ctx = KernelContext(width=8, height=8)
        out = spec(ctx, {"input_image": jnp.zeros((4, 8, 8))}, {})
        assert float(out["B"][0]) == 64.0  # one atomicAdd per pixel
        np.testing.assert_allclose(
            np.asarray(out["output_image"][0]), DEFAULT_RUNTIME_SSBO_ELEMS
        )

    def test_runtime_array_sizes_from_bound_buffer(self):
        # When a buffer IS bound (graph execution), the runtime array's
        # length resolves from the allocation minus the fixed prefix.
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) readonly buffer B { float head[8]; float data[]; };
void main() {
    ivec2 p = ivec2(gl_GlobalInvocationID.xy);
    imageStore(output_image, p, vec4(float(data.length()), data[1], head[2], 0.0));
}
"""
        spec = translate_shader(src, "runtime_bound")
        ctx = KernelContext(width=4, height=4)
        buf = jnp.arange(40, dtype=jnp.float32)
        out = spec(ctx, {"input_image": jnp.zeros((4, 4, 4)), "B": buf}, {})
        o = np.asarray(out["output_image"])
        np.testing.assert_allclose(o[0], 32.0)  # 40 total - 8 prefix
        np.testing.assert_allclose(o[1], 9.0)   # data[1] = buf[8 + 1]
        np.testing.assert_allclose(o[2], 2.0)   # head[2]

    def test_runtime_array_must_be_last(self):
        from reforge_tpu.glsl import GlslError

        src = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { float data[]; float tail; };
void main() {
    ivec2 p = ivec2(gl_GlobalInvocationID.xy);
    atomicAdd(data[0], 1.0);
    imageStore(output_image, p, vec4(0.0));
}
"""
        with pytest.raises(GlslError, match="last member"):
            spec = translate_shader(src, "bad")
            ctx = KernelContext(width=8, height=8)
            spec(ctx, {"input_image": jnp.zeros((4, 8, 8))}, {})


class TestMultiMemberBlocks:
    """std430 blocks with several scalar/array members (summed element
    offsets — the reference sizes by summed reflected member sizes,
    pipeline_graph.rs:161-170)."""

    SRC = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer Stats { uint count; float lo[2]; float sums[4]; };
void main() {
    ivec2 p = ivec2(gl_GlobalInvocationID.xy);
    float v = imageLoad(input_image, p).r;
    atomicAdd(count, 1u);
    int bin = clamp(int(v * 4.0), 0, 3);
    atomicAdd(sums[bin], 1.0);
    imageStore(output_image, p, vec4(v));
}
"""

    def test_reflection_total_size(self):
        spec = translate_shader(self.SRC, "stats")
        assert spec.ssbo_sizes == {"Stats": 7}  # 1 + 2 + 4
        assert spec.ssbos_out == ("Stats",)

    def test_offsets_do_not_alias(self):
        spec = translate_shader(self.SRC, "stats")
        ctx = KernelContext(width=8, height=8)
        img = rand_image(8, 8)
        out = spec(ctx, {"input_image": img}, {})
        buf = np.asarray(out["Stats"])
        assert buf[0] == 64.0  # count: one per pixel
        np.testing.assert_array_equal(buf[1:3], 0.0)  # lo[] untouched
        assert buf[3:7].sum() == 64.0  # sums histogram
        # histogram matches numpy
        v = np.asarray(img[0]).ravel()
        want = np.bincount(np.clip((v * 4).astype(int), 0, 3), minlength=4)
        np.testing.assert_array_equal(buf[3:7], want)

    def test_scalar_member_assign_and_read(self):
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { float bias; float data[4]; } blk;
void main() {
    ivec2 p = ivec2(gl_GlobalInvocationID.xy);
    bias = 2.5;
    blk.data[1] = 7.0;
    imageStore(output_image, p, vec4(bias + blk.data[1], blk.bias, 0.0, 1.0));
}
"""
        spec = translate_shader(src, "scalar_member")
        ctx = KernelContext(width=4, height=4)
        out = spec(ctx, {"input_image": jnp.zeros((4, 4, 4))}, {})
        o = np.asarray(out["output_image"])
        np.testing.assert_allclose(o[0], 9.5)
        np.testing.assert_allclose(o[1], 2.5)
        buf = np.asarray(out["B"])
        np.testing.assert_allclose(buf[0], 2.5)
        np.testing.assert_allclose(buf[2], 7.0)


class TestExecution:
    def test_histogram_counts(self):
        spec = translate_shader(HIST_SRC, "histogram")
        img = rand_image(16, 16, seed=3)
        ctx = KernelContext(width=16, height=16)
        bins = np.asarray(spec(ctx, {"input_image": img}, {})["Bins"])
        assert bins.sum() == 16 * 16  # every pixel lands in exactly one bin
        # Cross-check against numpy histogram.
        i = np.asarray(img)
        luma = 0.2126 * i[0] + 0.7152 * i[1] + 0.0722 * i[2]
        ref = np.bincount(
            np.clip((luma * 255).astype(int), 0, 255).ravel(), minlength=256
        )
        np.testing.assert_array_equal(bins.astype(int), ref)

    def test_atomic_add_inside_data_dependent_loop(self):
        # atomicAdd in a vectorized while body: the SSBO rides the loop
        # carry, so the counter must equal the SUM of every lane's
        # per-pixel iteration count (exactly what a GPU's atomics
        # accumulate, order aside).
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer Stats { float total[4]; } stats;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    float v = c.r;
    int n = 0;
    while (v < 1.0 && n < 30) {
        v = v * 1.4 + 0.03;
        atomicAdd(stats.total[0], 1.0);
        if (v > 0.9) { atomicAdd(stats.total[1], 1.0); }
        n++;
    }
    imageStore(output_image, pos, vec4(v, float(n), 0.0, 1.0));
}
"""
        spec = translate_shader(src, "loop_atomic")
        img = rand_image(12, 16, seed=7)
        ctx = KernelContext(width=16, height=12)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        got = np.asarray(out["output_image"])
        stats = np.asarray(out["Stats"])
        # numpy oracle
        v = np.asarray(img, np.float64)[0].copy()
        n = np.zeros_like(v)
        t0 = 0.0
        t1 = 0.0
        act = (v < 1.0) & (n < 30)
        while act.any():
            v = np.where(act, v * np.float32(1.4) + np.float32(0.03), v)
            t0 += act.sum()
            t1 += (act & (v > 0.9)).sum()
            n = np.where(act, n + 1, n)
            act = act & (v < 1.0) & (n < 30)
        np.testing.assert_allclose(got[1], n.astype(np.float32))
        assert stats[0] == t0, (stats, t0)
        assert stats[1] == t1, (stats, t1)

    def test_graph_pipeline_end_to_end(self):
        cfg = parse_file(WIRING, True, SHADER_DIR)
        assert cfg is not None, utils.recent_warnings()
        graph = build_graph(cfg)
        assert graph is not None, utils.recent_warnings()
        assert graph.resource_kinds["histogram:Bins"] == "buffer"
        assert graph.buffer_sizes["histogram:Bins"] == 256
        prog = make_program(graph, 48, 32)
        img = rand_image()
        out = np.asarray(prog(img, 0.0))
        assert out.shape == (4, 32, 48)
        assert np.isfinite(out).all()
        # Equalization flattens the luminance distribution: the output's
        # luma spread should widen vs a mid-heavy input.
        mid = jnp.clip(rand_image(seed=9) * 0.3 + 0.4, 0, 1)
        out2 = np.asarray(prog(mid, 0.0))
        i = np.asarray(mid)
        luma_in = 0.2126 * i[0] + 0.7152 * i[1] + 0.0722 * i[2]
        luma_out = 0.2126 * out2[0] + 0.7152 * out2[1] + 0.0722 * out2[2]
        assert luma_out.std() > luma_in.std()

    def test_kind_mismatch_rejected(self):
        # Wiring an image output into an SSBO input is a build error.
        src = "input -> gaussian:Bins -> equalize:Bins\ninput -> equalize -> output\n"
        cfg = parse_file(src, True, SHADER_DIR)
        assert build_graph(cfg) is None
        warnings = " ".join(utils.recent_warnings())
        assert "Bins" in warnings

    def test_python_ssbo_kernel(self):
        from reforge_tpu.kernels import KernelContext, kernel

        @kernel(
            "rowsum",
            images_in=("input_image",),
            images_out=(),
            ssbos_out=("sums",),
            ssbo_sizes={"sums": 64},
            register=False,
        )
        def rowsum(ctx, input_image):
            s = jnp.sum(input_image[0], axis=1)
            return {"sums": jnp.zeros((64,), jnp.float32).at[: s.shape[0]].set(s)}

        img = rand_image(h=16, w=8)
        ctx = KernelContext(width=8, height=16)
        out = rowsum(ctx, {"input_image": img}, {})["sums"]
        np.testing.assert_allclose(
            np.asarray(out)[:16], np.asarray(img)[0].sum(axis=1), atol=1e-5
        )


class TestSharded:
    def test_histogram_pipeline_sharded(self):
        from reforge_tpu.parallel import HaloShardedProgram, make_row_mesh

        cfg = parse_file(WIRING, True, SHADER_DIR)
        graph = build_graph(cfg)
        prog = make_program(graph, 48, 32)
        img = rand_image()
        want = np.asarray(prog(img, 0.0))
        mesh = make_row_mesh(8)
        sharded = HaloShardedProgram(prog, mesh)
        got = np.asarray(sharded(sharded.shard_input(img), 0.0))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestAtomicMinMax:
    def test_atomic_max_min_reduction(self):
        # The auto-exposure idiom: every pixel atomicMax-es its luma into
        # one cell; a second cell collects atomicMin of (luma - 1).
        # SSBO storage zero-fills (reference semantics), so the max
        # starts at 0 (luma >= 0) and the min cell uses negative values.
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer Stats { float cells[4]; } stats;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    float y = dot(c.rgb, vec3(0.2126, 0.7152, 0.0722));
    atomicMax(stats.cells[0], y);
    atomicMin(stats.cells[1], y - 1.0);
    if (c.a > 0.5) { atomicMax(stats.cells[2], y); }  // masked lanes
    imageStore(output_image, pos, c);
}
"""
        spec = translate_shader(src, "minmax")
        img = rand_image(12, 16, seed=11)
        ctx = KernelContext(width=16, height=12)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        cells = np.asarray(out["Stats"])
        i = np.asarray(img)
        y = 0.2126 * i[0] + 0.7152 * i[1] + 0.0722 * i[2]
        np.testing.assert_allclose(cells[0], y.max(), atol=1e-6)
        np.testing.assert_allclose(cells[1], (y - 1.0).min(), atol=1e-6)
        sel = y[i[3] > 0.5]
        want = sel.max() if sel.size else 0.0
        np.testing.assert_allclose(cells[2], max(want, 0.0), atol=1e-6)
        np.testing.assert_allclose(cells[3], 0.0)

    def test_atomic_max_inside_loop_carry(self):
        # atomicMax inside a data-dependent loop rides the same buffer
        # carry as atomicAdd: the final cell equals the max over every
        # (lane, iteration) value visited.
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer S { float peak[2]; } s;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    float v = imageLoad(input_image, pos).r;
    int n = 0;
    while (v < 1.2 && n < 12) {
        atomicMax(s.peak[0], v);
        v = v * 1.3 + 0.02;
        n++;
    }
    imageStore(output_image, pos, vec4(v, float(n), 0.0, 1.0));
}
"""
        spec = translate_shader(src, "loop_max")
        img = rand_image(10, 16, seed=13)
        ctx = KernelContext(width=16, height=10)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        peak = np.asarray(out["S"])[0]
        v = np.asarray(img, np.float64)[0].copy()
        best = 0.0
        n = np.zeros_like(v)
        for _ in range(12):
            live = (v < 1.2) & (n < 12)
            if not live.any():
                break
            best = max(best, float(np.float32(v[live]).max()))
            v = np.where(live, np.float32(np.float32(v * 1.3) + 0.02), v)
            n = np.where(live, n + 1, n)
        np.testing.assert_allclose(peak, best, atol=1e-6)


class TestAtomicBitwiseExchange:
    """atomicAnd/Or/Xor (exact 32-bitplane reductions), atomicExchange,
    and atomicCompSwap — the flag-mask / voting / lock idioms.

    Reference: shaderc compiles every GLSL atomic builtin
    (src/vulkan/shader.rs:73-93); execution order across invocations is
    undefined on a real GPU, so any conforming serialization is legal.
    """

    BITWISE_SRC = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { int bits[4]; } b;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int v = int(c.r * 255.0);
    b.bits[2] = 255;                    // seed the AND cell (uniform store)
    atomicOr(b.bits[0], 1 << (v & 7));
    atomicXor(b.bits[1], v - 128);      // negatives: two's complement
    atomicAnd(b.bits[2], v | 240);
    if (c.a > 0.5) { atomicOr(b.bits[3], 1 << (v & 3)); }
    imageStore(output_image, pos, c);
}
"""

    def test_atomic_or_xor_and_reduction(self):
        spec = translate_shader(self.BITWISE_SRC, "bitwise")
        img = rand_image(12, 16, seed=21)
        ctx = KernelContext(width=16, height=12)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        cells = np.asarray(out["B"]).astype(np.int64)
        i = np.asarray(img)
        v = (i[0] * 255.0).astype(np.int32)
        want_or = np.bitwise_or.reduce(1 << (v & 7), axis=None)
        want_xor = np.bitwise_xor.reduce((v - 128).ravel())
        want_and = np.bitwise_and.reduce((v | 240).ravel()) & 255
        sel = v[i[3] > 0.5]
        want_masked = (
            np.bitwise_or.reduce(1 << (sel & 3), axis=None)
            if sel.size else 0
        )
        assert cells[0] == want_or
        assert cells[1] == want_xor
        assert cells[2] == want_and
        assert cells[3] == want_masked

    def test_atomic_and_empty_mask_keeps_initial(self):
        # No lane passes the mask: AND must leave the seeded value alone
        # (cnt == 0 slots keep their bits).
        src = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { int m[2]; } b;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    b.m[0] = 77;
    if (c.a > 2.0) { atomicAnd(b.m[0], 1); }
    imageStore(output_image, pos, c);
}
"""
        spec = translate_shader(src, "and_empty")
        img = rand_image(8, 8, seed=3)
        ctx = KernelContext(width=8, height=8)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        assert np.asarray(out["B"])[0] == 77.0

    def test_atomic_exchange(self):
        src = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { float cells[3]; } b;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    atomicExchange(b.cells[0], 7.25);          // uniform value: any winner
    atomicExchange(b.cells[1], c.r);           // varying: one lane's value
    if (c.a > 2.0) { atomicExchange(b.cells[2], 99.0); }  // no lane
    imageStore(output_image, pos, c);
}
"""
        spec = translate_shader(src, "exchange")
        img = rand_image(8, 12, seed=5)
        ctx = KernelContext(width=12, height=8)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        cells = np.asarray(out["B"])
        assert cells[0] == 7.25
        assert np.isin(cells[1], np.asarray(img)[0]).item()
        assert cells[2] == 0.0

    def test_atomic_compswap_sequences(self):
        # Two sequential compSwaps: the second compares against the
        # first's result (statement-by-statement lockstep), and a failing
        # compare leaves the cell alone.
        src = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { int cells[3]; } b;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    atomicCompSwap(b.cells[0], 0, 3);   // 0 -> 3
    atomicCompSwap(b.cells[0], 3, 9);   // sees 3 -> 9
    atomicCompSwap(b.cells[1], 1, 5);   // never matches: stays 0
    atomicCompSwap(b.cells[2], 0, int(c.g * 100.0) + 1);  // varying data
    imageStore(output_image, pos, c);
}
"""
        spec = translate_shader(src, "compswap")
        img = rand_image(8, 8, seed=7)
        ctx = KernelContext(width=8, height=8)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        cells = np.asarray(out["B"])
        assert cells[0] == 9.0
        assert cells[1] == 0.0
        vals = (np.asarray(img)[1] * 100.0).astype(np.int32) + 1
        assert np.isin(cells[2], vals.astype(np.float32)).item()

    def test_atomic_or_on_shared_array(self):
        # Per-workgroup flag mask: every invocation ORs a bit in, the
        # post-barrier read sees the group's combined mask.
        src = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
shared int flags[2];

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int v = int(c.r * 255.0);
    atomicOr(flags[0], 1 << (v & 7));
    barrier();
    imageStore(output_image, pos, vec4(float(flags[0]), 0.0, 0.0, 1.0));
}
"""
        spec = translate_shader(src, "shared_or")
        img = rand_image(12, 16, seed=9)
        ctx = KernelContext(width=16, height=12)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        v = (np.asarray(img)[0] * 255.0).astype(np.int32)
        want = np.bitwise_or.reduce(1 << (v & 7), axis=None)
        np.testing.assert_array_equal(
            np.asarray(out["output_image"])[0], float(want)
        )

    def test_atomic_or_inside_loop_carry(self):
        # atomicOr inside a data-dependent loop rides the buffer carry:
        # the cell collects OR over every (lane, iteration) bit.
        src = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer B { int m[1]; } b;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    float v = imageLoad(input_image, pos).r;
    int n = 0;
    while (v < 1.0 && n < 8) {
        atomicOr(b.m[0], 1 << n);
        v = v * 1.4 + 0.05;
        n++;
    }
    imageStore(output_image, pos, vec4(v, float(n), 0.0, 1.0));
}
"""
        spec = translate_shader(src, "loop_or")
        img = rand_image(8, 12, seed=15)
        ctx = KernelContext(width=12, height=8)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        got = np.asarray(out["B"])[0]
        v = np.asarray(img, np.float64)[0].copy()
        n = np.zeros(v.shape, np.int64)
        want = 0
        for it in range(8):
            live = (v < 1.0) & (n < 8)
            if not live.any():
                break
            want |= 1 << it
            v = np.where(live, np.float32(np.float32(v * 1.4) + 0.05), v)
            n = np.where(live, n + 1, n)
        assert got == want


class TestSelfOwnedBuffer:
    """A buffer the SAME shader writes (atomics) and reads back needs no
    upstream edge: it self-initializes to zeros, like a written-only
    buffer (a Vulkan SSBO is just bound storage for the dispatch)."""

    SRC = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) buffer Flags { int mask[2]; } f;

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int band = int(c.r * 7.99);
    atomicOr(f.mask[0], 1 << band);
    float occupancy = float(bitCount(f.mask[0])) / 8.0;
    imageStore(output_image, pos, vec4(c.rgb * occupancy, c.a));
}
"""

    def test_reflection_keeps_block_as_in_and_out(self):
        spec = translate_shader(self.SRC, "flagmeter")
        assert "Flags" in spec.ssbos_in  # read back via bitCount
        assert "Flags" in spec.ssbos_out

    def test_unwired_read_write_buffer_builds_and_runs(self, tmp_path):
        shader = tmp_path / "flagmeter.comp"
        shader.write_text(self.SRC)
        cfg = parse_file(
            "input -> flagmeter -> output\n",
            expects_input=True,
            shader_path=str(tmp_path),
        )
        graph = build_graph(cfg)
        assert graph is not None
        prog = make_program(graph, 16, 8, "rgba32f")
        img = rand_image(8, 16, seed=33)
        out = np.asarray(prog(img, 0.0))
        v = (np.asarray(img)[0] * 7.99).astype(np.int32)
        occ = len(np.unique(v)) / 8.0
        np.testing.assert_allclose(
            out[:3], np.asarray(img)[:3] * occ, atol=1e-6
        )

    def test_int_member_read_type(self):
        # SSBO reads surface the declared element type (bitCount on an
        # int member must trace; storage stays f32 underneath).
        spec = translate_shader(self.SRC, "flagmeter")
        ctx = KernelContext(width=16, height=8)
        out = spec(ctx, {"input_image": rand_image(8, 16, seed=34),
                         "Flags": jnp.zeros((2,), jnp.float32)},
                   spec.resolve_params({}))
        assert out["output_image"].shape == (4, 8, 16)
