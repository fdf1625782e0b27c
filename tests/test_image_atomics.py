"""Image atomics: imageAtomicAdd/Min/Max/And/Or/Xor/Exchange/CompSwap on
storage images (channel 0, the GLSL r32i/r32ui/r32f value view) — the
splat/voting idiom (point scatter-accumulation, depth-max, pixel
claiming).  The reference compiles these natively via shaderc
(shader.rs:73-93); here they lower to the same masked scatter-reductions
as the SSBO atomics, applied to the image's red plane.
"""

import numpy as np
import pytest

from reforge_tpu.glsl import GlslError, translate_shader
from reforge_tpu.kernels.base import KernelContext

import jax.numpy as jnp


def rand_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((4, h, w), dtype=np.float32))


def run(src, name, img, h, w):
    spec = translate_shader(src, name)
    ctx = KernelContext(width=w, height=h)
    return spec, spec(ctx, {"input_image": img}, spec.resolve_params({}))


HEADER = """
#version 450
layout (binding = 0, rgba32f) uniform readonly image2D input_image;
layout (binding = 1, r32f) uniform image2D output_image;
"""


class TestImageAtomicAdd:
    def test_histogram_splat(self):
        # Every pixel adds 1 at (bucket, 0): an image-resident histogram.
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int bucket = clamp(int(c.r * 16.0), 0, 15);
    imageAtomicAdd(output_image, ivec2(bucket, 0), 1.0);
}
"""
        img = rand_image(12, 16, seed=1)
        _, out = run(src, "img_hist", img, 12, 16)
        got = np.asarray(out["output_image"])[0]
        want = np.bincount(
            np.clip((np.asarray(img)[0] * 16.0).astype(int), 0, 15).ravel(),
            minlength=16,
        )
        np.testing.assert_array_equal(got[0, :16].astype(int), want)
        # Untouched pixels keep their (zero) contents; other channels ride.
        assert got[1:].sum() == 0.0

    def test_oob_coords_dropped(self):
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    imageAtomicAdd(output_image, ivec2(pos.x - 1000, pos.y), 5.0);
}
"""
        img = rand_image(6, 8, seed=2)
        _, out = run(src, "img_oob", img, 6, 8)
        assert np.asarray(out["output_image"])[0].sum() == 0.0

    def test_masked_under_if(self):
        # Only lanes inside the per-pixel branch contribute.
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    if (c.r > 0.5) { imageAtomicAdd(output_image, ivec2(0, 0), 1.0); }
}
"""
        img = rand_image(10, 10, seed=3)
        _, out = run(src, "img_masked", img, 10, 10)
        got = np.asarray(out["output_image"])[0]
        assert got[0, 0] == float((np.asarray(img)[0] > 0.5).sum())

    def test_sequential_calls_accumulate(self):
        # Two call sites chain: the second RMWs the first's result.
        src = HEADER + """
void main() {
    imageAtomicAdd(output_image, ivec2(1, 1), 1.0);
    imageAtomicAdd(output_image, ivec2(1, 1), 2.0);
}
"""
        img = rand_image(4, 4, seed=4)
        _, out = run(src, "img_seq", img, 4, 4)
        assert np.asarray(out["output_image"])[0][1, 1] == 3.0 * 16


class TestImageAtomicMinMax:
    def test_depth_max_per_column(self):
        # Column-wise max splat — the depth-buffer voting idiom.
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    imageAtomicMax(output_image, ivec2(pos.x, 0), c.g);
    imageAtomicMin(output_image, ivec2(pos.x, 1), c.g);
}
"""
        img = rand_image(9, 7, seed=5)
        _, out = run(src, "img_max", img, 9, 7)
        got = np.asarray(out["output_image"])[0]
        g = np.asarray(img)[1]
        np.testing.assert_allclose(got[0], g.max(axis=0), rtol=0, atol=0)
        # Min against the initial zeros stays zero (conforming: the
        # image's prior contents participate in the reduction).
        np.testing.assert_array_equal(got[1], 0.0)


class TestImageAtomicBitwise:
    def test_or_flags(self):
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int bit = int(c.b * 255.0) & 7;
    imageAtomicOr(output_image, ivec2(0, 0), 1 << bit);
}
"""
        img = rand_image(8, 8, seed=6)
        _, out = run(src, "img_or", img, 8, 8)
        got = np.asarray(out["output_image"])[0][0, 0]
        bits = (np.asarray(img)[2] * 255.0).astype(np.int32) & 7
        want = np.bitwise_or.reduce(1 << bits, axis=None)
        assert int(got) == int(want)

    def test_exchange_one_winner(self):
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    imageAtomicExchange(output_image, ivec2(2, 3), c.r);
}
"""
        img = rand_image(6, 6, seed=7)
        _, out = run(src, "img_xchg", img, 6, 6)
        got = np.asarray(out["output_image"])[0]
        assert np.isin(got[3, 2], np.asarray(img)[0]).item()
        rest = got.copy()
        rest[3, 2] = 0.0
        assert rest.sum() == 0.0

    def test_compswap_claim(self):
        # First-come claim on a zero cell: exactly one lane's value lands,
        # and a non-matching compare leaves the cell alone.
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    imageAtomicCompSwap(output_image, ivec2(0, 0), 0, int(c.r * 100.0) + 1);
    imageAtomicCompSwap(output_image, ivec2(1, 0), 7, 42);
}
"""
        img = rand_image(5, 5, seed=8)
        _, out = run(src, "img_cas", img, 5, 5)
        got = np.asarray(out["output_image"])[0]
        vals = (np.asarray(img)[0] * 100.0).astype(np.int32) + 1
        assert np.isin(got[0, 0], vals.astype(np.float32)).item()
        assert got[0, 1] == 0.0


class TestImageAtomicInLoops:
    def test_add_inside_data_dependent_loop(self):
        # The splat target rides the loop carry: per-round adds masked to
        # active lanes accumulate exactly as sequential rounds would.
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    float v = c.r;
    int n = 0;
    while (v < 1.0 && n < 20) {
        imageAtomicAdd(output_image, ivec2(0, 0), 1.0);
        v = v * 1.5 + 0.05;
        n++;
    }
}
"""
        img = rand_image(8, 10, seed=9)
        spec, out = run(src, "img_loop", img, 8, 10)
        got = np.asarray(out["output_image"])[0][0, 0]
        v = np.asarray(img, np.float64)[0].copy()
        n = np.zeros_like(v)
        total = 0
        act = (v < 1.0) & (n < 20)
        while act.any():
            total += act.sum()
            v = np.where(act, v * np.float32(1.5) + np.float32(0.05), v)
            n = np.where(act, n + 1, n)
            act = act & (v < 1.0) & (n < 20)
        assert got == total, (got, total)

    def test_add_in_callee_inside_loop(self):
        # Transitive effect discovery: the callee's atomic target is
        # carried through the loop like a direct store.
        src = HEADER + """
void vote(int slot) {
    imageAtomicAdd(output_image, ivec2(slot, 0), 1.0);
}

void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    float v = c.r;
    int n = 0;
    while (v < 1.0 && n < 10) {
        vote(n);
        v = v * 2.0 + 0.1;
        n++;
    }
}
"""
        img = rand_image(6, 12, seed=10)
        _, out = run(src, "img_callee", img, 6, 12)
        got = np.asarray(out["output_image"])[0][0]
        v = np.asarray(img, np.float64)[0].copy()
        n = np.zeros_like(v, dtype=int)
        counts = np.zeros(10, dtype=int)
        act = (v < 1.0) & (n < 10)
        r = 0
        while act.any():
            counts[r] += act.sum()
            v = np.where(act, v * np.float32(2.0) + np.float32(0.1), v)
            n = np.where(act, n + 1, n)
            act = act & (v < 1.0) & (n < 10)
            r += 1
        np.testing.assert_array_equal(got[:10].astype(int), counts)


class TestWaveformScope:
    """The shipped waveform-monitor pair (shaders/waveform.comp +
    shaders/scope_overlay.comp): the first real imageAtomicAdd consumer."""

    SHADER_DIR = __file__.rsplit("/", 2)[0] + "/shaders"

    def _luma_rows(self, img, h):
        # f32 arithmetic mirrors the interpreter exactly.
        i = np.asarray(img, np.float32)
        luma = np.clip(
            np.float32(0.2126) * i[0]
            + np.float32(0.7152) * i[1]
            + np.float32(0.0722) * i[2],
            0.0,
            1.0,
        ).astype(np.float32)
        rows = (
            (np.float32(1.0) - luma) * np.float32(h - 1) + np.float32(0.5)
        ).astype(np.int32)
        return np.clip(rows, 0, h - 1)

    def test_meter_matches_2d_histogram(self):
        src = open(self.SHADER_DIR + "/waveform.comp").read()
        h, w = 24, 32
        img = rand_image(h, w, seed=11)
        spec = translate_shader(src, "waveform")
        ctx = KernelContext(width=w, height=h)
        out = spec(ctx, {"input_image": img}, spec.resolve_params({}))
        got = np.asarray(out["output_image"])[0]
        rows = self._luma_rows(img, h)
        want = np.zeros((h, w), np.int64)
        for x in range(w):
            want[:, x] = np.bincount(rows[:, x], minlength=h)
        np.testing.assert_array_equal(got.astype(np.int64), want)

    def test_pipeline_end_to_end(self):
        from reforge_tpu.config import parse_file
        from reforge_tpu.graph import build_graph, make_program

        wiring = (
            "input -> meter\n"
            "meter -> scope:scope_image\n"
            "input -> scope -> output\n"
            "meter: waveform {}\n"
            "scope: scope_overlay { scale: 0.4, gain: 0.12 }\n"
        )
        cfg = parse_file(wiring, True, self.SHADER_DIR)
        assert cfg is not None
        h, w = 40, 60
        prog = make_program(build_graph(cfg), w, h)
        img = rand_image(h, w, seed=12)
        out = np.asarray(prog(img, 0.0))
        # Exact numpy oracle of both passes.
        rows = self._luma_rows(img, h)
        scope = np.zeros((h, w), np.float32)
        for x in range(w):
            scope[:, x] = np.bincount(rows[:, x], minlength=h)
        s, g = np.float32(0.4), np.float32(0.12)
        panel_w = int(np.float32(w) * s)
        panel_h = int(np.float32(h) * s)
        cx, cy = w - panel_w, h - panel_h
        i = np.asarray(img, np.float32)
        want = i.copy()
        for y in range(cy, h):
            for x in range(cx, w):
                sx = int(np.float32(x - cx) / s)
                sy = int(np.float32(y - cy) / s)
                n = scope[sy, sx]
                trace = 1.0 - np.exp(-n * g)
                bg = i[:3, y, x] * np.float32(0.25)
                fg = np.asarray([0.2, 1.0, 0.35], np.float32)
                want[:3, y, x] = bg + (fg - bg) * trace
        np.testing.assert_allclose(out, want, atol=1e-5)
        # The panel region visibly differs from the passthrough source.
        assert np.abs(out[:3, cy:, cx:] - i[:3, cy:, cx:]).max() > 0.05


class TestReflectionAndErrors:
    def test_atomic_target_is_output(self):
        src = HEADER + """
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    imageAtomicAdd(output_image, ivec2(0, 0), c.r);
}
"""
        spec = translate_shader(src, "img_refl")
        assert "output_image" in spec.images_out
        assert "output_image" not in spec.images_in

    def test_bad_coord_rejected(self):
        src = HEADER + """
void main() {
    imageAtomicAdd(output_image, 3, 1.0);
}
"""
        with pytest.raises(GlslError, match="ivec2"):
            run(src, "img_badcoord", rand_image(4, 4), 4, 4)

    def test_wrong_arity_rejected(self):
        src = HEADER + """
void main() {
    imageAtomicCompSwap(output_image, ivec2(0, 0), 1.0);
}
"""
        with pytest.raises(GlslError, match="compare, data"):
            run(src, "img_badarity", rand_image(4, 4), 4, 4)
