"""Differential: vectorized GLSL engine vs the sequential scalar reference.

The vectorizing interpreter's whole-image masked execution must agree
with textbook per-pixel sequential semantics (tests/scalar_ref.py) on
the shipped shader library and on the loop-fuzz grammar.  This is the
strongest independence we can get without a Vulkan driver: two
implementations sharing only the parser (PARITY.md records why the real
reference binary cannot run here)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from reforge_tpu.glsl import translate_shader
from reforge_tpu.kernels.base import KernelContext

from scalar_ref import ScalarRef

SHADER_DIR = os.path.join(os.path.dirname(__file__), "..", "shaders")

# Shipped compute shaders whose math is numerically stable enough for a
# f32-engine vs f64-reference comparison (excluded: mandelbrot/raymarch —
# escape-time boundaries amplify f32-vs-f64 to whole-pixel flips; blend —
# multi-image wiring; histogram/equalize — SSBO; crt — fragment stage).
STABLE = [
    "passthrough", "invert", "sepia", "tonemap", "vignette", "sharpen",
    "sobel", "zoom", "wave", "pixelate", "gaussian_h", "gaussian_v",
    "ink_drip", "light_trails", "kuwahara", "flow_field", "glass",
]


def _run_both(src, name, h=10, w=12, seed=0, time=0.5):
    spec = translate_shader(src, name)
    rng = np.random.default_rng(seed)
    base = rng.random((4, h, w)).astype(np.float32)
    params = spec.resolve_params({})
    ctx = KernelContext(width=w, height=h, time=time)
    imgs = {n: jnp.asarray(base) for n in spec.images_in}
    got = np.asarray(spec(ctx, imgs, params)["output_image"], np.float64)

    ref = ScalarRef(
        src, {n: base for n in spec.images_in}, params=params, time=time
    )
    want = ref.run()["output_image"]
    return got, want


@pytest.mark.parametrize("stem", STABLE)
def test_shipped_shader_matches_scalar_ref(stem):
    path = os.path.join(SHADER_DIR, f"{stem}.comp")
    with open(path) as f:
        src = f.read()
    got, want = _run_both(src, stem, seed=7)
    np.testing.assert_allclose(got, want, atol=3e-4, err_msg=stem)


def test_fragment_shader_matches_scalar_ref():
    # crt.frag: fragment stage — uv varying, gl_FragCoord, sampler.
    path = os.path.join(SHADER_DIR, "crt.frag")
    with open(path) as f:
        src = f.read()
    spec = translate_shader(src, "crt", stage="fragment")
    h, w = 10, 12
    rng = np.random.default_rng(5)
    base = rng.random((4, h, w)).astype(np.float32)
    params = spec.resolve_params({})
    ctx = KernelContext(width=w, height=h, time=0.0)
    got = np.asarray(
        spec(ctx, {"input_image": jnp.asarray(base)}, params)["output_image"],
        np.float64,
    )
    ref = ScalarRef(
        src, {"input_image": base}, params=params, stage="fragment"
    )
    want = ref.run()["output_image"]
    np.testing.assert_allclose(got, want, atol=3e-4)


@pytest.mark.parametrize("seed", range(12))
def test_loop_fuzz_matches_scalar_ref(seed):
    # Reuse the loop-grammar generator: the scalar reference is a second,
    # implementation-independent oracle for the same random shaders.
    from test_fuzz import _loop_case, _loop_shader_src

    p = _loop_case(seed)
    header = (
        "#version 450\n"
        "layout(local_size_x = 16, local_size_y = 16) in;\n"
        "layout(binding = 0, rgba32f) uniform readonly image2D input_image;\n"
        "layout(binding = 1, rgba32f) uniform writeonly image2D output_image;\n"
    )
    src = header + _loop_shader_src(p)
    got, want = _run_both(src, f"sref{seed}", seed=100 + seed, time=0.0)
    np.testing.assert_allclose(got, want, atol=3e-4, err_msg=str(p))


def test_switch_dowhile_matrix_matches_scalar_ref():
    # Constructs the grammar fuzzers don't emit: switch with fallthrough
    # on a per-pixel selector, do-while, mat2 algebra, ternaries.
    src = """#version 450
layout(local_size_x = 16, local_size_y = 16) in;
layout(binding = 0, rgba32f) uniform readonly image2D input_image;
layout(binding = 1, rgba32f) uniform writeonly image2D output_image;
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = imageLoad(input_image, pos);
    int sel = int(c.r * 3.9);
    float acc = 0.0;
    switch (sel) {
        case 0:
            acc += 0.1;
        case 1:
            acc += 0.2;
            break;
        case 2:
            acc = 0.9;
            break;
        default:
            acc = -0.5;
    }
    float v = c.g;
    do {
        v = v * 0.8 + 0.05;
    } while (v > 0.3);
    mat2 rot = mat2(0.8, 0.6, -0.6, 0.8);
    vec2 p = rot * vec2(c.b - 0.5, c.a - 0.5);
    float m = p.x > p.y ? p.x : p.y;
    imageStore(output_image, pos, vec4(acc, v, m, 1.0));
}
"""
    got, want = _run_both(src, "swdm", seed=21)
    np.testing.assert_allclose(got, want, atol=3e-5)
