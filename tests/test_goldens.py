"""Golden-image regression tests.

Each config renders a fixed 64x64 seeded input on CPU and compares against
a stored PNG golden (tests/goldens/). Regenerate after INTENTIONAL visual
changes with: python tests/test_goldens.py --regen

Comparison allows ±1 u8 code value: XLA versions/platforms may reassociate
float sums, flipping isolated rounding boundaries after sRGB encode.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CONFIGS = {
    "passthrough": "input -> passthrough -> output",
    "gaussian": "input -> gs -> output\ngs: gaussian { sigma: 3.0 }",
    "chain": "input -> blur -> sobel -> tonemap -> output\nblur: blur { sigma: 1.5 }",
    "branch": (
        "input -> gs -> mixit -> output\n"
        "input -> sharpen -> mixit:input_image2\n"
        "gs: gaussian { sigma: 2.0 }\nmixit: mix { factor: 0.5 }"
    ),
    "warp": "input -> swirl -> vignette -> output\nswirl: swirl { angle: 1.5 }",
    "generator": (
        "input -> mixit -> output\ncb -> mixit:input_image2\n"
        "cb: checkerboard { size: 8 }\nmixit: mix { factor: 0.4 }"
    ),
    "rgba8_quantized": "input -> gamma -> output\ngamma: gamma { value: 1.8 }",
    "newsprint": (
        "input -> smooth -> dots -> output\n"
        "smooth: bilateral { radius: 3, sigma_range: 0.12 }\n"
        "dots: halftone { size: 6, angle: 15.0 }"
    ),
    "pop_grade": (
        "input -> spin -> lv -> zoom -> output\n"
        "spin: hue_saturation { hue: 40.0, saturation: 1.5 }\n"
        "lv: levels { in_black: 0.1, gamma: 1.2 }\n"
        "zoom: radial_blur { strength: 0.1, samples: 8 }"
    ),
}


def render(name: str) -> np.ndarray:
    import jax.numpy as jnp

    from reforge_tpu.config import parse
    from reforge_tpu.graph import build_graph, make_program
    from reforge_tpu.io import decode_image_to_planar, encode_planar_to_image

    rng = np.random.default_rng(42)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    fmt = "rgba8" if name == "rgba8_quantized" else "rgba32f"
    cfg = parse(CONFIGS[name], expects_input=True)
    prog = make_program(build_graph(cfg), 64, 64, fmt)
    planar = decode_image_to_planar(jnp.asarray(rgba))
    out = prog(planar, 0.0)
    return np.asarray(encode_planar_to_image(out))


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.png")


def test_goldens():
    from PIL import Image

    missing = [n for n in CONFIGS if not os.path.exists(golden_path(n))]
    assert not missing, f"missing goldens {missing}; run --regen"
    for name in CONFIGS:
        got = render(name)
        want = np.asarray(Image.open(golden_path(name)).convert("RGBA"))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, (
            f"golden mismatch for {name}: max diff {diff.max()}, "
            f"{(diff > 1).sum()} pixels off"
        )


# ---- per-shader goldens -------------------------------------------------
# Every shipped .comp/.frag renders the seeded input with generic params;
# guards the GLSL compiler against regressions shader by shader.

SHADER_DIR = os.path.join(os.path.dirname(__file__), "..", "shaders")
GENERIC_PARAMS = {
    "sigma": 2.0, "amount": 1.0, "factor": 0.5, "exposure": 1.0,
    "strength": 0.5, "radius": 0.7, "size": 4, "amplitude": 4.0,
    "frequency": 0.1, "zoom": 1.3, "curvature": 0.1, "scan_darkness": 0.3,
}


def shader_names():
    import glob as _glob

    from reforge_tpu.kernels.loader import load_kernel_file

    names = []
    for p in sorted(_glob.glob(os.path.join(SHADER_DIR, "*.comp"))
                    + _glob.glob(os.path.join(SHADER_DIR, "*.frag"))):
        stem = os.path.splitext(os.path.basename(p))[0]
        spec = load_kernel_file(p)
        # Structural exclusions: shaders whose wiring isn't image→image
        # (SSBO producers/consumers like histogram/equalize/expose_meter)
        # are covered by the pipeline-level example goldens instead.
        if spec is None or spec.ssbos_in or "output_image" not in spec.images_out:
            continue
        names.append((stem, p))
    return names


def render_shader(path: str) -> np.ndarray:
    import jax.numpy as jnp

    from reforge_tpu.io import decode_image_to_planar, encode_planar_to_image
    from reforge_tpu.kernels.base import KernelContext
    from reforge_tpu.kernels.loader import load_kernel_file

    spec = load_kernel_file(path)
    assert spec is not None, path
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    planar = decode_image_to_planar(jnp.asarray(rgba))
    ctx = KernelContext(width=64, height=64, time=0.5)
    params = spec.resolve_params(
        {k: v for k, v in GENERIC_PARAMS.items() if k in spec.params}
    )
    out = spec(ctx, {n: planar for n in spec.images_in}, params)["output_image"]
    return np.asarray(encode_planar_to_image(out))


def test_shader_goldens():
    from PIL import Image

    for stem, path in shader_names():
        gpath = os.path.join(GOLDEN_DIR, f"shader_{stem}.png")
        assert os.path.exists(gpath), f"missing golden for {stem}; run --regen"
        got = render_shader(path)
        want = np.asarray(Image.open(gpath).convert("RGBA"))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, f"shader golden mismatch: {stem} (max {diff.max()})"


# ---- per-builtin-kernel goldens -----------------------------------------
# One golden per builtin library kernel at default parameters; pins every
# kernel against refactors (the numeric tests check the math, these catch
# any drift at all).


def builtin_names():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from reforge_tpu.kernels import builtin_kernels

    names = []
    for name, spec in sorted(builtin_kernels().items()):
        if spec.ssbos_in or spec.ssbos_out:
            continue  # SSBO wiring covered by the equalize pipeline golden
        names.append(name)
    return names


def render_builtin(name: str) -> np.ndarray:
    import jax.numpy as jnp

    from reforge_tpu.io import decode_image_to_planar, encode_planar_to_image
    from reforge_tpu.kernels import builtin_kernels
    from reforge_tpu.kernels.base import KernelContext

    spec = builtin_kernels()[name]
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (48, 48, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    planar = decode_image_to_planar(jnp.asarray(rgba))
    ctx = KernelContext(width=48, height=48, time=0.3)
    images = {n: planar for n in spec.images_in}
    out = spec(ctx, images, spec.resolve_params({}))
    key = spec.images_out[0] if spec.images_out else "output_image"
    return np.asarray(encode_planar_to_image(out[key]))


def test_builtin_kernel_goldens():
    from PIL import Image

    names = builtin_names()
    assert len(names) >= 40, f"builtin sweep shrank: {len(names)}"
    missing = [
        n for n in names
        if not os.path.exists(os.path.join(GOLDEN_DIR, f"kernel_{n}.png"))
    ]
    assert not missing, f"missing kernel goldens {missing}; run --regen"
    for name in names:
        got = render_builtin(name)
        want = np.asarray(
            Image.open(os.path.join(GOLDEN_DIR, f"kernel_{name}.png")).convert("RGBA")
        )
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, (
            f"kernel golden mismatch: {name} (max {diff.max()})"
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from PIL import Image

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in CONFIGS:
            Image.fromarray(render(name), "RGBA").save(golden_path(name))
            print(f"wrote {golden_path(name)}")
        for stem, path in shader_names():
            gpath = os.path.join(GOLDEN_DIR, f"shader_{stem}.png")
            Image.fromarray(render_shader(path), "RGBA").save(gpath)
            print(f"wrote {gpath}")
        for name in builtin_names():
            gpath = os.path.join(GOLDEN_DIR, f"kernel_{name}.png")
            Image.fromarray(render_builtin(name), "RGBA").save(gpath)
            print(f"wrote {gpath}")
    else:
        print("use --regen to regenerate goldens")


