"""Every shipped example config must parse and build.

The reference ships a single demo config implicitly (the default
``input -> passthrough -> output``, render.rs:115); this framework ships
21 example ``.rf`` configs under ``examples/`` exercising builtin
kernels, ``.comp``/``.frag`` GLSL shaders, fan-in blends, SSBO
pipelines, image-atomic splats, and data-dependent-loop shaders.  A shipped example that no
longer builds is a release regression, so each one is held to the full
parse -> graph -> program path (``make_program`` runs eval_shape
build-time validation, which traces every kernel).
"""

import glob
import os
import pathlib

import pytest

from reforge_tpu.config import parse_file
from reforge_tpu.graph import build_graph, make_program

REPO = pathlib.Path(__file__).resolve().parent.parent
EXAMPLES = sorted(glob.glob(str(REPO / "examples" / "*.rf")))


def test_examples_present():
    assert len(EXAMPLES) >= 13


@pytest.mark.parametrize(
    "path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES]
)
def test_example_builds(path):
    cfg = parse_file(
        pathlib.Path(path).read_text(), True, str(REPO / "shaders")
    )
    assert cfg is not None, f"{path}: parse failed"
    program = make_program(build_graph(cfg), 128, 96)
    assert program is not None, f"{path}: program build failed"


# ---- end-to-end render goldens -------------------------------------------
# Building a program traces every kernel via eval_shape, but only a real
# render executes the compiled path (scatter shapes, atomics, while-loop
# carries, SSBO round trips).  Each shipped example renders a fixed seeded
# 64x64 input on CPU and is pinned against a stored golden
# (tests/goldens/example_<name>.png); regenerate after INTENTIONAL visual
# changes with: python tests/test_examples.py --regen
# Tolerance ±1 u8 code value for cross-platform float reassociation,
# matching test_goldens.py.

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def render_example(path: str) -> "np.ndarray":
    import jax.numpy as jnp

    from reforge_tpu.io import decode_image_to_planar, encode_planar_to_image

    cfg = parse_file(
        pathlib.Path(path).read_text(), True, str(REPO / "shaders")
    )
    prog = make_program(build_graph(cfg), 64, 64)
    rng = np.random.default_rng(23)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    planar = decode_image_to_planar(jnp.asarray(rgba))
    out = prog(planar, 0.5)
    return np.asarray(encode_planar_to_image(out))


def example_golden_path(path: str) -> str:
    stem = os.path.splitext(os.path.basename(path))[0]
    return os.path.join(GOLDEN_DIR, f"example_{stem}.png")


@pytest.mark.parametrize(
    "path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES]
)
def test_example_renders(path):
    from PIL import Image

    gpath = example_golden_path(path)
    assert os.path.exists(gpath), (
        f"missing golden {gpath}; run: python tests/test_examples.py --regen"
    )
    got = render_example(path)
    assert got.shape == (64, 64, 4)
    want = np.asarray(Image.open(gpath).convert("RGBA"))
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, (
        f"example golden mismatch for {os.path.basename(path)}: "
        f"max diff {diff.max()}, {(diff > 1).sum()} pixels off"
    )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from PIL import Image

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for p in EXAMPLES:
            Image.fromarray(render_example(p), "RGBA").save(
                example_golden_path(p)
            )
            print(f"wrote {example_golden_path(p)}")
    else:
        print("use --regen to regenerate example goldens")
