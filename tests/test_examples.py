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
