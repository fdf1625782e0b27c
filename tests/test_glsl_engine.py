"""End-to-end tests of .comp GLSL kernels inside the engine: resolution from
the shader path, live reload with keep-last-good on compile errors (the
reference's signature UX, src/render.rs:497-519 + shader.rs:88-92)."""

import os

import numpy as np
import pytest

from reforge_tpu import utils
from reforge_tpu.engine import Engine, RenderInfo

SHADER_DIR = os.path.join(os.path.dirname(__file__), "..", "shaders")

GAIN_SRC = """
#version 450
layout (local_size_x = 16, local_size_y = 16) in;
layout (binding = 0, rgba32f) uniform readonly  image2D input_image;
layout (binding = 1, rgba32f) uniform writeonly image2D output_image;
layout (binding = 2) uniform UBO { float gain; };
void main() {
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    imageStore(output_image, pos, imageLoad(input_image, pos) * %s);
}
"""


def bump_write(path, text):
    old = utils.get_modified_time(str(path))
    path.write_text(text)
    os.utime(str(path), ns=(old + 1_000_000, old + 1_000_000))


def make_engine(tmp_path, config_text, w=24, h=16, shader_path=None):
    cfg = tmp_path / "graph.rf"
    cfg.write_text(config_text)
    info = RenderInfo(
        width=w,
        height=h,
        config_path=str(cfg),
        shader_path=shader_path or str(tmp_path),
        has_input_image=True,
    )
    eng = Engine(info)
    rgba = np.random.default_rng(0).integers(0, 256, (h, w, 4), dtype=np.uint8)
    eng.load_input(rgba)
    return eng, cfg


class TestCompKernels:
    def test_shipped_shader_library_resolves(self, tmp_path):
        eng, _ = make_engine(
            tmp_path,
            "input -> invert -> output",
            shader_path=SHADER_DIR,
        )
        # Resolved to shaders/invert.comp (file beats builtin).
        node = eng.program.graph.nodes["invert"]
        assert node.spec.source_path and node.spec.source_path.endswith("invert.comp")
        out = np.asarray(eng.render_frame_blocking(0.0))
        inp = np.asarray(eng._input_planar)
        np.testing.assert_allclose(out[:3], 1.0 - inp[:3], atol=1e-6)

    def test_comp_with_params(self, tmp_path):
        (tmp_path / "gain.comp").write_text(GAIN_SRC % "gain")
        eng, _ = make_engine(
            tmp_path,
            "input -> gg -> output\ngg: gain { gain: 2.0 }",
        )
        out = np.asarray(eng.render_frame_blocking(0.0))
        inp = np.asarray(eng._input_planar)
        np.testing.assert_allclose(out, inp * 2.0, atol=1e-6)

    def test_comp_live_reload(self, tmp_path):
        shader = tmp_path / "gain.comp"
        shader.write_text(GAIN_SRC % "2.0")
        eng, _ = make_engine(tmp_path, "input -> gain -> output")
        inp = np.asarray(eng._input_planar)
        out = np.asarray(eng.render_frame_blocking(0.0))
        np.testing.assert_allclose(out, inp * 2.0, atol=1e-6)

        bump_write(shader, GAIN_SRC % "3.0")
        assert eng.trigger_reloads() is True
        out2 = np.asarray(eng.render_frame_blocking(0.0))
        np.testing.assert_allclose(out2, inp * 3.0, atol=1e-6)

    def test_comp_syntax_error_keeps_last_good(self, tmp_path):
        shader = tmp_path / "gain.comp"
        shader.write_text(GAIN_SRC % "2.0")
        eng, _ = make_engine(tmp_path, "input -> gain -> output")
        out = np.asarray(eng.render_frame_blocking(0.0))

        bump_write(shader, "void main( { this is not glsl")
        assert eng.trigger_reloads() is False
        assert any("Error compiling GLSL" in w for w in utils.recent_warnings())
        out2 = np.asarray(eng.render_frame_blocking(0.0))
        np.testing.assert_array_equal(out, out2)

        # Fix it again -> swap succeeds.
        bump_write(shader, GAIN_SRC % "4.0")
        assert eng.trigger_reloads() is True
        out3 = np.asarray(eng.render_frame_blocking(0.0))
        np.testing.assert_allclose(out3, np.asarray(eng._input_planar) * 4.0, atol=1e-6)

    def test_reference_demo_graph(self, tmp_path):
        """The reference README demo: blur + sharpen fan-in blended."""
        src = (
            "input -> gaussian -> blend -> output\n"
            "input -> sharpen -> blend:input_image2\n"
            "gaussian: gaussian { sigma: 2.0 }\n"
            "blend: blend { factor: 0.5 }\n"
        )
        eng, _ = make_engine(tmp_path, src, shader_path=SHADER_DIR)
        out = np.asarray(eng.render_frame_blocking(0.0))
        assert out.shape == (4, 16, 24)
        assert np.isfinite(out).all()

    def test_single_comp_shader_cli_mode(self, tmp_path):
        shader = tmp_path / "boost.comp"
        shader.write_text(GAIN_SRC % "1.5")
        info = RenderInfo(
            width=24, height=16,
            shader_file_path=str(shader),
            has_input_image=True,
        )
        eng = Engine(info)
        rgba = np.random.default_rng(0).integers(0, 256, (16, 24, 4), np.uint8)
        eng.load_input(rgba)
        out = np.asarray(eng.render_frame_blocking(0.0))
        np.testing.assert_allclose(out, np.asarray(eng._input_planar) * 1.5, atol=1e-6)
