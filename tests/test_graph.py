"""Graph synthesis + fused program tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from reforge_tpu import utils
from reforge_tpu.config import parse
from reforge_tpu.graph import build_graph, make_program
from reforge_tpu.kernels import ops


def build(src, expects_input=True, w=24, h=16, fmt="rgba32f"):
    cfg = parse(src, expects_input)
    assert cfg is not None, utils.recent_warnings()
    graph = build_graph(cfg)
    if graph is None:
        return None, None
    return graph, make_program(graph, w, h, fmt)


def rand_image(h=16, w=24, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((4, h, w), dtype=np.float32))


class TestScheduling:
    def test_linear_chain_layers(self):
        graph, _ = build("input -> blur -> sharpen -> output")
        assert [[n.name for n in layer] for layer in graph.layers] == [
            ["blur"],
            ["sharpen"],
        ]

    def test_branching_layers(self):
        src = (
            "input -> blur -> mix -> output\n"
            "input -> sharpen -> mix:input_image2\n"
        )
        graph, _ = build(src)
        names = [[n.name for n in layer] for layer in graph.layers]
        assert names == [["blur", "sharpen"], ["mix"]]

    def test_cycle_detected(self):
        # a2 reads b2's output and b2 reads a2's -> cycle
        src = (
            "input -> mixer -> output\n"
            "mixer -> blur2 -> mixer:input_image2\n"
            "mixer: mix {}\nblur2: blur {}\n"
        )
        cfg = parse(src, True)
        assert cfg is not None
        assert build_graph(cfg) is None
        assert any("cycle" in w.lower() for w in utils.recent_warnings())

    def test_unknown_kernel_fails_build(self):
        graph, _ = build("input -> nonexistent_kernel_xyz -> output")
        assert graph is None
        assert any("No kernel source" in w for w in utils.recent_warnings())

    def test_unknown_descriptor_fails_build(self):
        graph, _ = build("input -> blur:bogus_desc -> sharpen -> output")
        assert graph is None
        assert any("bogus_desc" in w for w in utils.recent_warnings())

    def test_unconnected_input_fails_build(self):
        # blend needs input_image2 but only one input is wired
        graph, _ = build("input -> blend -> output")
        assert graph is None
        assert any("not connected" in w for w in utils.recent_warnings())


class TestExecution:
    def test_passthrough_identity(self):
        _, prog = build("input -> passthrough -> output")
        img = rand_image()
        out = np.asarray(prog(img, 0.0))
        np.testing.assert_array_equal(out, np.asarray(img))

    def test_three_node_chain(self):
        _, prog = build(
            "input -> gs -> sobel -> tonemap -> output\n"
            "gs: gaussian { sigma: 1.5 }\n"
        )
        img = rand_image()
        out = np.asarray(prog(img, 0.0))
        assert out.shape == (4, 16, 24)
        assert np.isfinite(out).all()

    def test_branching_equals_manual(self):
        src = (
            "input -> gs -> mixit -> output\n"
            "input -> sharp -> mixit:input_image2\n"
            "gs: gaussian { sigma: 2.0 }\n"
            "sharp: sharpen { amount: 0.5 }\n"
            "mixit: mix { factor: 0.5 }\n"
        )
        _, prog = build(src)
        img = rand_image(16, 24, seed=7)
        out = np.asarray(prog(img, 0.0))

        from reforge_tpu.kernels import KernelContext, lookup_builtin

        ctx = KernelContext(width=24, height=16, time=0.0)
        g = lookup_builtin("gaussian")
        s = lookup_builtin("sharpen")
        m = lookup_builtin("mix")
        blurred = g(ctx, {"input_image": img}, g.resolve_params({"sigma": 2.0}))[
            "output_image"
        ]
        sharped = s(ctx, {"input_image": img}, s.resolve_params({"amount": 0.5}))[
            "output_image"
        ]
        mixed = m(
            ctx,
            {"input_image": blurred, "input_image2": sharped},
            m.resolve_params({"factor": 0.5}),
        )["output_image"]
        np.testing.assert_allclose(out, np.asarray(mixed), atol=1e-6)

    def test_rgba8_quantization(self):
        _, prog = build("input -> passthrough -> output", fmt="rgba8")
        img = rand_image()
        out = np.asarray(prog(img, 0.0))
        np.testing.assert_allclose(out, np.round(np.asarray(img) * 255) / 255, atol=1e-7)
        steps = np.unique(np.round(out * 255) - out * 255)
        np.testing.assert_allclose(steps, 0.0, atol=1e-4)

    def test_generator_graph(self):
        _, prog = build(
            "checkerboard -> invert -> output\ncheckerboard: checkerboard { size: 8 }",
            expects_input=False,
        )
        img = jnp.zeros((4, 16, 24), jnp.float32)
        out = np.asarray(prog(img, 0.0))
        assert out.shape == (4, 16, 24)
        assert len(np.unique(out[0])) == 2

    def test_per_node_timing(self):
        _, prog = build(
            "input -> blur -> sobel -> output\n"
        )
        img = rand_image()
        out, times = prog.run_per_node(img, 0.0)
        assert set(times) == {"blur", "sobel"}
        assert all(t >= 0.0 for t in times.values())
        fused = np.asarray(prog(img, 0.0))
        np.testing.assert_allclose(np.asarray(out), fused, atol=1e-6)

    def test_time_threading(self):
        _, prog = build("input -> wv -> output\nwv: wave { amplitude: 4.0 }\n")
        img = rand_image(32, 32)
        out0 = np.asarray(prog(img, 0.0))
        out1 = np.asarray(prog(img, 0.5))
        assert not np.allclose(out0, out1)
        # Changing time must NOT recompile (time is traced, not static).
        from reforge_tpu.graph.program import GraphProgram  # noqa

        assert prog._fused._cache_size() == 1

    def test_multi_writer_last_wins(self):
        # Two chains both writing the final output: later topo order wins,
        # matching the reference's execution-order overwrite.
        src = "input -> blur -> output\ninput -> blur -> sharpen -> output\n"
        _, prog = build(src)
        img = rand_image()
        out = np.asarray(prog(img, 0.0))
        assert out.shape == (4, 16, 24)


class TestRgba16f:
    def test_bf16_storage(self):
        _, prog = build("input -> gs -> tonemap -> output\ngs: gaussian { sigma: 2.0 }",
                        fmt="rgba16f")
        img = rand_image()
        out = prog(img, 0.0)
        assert out.dtype == jnp.bfloat16
        # Within half-float tolerance of the f32 result.
        _, prog32 = build("input -> gs -> tonemap -> output\ngs: gaussian { sigma: 2.0 }")
        ref = np.asarray(prog32(img, 0.0))
        got = np.asarray(out.astype(jnp.float32))
        assert np.abs(got - ref).max() < 0.02
