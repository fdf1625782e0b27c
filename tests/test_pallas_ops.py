"""Pallas conv kernels, validated in interpreter mode on CPU against the
portable jnp path (the real-TPU path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reforge_tpu.kernels import ops, pallas_ops


def rand(c=4, h=40, w=72, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((c, h, w), dtype=np.float32))


@pytest.mark.parametrize("sigma", [1.0, 3.0])
@pytest.mark.parametrize("axis", ["h", "w"])
def test_conv_matches_jnp(sigma, axis):
    x = rand()
    w = ops.gaussian_weights(sigma)
    if axis == "h":
        got = pallas_ops.conv1d_h(x, w, interpret=True)
        want = ops.conv1d(x, w, ops.AXIS_H)
    else:
        got = pallas_ops.conv1d_w(x, w, interpret=True)
        want = ops.conv1d(x, w, ops.AXIS_W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sep_conv_matches(seed=3):
    x = rand(seed=seed)
    wh = ops.gaussian_weights(2.0)
    ww = ops.gaussian_weights(1.5)
    got = pallas_ops.sep_conv(x, wh, ww, interpret=True)
    want = ops.sep_conv(x, wh, ww)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_non_divisible_dims():
    # W=72 is not a multiple of tile_w=64; H=40 not a multiple of tile_h=32.
    x = rand(h=41, w=73, seed=1)
    w = ops.gaussian_weights(1.0)
    got = pallas_ops.conv1d_h(x, w, tile_w=64, interpret=True)
    want = ops.conv1d(x, w, ops.AXIS_H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    got = pallas_ops.conv1d_w(x, w, tile_h=32, interpret=True)
    want = ops.conv1d(x, w, ops.AXIS_W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_zero_mode_padding():
    x = rand(h=16, w=24, seed=2)
    w = ops.gaussian_weights(1.0)
    got = pallas_ops.conv1d_h(x, w, mode="zero", interpret=True)
    r = (len(w) - 1) // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
    want = sum(
        float(w[k]) * xp[:, k : k + 16, :] for k in range(len(w))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_disabled_on_cpu():
    # The dispatch in ops.conv1d must not pick pallas on CPU backends.
    assert pallas_ops.pallas_available() is False


def test_sep_conv_fused_matches():
    x = rand(h=70, w=90, seed=4)
    wh = ops.gaussian_weights(2.0)
    ww = ops.gaussian_weights(1.5)
    got = pallas_ops.sep_conv_fused(x, wh, ww, tile_h=32, interpret=True)
    want = ops.sep_conv(x, wh, ww)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_tile_h_heuristic():
    # Narrow widths dispatch the lane variant (rotation-temp model).
    assert pallas_ops.fused_tile_h(1920, 12, 12) in (128, 64)
    # 4K sigma-4 fits at tile 128 with the transpose formulation
    # (validated on hardware: compiles and is fastest).
    assert pallas_ops.fused_tile_h(3840, 12, 12) in (128, 64)
    # Extremes fall back to the two-kernel path.
    assert pallas_ops.fused_tile_h(16384, 96, 96) is None


def test_both_fused_variants_match():
    x = rand(h=70, w=90, seed=5)
    wh = ops.gaussian_weights(2.0)
    ww = ops.gaussian_weights(1.5)
    want = ops.sep_conv(x, wh, ww)
    for variant in ("transpose", "lanes"):
        got = pallas_ops.sep_conv_fused(
            x, wh, ww, tile_h=32, interpret=True, variant=variant
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, err_msg=variant
        )


class TestMxuVariant:
    """Banded-matmul (MXU) separable conv: correctness vs the portable path.

    On real TPUs the f32 matmul truncates to bf16 unless precision=HIGHEST;
    the interpreter computes exactly, so tight tolerances are valid here."""

    def test_matches_sep_conv_f32(self):
        x = rand(h=100, w=150, seed=5)
        wh = ops.gaussian_weights(4.0)
        ww = ops.gaussian_weights(4.0)
        got = pallas_ops.sep_conv_fused_mxu(x, wh, ww, interpret=True)
        want = ops.sep_conv(x, wh, ww)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_zero_mode_and_asym(self):
        x = rand(h=70, w=200, seed=6)
        wh = ops.gaussian_weights(1.5)
        ww = ops.gaussian_weights(6.0)
        got = pallas_ops.sep_conv_fused_mxu(x, wh, ww, mode="zero",
                                            interpret=True)
        want = pallas_ops.sep_conv(x, wh, ww, mode="zero", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_bf16_input(self):
        x = rand(h=64, w=140, seed=7).astype(jnp.bfloat16)
        wh = ops.gaussian_weights(2.0)
        ww = ops.gaussian_weights(2.0)
        got = pallas_ops.sep_conv_fused_mxu(x, wh, ww, interpret=True)
        want = ops.sep_conv(x.astype(jnp.float32), wh, ww)
        assert got.dtype == jnp.bfloat16
        # bf16 storage rounding between the two passes dominates the error.
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2
        )

    def test_wide_radius_falls_back(self):
        # rw > 128 exceeds the 3-lane-tile band; must defer to sep_conv_fused.
        x = rand(h=24, w=160, seed=8)
        w_wide = np.ones(261, np.float32) / 261.0  # r = 130
        wh = ops.gaussian_weights(1.0)
        got = pallas_ops.sep_conv_fused_mxu(x, wh, w_wide, interpret=True)
        want = pallas_ops.sep_conv(x, wh, w_wide, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_mxu_tile_h_model(self):
        assert pallas_ops.mxu_tile_h(3840, 12, 12) in (128, 64, 32)
        assert pallas_ops.mxu_tile_h(3840, 12, 12, itemsize=2) == 128
        assert pallas_ops.mxu_tile_h(200, 150, 3) is not None
        assert pallas_ops.mxu_tile_h(3840, 12, 200) is None  # rw > 128


class TestStencilEngine:
    """Generic stencil engine (stencil_apply): arbitrary per-pixel
    neighborhood functions in one fused pass."""

    def test_weighted_sum_matches_conv2d_jnp(self):
        import os

        x = rand(h=50, w=90, seed=9)
        taps = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)

        def wsum(tap):
            acc = None
            for dy in range(3):
                for dx in range(3):
                    w = float(taps[dy, dx])
                    if w == 0.0:
                        continue
                    t = tap(dy, dx) * w
                    acc = t if acc is None else acc + t
            return acc

        got = pallas_ops.stencil_apply(x, 1, 1, wsum, interpret=True)
        os.environ["REFORGE_NO_PALLAS"] = "1"
        try:
            want = ops.conv2d(x, taps)
        finally:
            del os.environ["REFORGE_NO_PALLAS"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_median_network_matches_numpy(self):
        x = rand(c=1, h=30, w=40, seed=10)

        def med9(tap):
            v = [tap(dy, dx) for dy in range(3) for dx in range(3)]
            pairs = [
                (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                (2, 5), (4, 7), (4, 2), (6, 4), (4, 2),
            ]
            for i, j in pairs:
                v[i], v[j] = jnp.minimum(v[i], v[j]), jnp.maximum(v[i], v[j])
            return v[4]

        got = np.asarray(pallas_ops.stencil_apply(x, 1, 1, med9, interpret=True))
        xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1)), mode="edge")
        stack = np.stack([
            xp[:, dy:dy + 30, dx:dx + 40] for dy in range(3) for dx in range(3)
        ])
        want = np.median(stack, axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_zero_mode(self):
        x = rand(c=1, h=20, w=30, seed=11)
        got = np.asarray(pallas_ops.stencil_apply(
            x, 1, 1, lambda tap: tap(0, 1), mode="zero", interpret=True
        ))
        # tap(0, 1)[y, x] = x[y - 1, x]: the row above, zero at the top edge.
        want = np.zeros_like(np.asarray(x))
        want[:, 1:, :] = np.asarray(x)[:, :-1, :]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_tile_model_bounds(self):
        assert pallas_ops.stencil_tile_h(3840, 1, 1, temps=3) in (128, 64, 32)
        assert pallas_ops.stencil_tile_h(1920, 1, 1, temps=3) == 128
        # Pathological temp pressure falls back to the jnp path.
        assert pallas_ops.stencil_tile_h(3840, 1, 1, temps=200) is None


class TestMxuX3Variant:
    """f32-exact bf16x3-split MXU conv: the Dekker-style decomposition must
    match the pure-f32 path to float32 rounding noise (~1-2 ulp)."""

    def test_matches_sep_conv_f32_exact(self):
        x = rand(h=96, w=200, seed=9)
        w = ops.gaussian_weights(4.0)
        got = pallas_ops.sep_conv_fused_mxu_x3(x, w, w, tile_h=32, interpret=True)
        want = ops.sep_conv(x, w, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-7)

    def test_three_tile_band_and_zero_mode(self):
        # rw > 64 exercises the generic 3-lane-tile W band.
        x = rand(h=64, w=300, seed=10)
        wh = ops.gaussian_weights(2.0)
        ww = ops.gaussian_weights(22.0)  # r = 66
        got = pallas_ops.sep_conv_fused_mxu_x3(
            x, wh, ww, mode="zero", tile_h=32, interpret=True
        )
        want = pallas_ops.sep_conv(x, wh, ww, mode="zero", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_split3_reconstructs_f32(self):
        rng = np.random.default_rng(11)
        m = (rng.random((64, 64)).astype(np.float32) - 0.5) * 100.0
        terms = pallas_ops._split3_np(m)
        back = sum(t.astype(np.float64) for t in terms)
        # 3 x 8 mantissa bits cover f32's 24: reconstruction is (near) exact.
        np.testing.assert_allclose(back, m.astype(np.float64), rtol=2e-24, atol=1e-30)

    def test_x3_tile_h_model(self):
        assert pallas_ops.mxu_x3_tile_h(3840, 12, 12) in (128, 64, 32)
        assert pallas_ops.mxu_x3_tile_h(3840, 12, 200) is None  # rw > 128


def test_graph_strip_raw_padding_matches():
    """In-kernel (DMA-clamped + VMEM-synthesized) halos == jnp.pad path,
    both border modes, including the first/last strip specials."""
    from reforge_tpu.kernels.ops import gaussian_weights

    h, w = 64, 256  # w % 128 == 0: the raw DMA path engages
    x = jnp.asarray(np.random.default_rng(0).random((4, h, w)).astype(np.float32))
    wh = gaussian_weights(2.0)
    ww = gaussian_weights(1.5)
    rh, rw = (len(wh) - 1) // 2, (len(ww) - 1) // 2

    def epilogue(ci, row0, t, xin, blurs):
        return blurs[0] * 0.5 + xin * 0.5

    for mode in ("edge", "zero"):
        # tile_h=32 divides h with n_tiles=2 -> raw path engages
        got = np.asarray(pallas_ops.graph_strip_fused(
            x, 0.0, [(wh, ww)], epilogue, mode=mode, tile_h=32, interpret=True))
        pm = "edge" if mode == "edge" else "constant"
        a = np.asarray(jnp.pad(x, ((0, 0), (rh, rh), (rw, rw)), mode=pm),
                       np.float64)
        th = np.zeros((4, h, w + 2 * rw))
        for k, wv in enumerate(np.asarray(wh, np.float64)):
            th += wv * a[:, k : k + h, :]
        res = np.zeros((4, h, w))
        for k, wv in enumerate(np.asarray(ww, np.float64)):
            res += wv * th[:, :, k : k + w]
        want = 0.5 * res + 0.5 * np.asarray(x, np.float64)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)
        # And the raw path must agree with the jnp.pad path bitwise
        # (tile_h=64 -> n_tiles=1 -> falls back to padded).
        padded = np.asarray(pallas_ops.graph_strip_fused(
            x, 0.0, [(wh, ww)], epilogue, mode=mode, tile_h=64, interpret=True))
        np.testing.assert_allclose(got, padded, atol=1e-6, err_msg=mode)


def test_graph_strip_bf16_block_upcast_matches(monkeypatch):
    """REFORGE_BF16_BLOCK_UPCAST=1 (no f32 staging buffer; upcast at tap-
    block granularity) must be bit-identical to the staged path — the
    bf16->f32 upcast is exact, so only the schedule differs."""
    from reforge_tpu.kernels.ops import gaussian_weights

    h, w = 64, 256
    x = jnp.asarray(
        np.random.default_rng(5).random((4, h, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wh = gaussian_weights(2.0)
    ww = gaussian_weights(1.5)

    def epilogue(ci, row0, t, xin, blurs):
        # Real programs end with the storage-dtype store; mirror it.
        return (blurs[0] * 0.5 + xin * 0.5).astype(jnp.bfloat16)

    staged = np.asarray(pallas_ops.graph_strip_fused(
        x, 0.0, [(wh, ww)], epilogue, mode="edge", tile_h=32,
        interpret=True), np.float32)
    monkeypatch.setenv("REFORGE_BF16_BLOCK_UPCAST", "1")
    blockwise = np.asarray(pallas_ops.graph_strip_fused(
        x, 0.0, [(wh, ww)], epilogue, mode="edge", tile_h=32,
        interpret=True), np.float32)
    np.testing.assert_array_equal(staged, blockwise)


def test_sep_conv_fused_raw_padding_matches():
    """Standalone fused conv's in-kernel padding == jnp path."""
    h, w = 64, 256
    x = jnp.asarray(np.random.default_rng(3).random((4, h, w)).astype(np.float32))
    wh = np.array([0.25, 0.5, 0.25], np.float32)
    ww = np.array([0.1, 0.2, 0.4, 0.2, 0.1], np.float32)
    for mode in ("edge", "zero"):
        got = pallas_ops.sep_conv_fused(x, wh, ww, mode=mode, tile_h=32,
                                        variant="transpose", interpret=True)
        want = ops.conv1d(ops.conv1d(x, wh, 1), ww, 2)
        if mode == "zero":
            pm = "constant"
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode=pm)
            th = sum(float(v) * xp[:, k : k + h, :] for k, v in enumerate(wh))
            tp = jnp.pad(th, ((0, 0), (0, 0), (2, 2)), mode=pm)
            want = sum(float(v) * tp[:, :, k : k + w] for k, v in enumerate(ww))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=mode)


def test_stencil_raw_padding_matches():
    """Per-channel stencil in-kernel padding == jnp path (both modes)."""
    h, w = 64, 256
    x = jnp.asarray(np.random.default_rng(5).random((4, h, w)).astype(np.float32))
    taps = np.array([[0.0, 0.2, 0.0], [0.2, 0.2, 0.2], [0.0, 0.2, 0.0]],
                    np.float32)

    def weighted(tap):
        acc = None
        for dy in range(3):
            for dx in range(3):
                wv = float(taps[dy, dx])
                if wv == 0.0:
                    continue
                t = tap(dy, dx) * wv
                acc = t if acc is None else acc + t
        return acc

    for mode in ("edge", "zero"):
        got = pallas_ops.stencil_apply(x, 1, 1, weighted, mode=mode,
                                       tile_h=32, interpret=True)
        pm = "edge" if mode == "edge" else "constant"
        xp = np.asarray(jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode=pm),
                        np.float64)
        want = np.zeros((4, h, w))
        for dy in range(3):
            for dx in range(3):
                want += taps[dy, dx] * xp[:, dy : dy + h, dx : dx + w]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   err_msg=mode)
