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
