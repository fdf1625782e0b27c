"""Pallas TPU kernels for the convolution hot path.

The jnp shifted-add convolution (ops.conv1d) reads the whole image once per
tap when XLA declines to fuse the chain — at 4K with a sigma-4 gaussian
(25 taps) that's ~3 GB of HBM traffic per direction.  These kernels tile
the image so a full conv-axis strip sits in VMEM and all taps accumulate
on-chip: HBM traffic falls to one read + one write per direction,
leaving the VPU multiply-accumulate as the cost.

Layout notes (see the TPU tiling model in the Pallas guide):
  * images are (4, H, W) f32; the trailing (H, W) dims map to (sublane,
    lane) tiles of (8, 128).
  * conv along H tiles the W axis: block (4, H + 2r, TILE_W) — tap shifts
    are sublane moves, the cheap direction.
  * conv along W tiles the H axis: block (4, TILE_H, W + 2r) — tap shifts
    are lane moves; Mosaic lowers static lane slices efficiently.

Padding (edge or zero) happens in the caller via jnp.pad — one fused XLA
pass — so the kernels always do "valid" convolution.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conv_h_kernel(x_ref, o_ref, *, weights: tuple, out_h: int):
    # Accumulate statement-by-statement into the output ref: each tap's
    # temporary dies before the next is built, keeping the VMEM stack flat
    # (a fully unrolled sum-expression keeps every tap slice alive at once
    # and overflows scoped VMEM for long kernels).
    o_ref[:, :, :] = x_ref[:, 0:out_h, :] * weights[0]
    for k, w in enumerate(weights[1:], start=1):
        if w == 0.0:
            continue
        o_ref[:, :, :] += x_ref[:, k : k + out_h, :] * w


def _conv_w_kernel(x_ref, o_ref, *, weights: tuple, out_w: int):
    o_ref[:, :, :] = x_ref[:, :, 0:out_w] * weights[0]
    for k, w in enumerate(weights[1:], start=1):
        if w == 0.0:
            continue
        o_ref[:, :, :] += x_ref[:, :, k : k + out_w] * w


def conv1d_h(
    x: jnp.ndarray,
    weights: np.ndarray,
    mode: str = "edge",
    tile_w: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """1-D correlation along H of (C, H, W) with clamp/zero borders."""
    weights = np.asarray(weights, dtype=np.float32)
    r = (len(weights) - 1) // 2
    c, h, w = x.shape
    if r == 0:
        return x * float(weights[0])
    pad_mode = "edge" if mode == "edge" else "constant"
    w_pad = _round_up(w, tile_w)
    xp = jnp.pad(x, ((0, 0), (r, r), (0, w_pad - w)), mode=pad_mode)
    # Per-channel grid keeps each block ~1 MB so the automatic double
    # buffering of in+out blocks fits VMEM even at 4K (H+2r sublanes).
    grid = (c, w_pad // tile_w)
    out = pl.pallas_call(
        functools.partial(
            _conv_h_kernel, weights=tuple(float(v) for v in weights), out_h=h
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2 * r, tile_w), lambda ci, i: (ci, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, tile_w), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out[:, :, :w]


def conv1d_w(
    x: jnp.ndarray,
    weights: np.ndarray,
    mode: str = "edge",
    tile_h: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """1-D correlation along W of (C, H, W) with clamp/zero borders."""
    weights = np.asarray(weights, dtype=np.float32)
    r = (len(weights) - 1) // 2
    c, h, w = x.shape
    if r == 0:
        return x * float(weights[0])
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    xp = jnp.pad(x, ((0, 0), (0, h_pad - h), (r, r)), mode=pad_mode)
    grid = (c, h_pad // tile_h)
    out = pl.pallas_call(
        functools.partial(
            _conv_w_kernel, weights=tuple(float(v) for v in weights), out_w=w
        ),
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, w + 2 * r), lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out[:, :h, :]


def sep_conv(
    x: jnp.ndarray,
    wh: np.ndarray,
    ww: np.ndarray,
    mode: str = "edge",
    interpret: bool = False,
) -> jnp.ndarray:
    """Separable 2-D convolution, both passes as Pallas kernels."""
    return conv1d_w(conv1d_h(x, wh, mode, interpret=interpret), ww, mode,
                    interpret=interpret)


def pallas_available() -> bool:
    """Use real Pallas kernels only on TPU backends (CPU would need the
    slow interpreter); the jnp path remains the portable fallback."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
