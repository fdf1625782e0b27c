"""Shared image math for kernels: padding, separable convolution, sampling.

All functions operate on planar ``f32[4, H, W]`` (or ``f32[C, H, W]``)
arrays.  Convolutions are written as static unrolled shifted-adds over
padded arrays: XLA fuses the tap loop into a single VPU pass over memory,
which beats a general conv lowering for the small 1-D kernels typical of
image filters.  Border policy is clamp-to-edge throughout (the visual
convention of the reference's demo shaders).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

AXIS_H = 1
AXIS_W = 2


def pad_edge(x: jnp.ndarray, rh: int, rw: int) -> jnp.ndarray:
    """Clamp-to-edge padding of the spatial dims of (C, H, W)."""
    if rh == 0 and rw == 0:
        return x
    return jnp.pad(x, ((0, 0), (rh, rh), (rw, rw)), mode="edge")


def conv1d(x: jnp.ndarray, weights: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation along a spatial axis with clamp-to-edge borders.

    ``weights`` must be a static numpy array of odd length; taps unroll at
    trace time.  On TPU backends, 3-D (C, H, W) images route to the Pallas
    kernels (pallas_ops.py) that accumulate all taps in VMEM; elsewhere (or
    when REFORGE_NO_PALLAS is set) the portable jnp shifted-add path runs.
    """
    weights = np.asarray(weights, dtype=np.float32)
    r = (len(weights) - 1) // 2
    if r == 0:
        return x * float(weights[0])
    if x.ndim == 3 and axis in (AXIS_H, AXIS_W) and _use_pallas():
        from . import pallas_ops

        if axis == AXIS_H:
            return pallas_ops.conv1d_h(x, weights)
        return pallas_ops.conv1d_w(x, weights)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="edge")
    size = x.shape[axis]
    acc = None
    for i, w in enumerate(weights):
        if w == 0.0:
            continue
        tap = jax.lax.slice_in_dim(xp, i, i + size, axis=axis)
        acc = tap * float(w) if acc is None else acc + tap * float(w)
    return acc if acc is not None else jnp.zeros_like(x)


_pallas_suppressed = 0


class no_pallas:
    """Trace-scoped Pallas opt-out (re-entrant context manager).

    Multi-device program wrappers trace kernels under this: a pallas_call
    cannot take a vmap batch dimension (ANY-memory operands require a
    trivial index_map) and GSPMD cannot partition the custom call, so
    vmapped/auto-sharded programs must trace the portable jnp formulations
    instead.  The flag is consulted at trace time, so wrapping the traced
    callable is sufficient."""

    def __enter__(self):
        global _pallas_suppressed
        _pallas_suppressed += 1
        return self

    def __exit__(self, *exc):
        global _pallas_suppressed
        _pallas_suppressed -= 1
        return False


def _use_pallas() -> bool:
    import os

    if _pallas_suppressed or os.environ.get("REFORGE_NO_PALLAS"):
        return False
    from . import pallas_ops

    return pallas_ops.pallas_available()


# Combined (H + W) tap count above which the f32-exact bf16x3 MXU conv
# beats the VPU fused kernel (whose cost scales per tap); measured on v5e
# at 4K (BENCH.md).
X3_MIN_TAPS = 56

# Frame width at which EXTENT-CARRYING conv stages (a conv whose output
# feeds another conv/stencil with a halo) stop paying inside the mc
# megakernel vs per-node execution; zero-extent convs fuse at any width.
# Measured on v5e (graph/program.py::_plan_strip_mc gate comment).
MC_CONV_MAX_WIDTH = 2560

# Frame width at which HEAVY f32-storage convs (>= X3_MIN_TAPS combined
# taps) start winning as in-kernel bf16x3 MXU band-matmul stages vs
# per-node's standalone x3 kernel: the 6-products-+-Dekker-splits cost
# is width-independent per pixel, but the mc strip grid's fixed costs
# only amortize at wide frames.  Measured v5e blur2-s8: 1920 0.80x,
# 2560 1.03x, 3840 1.28x.  Deliberately a separate constant from
# MC_CONV_MAX_WIDTH (benchmarks force-lift that gate to build mc plans;
# x3 eligibility must not move with it).
MC_MXU_F32_MIN_WIDTH = 2560


def sep_conv(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray,
             prefer_mxu: bool = False) -> jnp.ndarray:
    """Separable 2-D convolution: 1-D pass along H then along W.

    On TPU, widths whose working set fits VMEM use the single fused
    Pallas kernel (one HBM read + one write for both directions);
    otherwise two per-direction Pallas kernels (or the jnp fallback off
    TPU).  ``prefer_mxu`` routes to the banded-matmul MXU variant, whose
    default-precision f32 matmul truncates operands to bf16 — callers set
    it when the surrounding storage format is bf16 anyway (rgba16f), where
    the truncation is below storage precision."""
    if x.ndim == 3 and _use_pallas():
        import os

        from . import pallas_ops

        wh_arr = np.asarray(wh, np.float32)
        ww_arr = np.asarray(ww, np.float32)
        rh, rw = (len(wh_arr) - 1) // 2, (len(ww_arr) - 1) // 2
        if rh > 0 and rw > 0:
            fast = os.environ.get("REFORGE_CONV_PRECISION") == "fast"
            if (x.dtype == jnp.bfloat16 or prefer_mxu or fast) and rw <= 128:
                # Under prefer_mxu the caller's storage is bf16 (the f32
                # input was just upcast from it), so running the kernel on
                # bf16 strips is lossless and halves strip DMA; the output
                # returns in the caller's dtype.
                xk = x
                if prefer_mxu and x.dtype == jnp.float32:
                    xk = x.astype(jnp.bfloat16)
                tile_h = pallas_ops.mxu_tile_h(x.shape[2], rh, rw,
                                               xk.dtype.itemsize)
                if tile_h is not None:
                    out = pallas_ops.sep_conv_fused_mxu(
                        xk, wh_arr, ww_arr, tile_h=tile_h
                    )
                    return out.astype(x.dtype)
            if (
                x.dtype == jnp.float32
                and len(wh_arr) + len(ww_arr) >= X3_MIN_TAPS
            ):
                # Large radii: the bf16x3 split MXU kernel's cost is nearly
                # tap-count-independent (banded matmuls), while the VPU
                # kernel pays ~per-tap; crossover measured at ~50 combined
                # taps on v5e (BENCH.md).  Full f32 accuracy (6-product
                # Dekker split).
                tile_h = pallas_ops.mxu_x3_tile_h(x.shape[2], rh, rw)
                if tile_h is not None:
                    return pallas_ops.sep_conv_fused_mxu_x3(
                        x, wh_arr, ww_arr, tile_h=tile_h
                    )
            tile_h = pallas_ops.fused_tile_h(x.shape[2], rh, rw, h=x.shape[1])
            if tile_h is not None:
                return pallas_ops.sep_conv_fused(x, wh_arr, ww_arr, tile_h=tile_h)
    return conv1d(conv1d(x, wh, AXIS_H), ww, AXIS_W)


def apply_stencil(x: jnp.ndarray, rh: int, rw: int, fn, temps: int = 4,
                  mode: str = "edge") -> jnp.ndarray:
    """Evaluate a per-pixel neighborhood function over (C, H, W).

    ``fn(tap)`` receives ``tap(dy, dx)`` returning the neighbor shifted by
    ``(dy - rh, dx - rw)`` and must be elementwise in the array it returns
    (same spatial shape as a tap).  On TPU the whole function runs as one
    Pallas pass per channel — a single HBM read + write regardless of how
    many taps or compare-exchanges fn uses; elsewhere taps become shifted
    slices of one padded array and XLA fuses.  ``temps`` sizes the VMEM
    model for fn's live intermediates (e.g. 9 for a median-of-9 network)."""
    if x.ndim == 3 and (rh or rw) and _use_pallas():
        from . import pallas_ops

        out = pallas_ops.stencil_apply(x, rh, rw, fn, mode=mode, temps=temps)
        if out is not None:
            return out
    pad_mode = "edge" if mode == "edge" else "constant"
    pad = [(0, 0)] * (x.ndim - 2) + [(rh, rh), (rw, rw)]
    xp = jnp.pad(x, pad, mode=pad_mode)
    h, w = x.shape[AXIS_H], x.shape[AXIS_W]

    def tap(dy: int, dx: int):
        start = (0,) * (x.ndim - 2) + (dy, dx)
        size = x.shape[: x.ndim - 2] + (h, w)
        return jax.lax.dynamic_slice(xp, start, size)

    return fn(tap)


def conv2d(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Small dense 2-D correlation (static odd-sized kernel, edge clamp).

    On TPU, 3-D images run as one Pallas stencil pass (single HBM
    read + write); elsewhere the jnp shifted-add path fuses under XLA."""
    taps = np.asarray(taps, dtype=np.float32)
    rh, rw = taps.shape[0] // 2, taps.shape[1] // 2
    if rh == 0 and rw == 0:
        return x * float(taps[0, 0])

    def weighted_sum(tap):
        # Striped accumulation (tap i -> stripe i mod 8) for long chains:
        # the in-order VPU stalls on a single serial acc-add chain;
        # independent partials keep the pipeline full (same fix as
        # pallas_ops._blocked_taps, measured 2.7x).  Short chains (<= 2
        # stripes' worth) keep the ascending order: no latency to hide,
        # and cancellation-built kernels (laplacian sharpen) stay at
        # their established rounding.
        terms = []
        for dy in range(taps.shape[0]):
            for dx in range(taps.shape[1]):
                wgt = float(taps[dy, dx])
                if wgt != 0.0:
                    terms.append((dy, dx, wgt))
        if not terms:
            return tap(rh, rw) * 0.0
        n_stripes = 8 if len(terms) > 16 else 1
        parts: list = [None] * n_stripes
        for i, (dy, dx, wgt) in enumerate(terms):
            t = tap(dy, dx) * wgt
            j = i % n_stripes
            parts[j] = t if parts[j] is None else parts[j] + t
        parts = [p for p in parts if p is not None]
        while len(parts) > 1:
            merged = [parts[k] + parts[k + 1]
                      for k in range(0, len(parts) - 1, 2)]
            if len(parts) % 2:
                merged.append(parts[-1])
            parts = merged
        return parts[0]

    return apply_stencil(x, rh, rw, weighted_sum, temps=3)


def gaussian_weights(sigma: float, radius: int | None = None) -> np.ndarray:
    """Normalized 1-D gaussian taps; radius defaults to ceil(3*sigma)."""
    sigma = max(float(sigma), 1e-6)
    if radius is None:
        radius = gaussian_radius(sigma)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (xs / sigma) ** 2)
    return (w / w.sum()).astype(np.float32)


MAX_GAUSSIAN_RADIUS = 96


def gaussian_radius(sigma: float) -> int:
    return int(min(MAX_GAUSSIAN_RADIUS, max(1, math.ceil(3.0 * float(sigma)))))


def gaussian_blur(x: jnp.ndarray, sigma: float,
                  prefer_mxu: bool = False) -> jnp.ndarray:
    if float(sigma) <= 0.0:
        return x
    w = gaussian_weights(sigma)
    return sep_conv(x, w, w, prefer_mxu=prefer_mxu)


def box_weights(radius: int) -> np.ndarray:
    n = 2 * int(radius) + 1
    return np.full((n,), 1.0 / n, dtype=np.float32)


LUMA_WEIGHTS = (0.2126, 0.7152, 0.0722)  # Rec.709, linear light


def luma(x: jnp.ndarray) -> jnp.ndarray:
    """(4,H,W) -> (H,W) relative luminance."""
    r, g, b = x[0], x[1], x[2]
    lr, lg, lb = LUMA_WEIGHTS
    return r * lr + g * lg + b * lb


def with_alpha(rgb: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Stack (3,H,W) color with an (H,W) alpha plane into (4,H,W)."""
    return jnp.concatenate([rgb, alpha[None]], axis=0)


def map_rgb(x: jnp.ndarray, f) -> jnp.ndarray:
    """Apply f to the color planes, passing alpha through unchanged."""
    return jnp.concatenate([f(x[:3]), x[3:4]], axis=0)


def pixel_coords(h: int, w: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(y, x) integer coordinate planes, each (H, W) int32."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ys, xs


def grid_coords(ctx) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GLOBAL (y, x) coordinate planes for the local block of ``ctx``.

    Shard-correct: shapes follow the local block, values follow the global
    image (row_offset may be a traced per-device index inside shard_map).
    """
    h, w = ctx.local_shape
    ys, xs = pixel_coords(h, w)
    off = ctx.row_offset
    if not (isinstance(off, int) and off == 0):
        ys = ys + jnp.asarray(off, jnp.int32)
    if ctx.col_offset != 0:
        xs = xs + jnp.int32(ctx.col_offset)
    return ys, xs


def sample_nearest(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels at integer coords (clamped to edge).

    ``ys``/``xs`` are (H', W') int arrays; result is (C, H', W').  This is
    the general data-dependent path (swirl, pixelate, ...); kernels using it
    are not halo-shardable and fall back to gathered execution.
    """
    c, h, w = x.shape
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return x[:, ys, xs]


def sample_bilinear(x: jnp.ndarray, yf: jnp.ndarray, xf: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at float pixel coords (edge clamp); (C, H', W')."""
    y0 = jnp.floor(yf)
    x0 = jnp.floor(xf)
    ty = yf - y0
    tx = xf - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    p00 = sample_nearest(x, y0, x0)
    p01 = sample_nearest(x, y0, x0 + 1)
    p10 = sample_nearest(x, y0 + 1, x0)
    p11 = sample_nearest(x, y0 + 1, x0 + 1)
    top = p00 + (p01 - p00) * tx
    bot = p10 + (p11 - p10) * tx
    return top + (bot - top) * ty


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
