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

Padding (edge or zero) happens *inside* the kernels: the strip DMA reads
clamped windows straight from the unpadded frame and halos are synthesized
in VMEM (edge replication / zeros, corners composing as edge-of-edge).
XLA does not hoist a caller-side ``jnp.pad`` out of ``lax.scan`` frame
loops — the whole-frame pad copy cost 0.90 ms/frame at 4K before this
(see ``_strip_dma_fn`` / ``_strip_fill_halos`` / ``_raw_strip_geometry``).
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Any

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


def _sep_fused_kernel(
    x_hbm, o_ref, scratch, tmp_t, sems, *,
    weights_h: tuple, weights_w: tuple, tile_h: int, out_w: int,
    n_tiles: int, strip_rows: int, raw: bool = False, rh_max: int = 0,
    in_h: int = 0, in_w: int = 0, pad_edge_mode: bool = True,
    w_base: int | None = None, rw: int = 0,
):
    """One H-strip: DMA (strip_rows, W + 2r_w) into VMEM (double
    buffered), conv along H storing blocks transposed, conv along the
    (now-sublane) W direction storing blocks transposed back into the
    output block.

    Both conv directions touch HBM exactly once: the strip load and the
    block store; the next strip's DMA overlaps this strip's compute.  The
    in-VMEM transpose makes BOTH tap loops sublane shifts — lane-direction
    shifted slices materialize per-tap rotation temporaries (blowing the
    scoped-VMEM budget and costing lane-rotate ops), sublane shifts don't.
    The transposes happen at accumulator-block granularity inside the tap
    schedule's stores, so no pass writes an untransposed buffer only to
    re-read it for a bulk `.T`.
    ``strip_rows`` is tile_h + 2r_h rounded to the sublane tile (8); slack
    rows exist in the padded input and are never read by the taps.
    """
    ci = pl.program_id(0)
    i = pl.program_id(1)
    if w_base is None:
        w_base = rw  # padded path: data sits at column rw

    dma_do = _strip_dma_fn(
        ci, x_hbm, scratch, sems, raw=raw, tile_h=tile_h,
        strip_rows=strip_rows, rh_max=rh_max, n_tiles=n_tiles,
        in_h=in_h, in_w=in_w, w_base=w_base,
    )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        dma_do(i, slot, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        dma_do(i + 1, other, "start")

    dma_do(i, slot, "wait")

    if raw:
        _strip_fill_halos(
            i, slot, scratch, tile_h=tile_h, strip_rows=strip_rows,
            rh_max=rh_max, n_tiles=n_tiles, in_w=in_w, w_base=w_base,
            edge=pad_edge_mode,
        )

    # Conv along H with the phased/striped tap schedule (_blocked_taps),
    # each accumulator block stored TRANSPOSED straight into the
    # (w_total, tile_h) buffer the W pass reads — block-granular
    # transposes skip the full-buffer roundtrip (untransposed write +
    # read + bulk `.T`) the old tmp/tmp_t pair paid per strip.
    _blocked_taps(
        lambda r, blk, c, L: scratch[slot, r : r + blk, c : c + L],
        lambda ki, r, n, c, L, acc: tmp_t.__setitem__(
            (slice(c, c + L), slice(r, r + n)), acc.T
        ),
        tile_h,
        tmp_t.shape[0],
        [weights_h],
    )

    # Conv along W as sublane shifts of the transposed strip, same
    # schedule, accumulator blocks stored transposed DIRECTLY into the
    # output block.  The data sits at column w_base; the taps are padded
    # to rw, so the source rows (transposed columns) start w_base - rw
    # past the output row.
    woff = w_base - rw
    _blocked_taps(
        lambda r, blk, c, L: tmp_t[r + woff : r + woff + blk, c : c + L],
        lambda ki, r, n, c, L, acc: o_ref.__setitem__(
            (0, slice(c, c + L), slice(r, r + n)), acc.T
        ),
        out_w,
        tile_h,
        [weights_w],
    )


BLOCK_LANES = 1280  # lane-chunk width of the register-blocked tap schedule


def _blocked_rows(taps: int, sub: int = 8) -> int:
    """Rows one value block must cover: sub output rows + taps - 1."""
    return _round_up(sub + taps - 1, 8)


# Independent accumulator chains per conv (see below).  8 measured best
# for the flagship's 25-tap convs (sweep: beats 4/12/16/25); env-tunable
# for on-chip A/Bs of small-tap convs, where the 7-add merge tree is a
# larger fraction of the pass (r1: 3 taps vs 7 merge adds).
N_ACC_STRIPES = int(_os.environ.get("REFORGE_ACC_STRIPES", "8"))


def _blocked_taps(src_block, accumulate, out_rows, n_cols, weights_list,
                  sub: int = 128, lanes: int = BLOCK_LANES):
    """Phase-grouped, stripe-accumulated 1-D tap schedule.

    For each (sub-row, lane-chunk) block, ``src_block(r, blk, c, L)`` loads
    rows [r, r+blk) x lanes [c, c+L) ONCE as a value, and N convs of the
    same input share the block loads outright (``weights_list`` is one
    padded tap vector per conv; ``accumulate(k, r, n, c, L, acc)`` stores
    conv k's block).  Two schedule properties matter on the in-order VPU
    (each measured; see BENCH.md):

    * **Striped accumulators** (tap k -> stripe k mod 8, tree-merged): a
      single serial ``acc += term`` chain stalls on every dependent add
      (~55 us per 33M-element tap pass); eight independent chains keep
      the pipeline full.
    * **Phase-grouped slicing**: a misaligned row slice costs sublane
      shuffles per tap.  Slicing ONE phase plane per sublane phase
      (``cat[p : p + span]``) and giving every tap an 8-aligned subslice
      of its plane drops the marginal tap cost to ~13 us — provided
      ``sub`` is large (128) so the 8 phase slices amortize over many
      output rows (at sub=8 the planes dominate and it loses).

    Round-4 campaign (BENCH.md "definitive budget"): Mosaic issues the
    tap mul and the accumulate add as SEPARATE VPU ops (no FMA — the
    no-mul A/B saves 39% of the flagship frame), so a tap's true cost is
    two 8.6 us whole-frame op passes; with planes and merges counted the
    op model reproduces the measured frame time to 1%.  Symmetric-tap
    pairing, sub=64/256, and 6 stripes all measured neutral-to-worse on
    hardware — this schedule is at its issue-count floor for f32 taps.

    Striping reorders the tap sum (ascending within a stripe, then a
    balanced merge), which moves results a few f32 ULP — inside every
    kernel tolerance (tests/test_parity.py bounds convs at 32 ULP vs a
    float64 oracle).  Block geometry: for n a multiple of 8 the block
    extent n + round_up(taps-1, 8) stays within what callers provision
    via ``_blocked_rows`` (sub-invariant since n == 0 mod 8); ragged
    tails use the exact minimal extent instead."""
    taps = max(len(w) for w in weights_list)
    # Schedule A/B knobs (read at trace time so in-process sweeps work):
    #   REFORGE_TAP_SUB     block row count (plane slices amortize over it)
    #   REFORGE_TAP_PAIR=1  pair equal-weight symmetric taps:
    #                       (s_k + s_m) * w instead of two mul+adds
    #   REFORGE_TAP_NOMUL=1 TIMING-ONLY: drop the tap multiplies, to
    #                       discriminate whether Mosaic fuses mul+add
    sub = int(_os.environ.get("REFORGE_TAP_SUB", str(sub)))
    pair_sym = _os.environ.get("REFORGE_TAP_PAIR") == "1"
    no_mul = _os.environ.get("REFORGE_TAP_NOMUL") == "1"
    n_stripes = int(_os.environ.get("REFORGE_ACC_STRIPES", str(N_ACC_STRIPES)))
    for c in range(0, n_cols, lanes):
        cl = min(lanes, n_cols - c)
        r = 0
        while r < out_rows:
            rem = out_rows - r
            n = min(sub, rem)
            if n >= 8:
                n -= n % 8
            if n % 8 == 0:
                blk = n + _round_up(taps - 1, 8)
            else:  # ragged tail: minimal extent, stays in provisioned rows
                blk = n + taps - 1
            cat = src_block(r, blk, c, cl)
            planes = {}
            for p in range(8):
                qmax = (taps - 1 - p) // 8 + 1
                if qmax > 0:
                    planes[p] = cat[p : p + n + 8 * (qmax - 1)]
            slices: dict = {}

            def tap_slice(k):
                s = slices.get(k)
                if s is None:
                    s = planes[k % 8][8 * (k // 8) : 8 * (k // 8) + n]
                    slices[k] = s
                return s

            for ki, w in enumerate(weights_list):
                partner = {}
                if pair_sym:
                    # Walk the NONZERO span inward (tap vectors are
                    # lead-padded with zeros, so raw indices don't align
                    # symmetric weights).
                    nz = [k for k in range(len(w)) if w[k] != 0.0]
                    lo, hi = 0, len(nz) - 1
                    while lo < hi:
                        if w[nz[lo]] == w[nz[hi]]:
                            partner[nz[lo]] = nz[hi]
                            partner[nz[hi]] = nz[lo]
                        lo += 1
                        hi -= 1
                parts = [None] * n_stripes
                done = set()
                for k in range(len(w)):
                    if w[k] == 0.0 or k in done:
                        continue
                    s = tap_slice(k)
                    m = partner.get(k)
                    if m is not None:
                        s = s + tap_slice(m)
                        done.add(m)
                    term = s if no_mul else s * w[k]
                    j = k % n_stripes
                    parts[j] = term if parts[j] is None else parts[j] + term
                parts = [p for p in parts if p is not None]
                if not parts:  # degenerate all-zero taps
                    parts = [cat[0:n] * 0.0]
                while len(parts) > 1:
                    merged = [parts[i] + parts[i + 1]
                              for i in range(0, len(parts) - 1, 2)]
                    if len(parts) % 2:
                        merged.append(parts[-1])
                    parts = merged
                accumulate(ki, r, n, c, cl, parts[0])
            r += n


def _sep_fused_kernel_lanes(
    x_hbm, o_ref, scratch, tmp, sems, *,
    weights_h: tuple, weights_w: tuple, tile_h: int, out_w: int,
    n_tiles: int, strip_rows: int,
):
    """Lane-shift variant of the fused kernel: W taps slice along lanes.

    Lane-direction slices cost rotation temporaries (limiting tile size),
    but skip the two transposes — the better trade below ~2.5K width,
    where transpose overhead is relatively larger (see sep_conv_fused)."""
    ci = pl.program_id(0)
    i = pl.program_id(1)

    def strip_dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[ci, pl.ds(step * tile_h, strip_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        strip_dma(i, slot).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        strip_dma(i + 1, other).start()

    strip_dma(i, slot).wait()

    tmp[:, :] = scratch[slot, 0:tile_h, :] * weights_h[0]
    for k, w in enumerate(weights_h[1:], start=1):
        if w == 0.0:
            continue
        tmp[:, :] += scratch[slot, k : k + tile_h, :] * w

    o_ref[0, :, :] = tmp[:, 0:out_w] * weights_w[0]
    for k, w in enumerate(weights_w[1:], start=1):
        if w == 0.0:
            continue
        o_ref[0, :, :] += tmp[:, k : k + out_w] * w


def _band_matrix_h(weights: np.ndarray, tile_h: int, strip_rows: int) -> np.ndarray:
    """(tile_h, strip_rows) tap matrix A with A[r, r+k] = w[k].

    Output row r of a strip is sum_k w[k] * strip[r + k]; as a matmul the
    whole H pass is A @ strip — one MXU contraction instead of a tap loop."""
    a = np.zeros((tile_h, strip_rows), dtype=np.float32)
    for r in range(tile_h):
        for k, wv in enumerate(weights):
            a[r, r + k] = wv
    return a


def _band_matrices_w(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Three (128, 128) matrices C0/C1/C2 for the lane-tile W pass.

    With the input padded by one full lane tile (128) on the left, output
    tile j is xpad_tile_j @ C0 + xpad_tile_{j+1} @ C1 + xpad_tile_{j+2} @ C2:
    the tap window [n - r, n + r] (r <= 128) spans at most three aligned
    128-lane tiles, so every matmul operand is a tile-aligned VMEM slice.
    C_t[p, q] = w[k] where k = (t - 1) * 128 + p - q + r."""
    r = (len(weights) - 1) // 2
    cs = np.zeros((3, 128, 128), dtype=np.float32)
    for t in range(3):
        for p in range(128):
            for q in range(128):
                k = (t - 1) * 128 + p - q + r
                if 0 <= k < len(weights):
                    cs[t, p, q] = weights[k]
    return cs[0], cs[1], cs[2]


def _sep_fused_kernel_mxu(
    x_hbm, a_ref, c0_ref, c1_ref, c2_ref, o_ref, scratch, tmp, sems, *,
    tile_h: int, n_tiles: int, strip_rows: int, n_wtiles: int,
    precision,
):
    """MXU variant: both conv passes as banded matmuls.

    The VPU variants spend one multiply-add lane-op per tap per pixel; the
    MXU contracts all taps of a pass in one systolic matmul, which is the
    difference between ~85 GB/s-equivalent and memory-bound throughput at
    gaussian radii.  The H pass is a single (tile_h, strip_rows) x
    (strip_rows, w_total) dot; the W pass runs per output lane tile with
    three tile-aligned (128,128,128) dots (2x FLOP overhead over the band,
    but the MXU's sweet-spot shape and zero relayouts)."""
    ci = pl.program_id(0)
    i = pl.program_id(1)

    def strip_dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[ci, pl.ds(step * tile_h, strip_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        strip_dma(i, slot).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        strip_dma(i + 1, other).start()

    strip_dma(i, slot).wait()

    tmp[:, :] = jnp.dot(
        a_ref[:, :], scratch[slot], preferred_element_type=jnp.float32, precision=precision
    ).astype(tmp.dtype)
    for j in range(n_wtiles):
        acc = jnp.dot(
            tmp[:, j * 128 : (j + 1) * 128], c0_ref[:, :],
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc += jnp.dot(
            tmp[:, (j + 1) * 128 : (j + 2) * 128], c1_ref[:, :],
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc += jnp.dot(
            tmp[:, (j + 2) * 128 : (j + 3) * 128], c2_ref[:, :],
            preferred_element_type=jnp.float32, precision=precision,
        )
        o_ref[0, :, j * 128 : (j + 1) * 128] = acc.astype(o_ref.dtype)


def sep_conv_fused_mxu(
    x: jnp.ndarray,
    wh: np.ndarray,
    ww: np.ndarray,
    mode: str = "edge",
    tile_h: int = 128,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Separable conv with both passes on the MXU (see _sep_fused_kernel_mxu).

    Requires the W radius <= 128 so the tap band spans at most three aligned
    lane tiles; callers fall back to sep_conv_fused otherwise.  ``precision``
    follows jax.lax.Precision: the TPU MXU's native f32 matmul truncates
    operands to bf16 (~1e-3 abs error on [0,1] images); HIGHEST runs the
    3-pass f32 decomposition instead."""
    wh = np.asarray(wh, dtype=np.float32)
    ww = np.asarray(ww, dtype=np.float32)
    rh = (len(wh) - 1) // 2
    rw = (len(ww) - 1) // 2
    if rw > 128:
        return sep_conv_fused(x, wh, ww, mode, tile_h, interpret)
    c, h, w = x.shape
    if rh == 0 and rw == 0:
        return x * float(wh[0]) * float(ww[0])
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    # DMA strips align to the dtype's sublane tile: (8, 128) for 4-byte
    # types, (16, 128) for bf16.
    sub = 16 if x.dtype.itemsize == 2 else 8
    strip_rows = _round_up(tile_h + 2 * rh, sub)
    row_slack = strip_rows - (tile_h + 2 * rh)
    w_out_pad = _round_up(w, 128)
    n_wtiles = w_out_pad // 128
    # One full lane tile of padding on the left so tile j-relative indexing
    # never needs a negative slice; total width covers tiles 0..n_wtiles+1.
    w_total = (n_wtiles + 2) * 128
    xp = jnp.pad(
        x,
        ((0, 0), (rh, rh + (h_pad - h) + row_slack), (128, w_total - w - 128)),
        mode=pad_mode,
    )
    n_tiles = h_pad // tile_h
    a = jnp.asarray(_band_matrix_h(wh, tile_h, strip_rows))
    c0, c1, c2 = (jnp.asarray(m) for m in _band_matrices_w(ww))
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ci, i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _sep_fused_kernel_mxu,
            tile_h=tile_h,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            n_wtiles=n_wtiles,
            precision=precision,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w_out_pad), x.dtype),
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((tile_h, strip_rows)),
            const_spec((128, 128)),
            const_spec((128, 128)),
            const_spec((128, 128)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out_pad), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.VMEM((tile_h, w_total), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a, c0, c1, c2)
    return out[:, :h, :w]


def _split3_np(m: np.ndarray) -> np.ndarray:
    """Split an f32 matrix into 3 stacked bf16 terms summing to ~m exactly.

    bf16 has 8 mantissa bits, f32 has 24: three rounds of
    round-and-subtract capture the full f32 mantissa (Dekker-style
    splitting; each residual subtraction is exact in f32)."""
    import ml_dtypes

    terms = []
    rem = m.astype(np.float32)
    for _ in range(3):
        t = rem.astype(ml_dtypes.bfloat16)
        terms.append(t)
        rem = rem - t.astype(np.float32)
    return np.stack(terms)


# The 6 split-product passes that matter for f32: term (a, b) contributes
# at relative magnitude ~2^(-8(a+b)), so pairs with a+b <= 2 cover the
# full 24-bit mantissa and the dropped tail is below half an f32 ulp.
_X3_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))


def _band_matrices_w3_shift(wp: np.ndarray, rw_pad: int,
                            shift: int = 128) -> np.ndarray:
    """Three (128, 128) W-band matrices for a 3-tile window whose source
    origin sits ``shift`` columns left of the output tile's first column.

    Output col q of a tile (strip col ``origin + shift + q``) taps source
    window col s with lead-padded tap index k = s - shift - q + rw_pad:
    C_t[p, q] = wp[128 t + p - shift - q + rw_pad].  Used by the strip
    megakernels, whose data origin (w_base, or a block's w_base - ew) is
    already lane-aligned — no repadding of the input, unlike the
    standalone kernel's 64-lane 2-tile layout."""
    t_p = np.arange(384).reshape(3, 128, 1)
    q = np.arange(128).reshape(1, 1, 128)
    k = t_p - shift - q + rw_pad
    valid = (k >= 0) & (k < len(wp))
    return np.where(valid, np.asarray(wp, np.float32)[np.clip(k, 0, len(wp) - 1)], 0.0).astype(np.float32)


def _band_matrices_w2_shiftstore(wp: np.ndarray) -> np.ndarray:
    """(256, 128) 2-tile W band for the SHIFT-STORED H result (rw <= 64).

    The in-kernel MXU stages' source origin (w_base) is 128-aligned, so
    a tap window of output tile j starts 128 - rw_pad columns into an
    aligned tile and the generic band needs 3 tiles
    (_band_matrices_w3_shift).  Storing the H result shifted LEFT by
    ``w_base - rw_pad`` lanes instead (one lane-rotate folded into the
    bf16 downcast store the stage already pays) puts the window of
    output tile j exactly at ts columns [128j, 128j + 128 + 2 rw), so
    two tiles cover it whenever rw_pad <= 64: ts col 128j + 128t + p
    holds source col 128j + 128t + p + (w_base - rw_pad), hence
    lead-padded tap index k = 128t + p - q and
    C[128t + p, q] = wp[128t + p - q] — one third less MXU work per
    W pass than the 3-tile band."""
    t_p = np.arange(256).reshape(256, 1)
    q = np.arange(128).reshape(1, 128)
    k = t_p - q
    valid = (k >= 0) & (k < len(wp))
    return np.where(
        valid, np.asarray(wp, np.float32)[np.clip(k, 0, len(wp) - 1)], 0.0
    ).astype(np.float32)


def _band_matrices_w2(weights: np.ndarray) -> np.ndarray:
    """Two (128, 128) matrices for the 2-tile W pass (radius <= 64).

    With the input padded 64 lanes on the left, output tile j's tap window
    [n - r, n + r] spans only xpad tiles j and j+1:
    out[:, q] = sum_t xpad_tile_{j+t}[:, p] * C_t[p, q] with
    C_t[p, q] = w[128 t + p - 64 - q + r].  One third less MXU work than
    the generic 3-tile band."""
    r = (len(weights) - 1) // 2
    cs = np.zeros((2, 128, 128), dtype=np.float32)
    for t in range(2):
        for p in range(128):
            for q in range(128):
                k = 128 * t + p - 64 - q + r
                if 0 <= k < len(weights):
                    cs[t, p, q] = weights[k]
    return cs


def _sep_fused_kernel_mxu_x3(
    x_hbm, a_ref, c_ref, o_ref, scratch, xs, tmp, ts, sems, *,
    tile_h: int, n_tiles: int, strip_rows: int, n_wtiles: int,
    n_ctiles: int,
):
    """f32-exact MXU variant: both conv passes as banded matmuls on bf16
    split triples.

    The TPU MXU contracts bf16 natively (an f32 dot truncates operands to
    bf16, ~1e-3 abs on [0,1] images — fine for rgba16f storage, not for
    rgba32f).  Here every f32 operand is split into three bf16 terms
    (exactly, 3 x 8 mantissa bits = f32's 24) and each conv pass runs the
    six significant cross-products as bf16 dots accumulating in f32 —
    full f32 precision at MXU speed, the image-kernel analog of the
    bf16x3 matmul decomposition XLA uses for Precision.HIGHEST (which
    Mosaic does not support inside kernels, hence hand-rolled)."""
    ci = pl.program_id(0)
    i = pl.program_id(1)

    def strip_dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[ci, pl.ds(step * tile_h, strip_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        strip_dma(i, slot).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        strip_dma(i + 1, other).start()

    strip_dma(i, slot).wait()

    # Split the f32 strip into bf16 terms (each residual subtraction is
    # exact in f32; the split terms land in dedicated bf16 scratch).
    s = scratch[slot]
    t0 = s.astype(jnp.bfloat16)
    xs[0, :, :] = t0
    s = s - t0.astype(jnp.float32)
    t1 = s.astype(jnp.bfloat16)
    xs[1, :, :] = t1
    xs[2, :, :] = (s - t1.astype(jnp.float32)).astype(jnp.bfloat16)

    # H pass: tmp = A @ strip over the six split products (statement-wise
    # ref accumulation keeps the VMEM stack flat).
    tmp[:, :] = jnp.dot(a_ref[0], xs[0], preferred_element_type=jnp.float32)
    for a, b in _X3_PAIRS[1:]:
        tmp[:, :] += jnp.dot(a_ref[a], xs[b], preferred_element_type=jnp.float32)

    # Split tmp for the W pass.
    s = tmp[:, :]
    t0 = s.astype(jnp.bfloat16)
    ts[0, :, :] = t0
    s = s - t0.astype(jnp.float32)
    t1 = s.astype(jnp.bfloat16)
    ts[1, :, :] = t1
    ts[2, :, :] = (s - t1.astype(jnp.float32)).astype(jnp.bfloat16)

    # W pass: output tile j = tmp_tiles_{j..j+n_ctiles-1} @ [C_0; ...] over
    # split products.  The C tiles are pre-concatenated along K so each
    # (a, b) product is ONE (tile_h, 128 n_ctiles) x (128 n_ctiles, 128)
    # dot — dot-dispatch count is what bounds this pass, not FLOPs.
    kw = n_ctiles * 128
    for j in range(n_wtiles):
        acc = None
        for a, b in _X3_PAIRS:
            d = jnp.dot(
                ts[a, :, j * 128 : j * 128 + kw],
                c_ref[b],
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        o_ref[0, :, j * 128 : (j + 1) * 128] = acc


def sep_conv_fused_mxu_x3(
    x: jnp.ndarray,
    wh: np.ndarray,
    ww: np.ndarray,
    mode: str = "edge",
    tile_h: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """f32-exact separable conv with both passes on the MXU via bf16x3
    splits (see _sep_fused_kernel_mxu_x3).  Same band/tile layout as
    sep_conv_fused_mxu; requires rw <= 128."""
    wh = np.asarray(wh, dtype=np.float32)
    ww = np.asarray(ww, dtype=np.float32)
    rh = (len(wh) - 1) // 2
    rw = (len(ww) - 1) // 2
    if rw > 128:
        return sep_conv_fused(x, wh, ww, mode, tile_h, interpret)
    c, h, w = x.shape
    if rh == 0 and rw == 0:
        return x * float(wh[0]) * float(ww[0])
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    strip_rows = _round_up(tile_h + 2 * rh, 8)
    row_slack = strip_rows - (tile_h + 2 * rh)
    w_out_pad = _round_up(w, 128)
    n_wtiles = w_out_pad // 128
    # Radius <= 64: the tap window fits two aligned lane tiles with a
    # 64-lane left pad (one third less W-pass MXU work than 3-tile).
    n_ctiles = 2 if rw <= 64 else 3
    left = 64 if n_ctiles == 2 else 128
    w_total = (n_wtiles + n_ctiles - 1) * 128
    xp = jnp.pad(
        x,
        ((0, 0), (rh, rh + (h_pad - h) + row_slack), (left, w_total - w - left)),
        mode=pad_mode,
    )
    n_tiles = h_pad // tile_h
    a3 = jnp.asarray(_split3_np(_band_matrix_h(wh, tile_h, strip_rows)))
    if n_ctiles == 2:
        cmats = _band_matrices_w2(ww)
    else:
        cmats = np.stack(_band_matrices_w(ww))
    # Concatenate the per-tile C matrices along K (split term b stays the
    # leading axis): one dot per split product in the kernel's W pass.
    c3 = jnp.asarray(
        np.stack(
            [
                np.concatenate([_split3_np(m)[b] for m in cmats], axis=0)
                for b in range(3)
            ]
        )
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ci, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    vmem_use = (
        2 * strip_rows * w_total * 4
        + 3 * _round_up(strip_rows, 16) * w_total * 2
        + tile_h * w_total * 4
        + 3 * _round_up(tile_h, 16) * w_total * 2
        + 2 * tile_h * w_out_pad * 4
        + strip_rows * w_total * 4  # split residual temporary
        + 3 * tile_h * strip_rows * 2
        + 3 * n_ctiles * 128 * 128 * 2
    )
    out = pl.pallas_call(
        functools.partial(
            _sep_fused_kernel_mxu_x3,
            tile_h=tile_h,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            n_wtiles=n_wtiles,
            n_ctiles=n_ctiles,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w_out_pad), x.dtype),
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((3, tile_h, strip_rows)),
            const_spec((3, n_ctiles * 128, 128)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out_pad), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, strip_rows, w_total), jnp.float32),
            pltpu.VMEM((3, strip_rows, w_total), jnp.bfloat16),
            pltpu.VMEM((tile_h, w_total), jnp.float32),
            pltpu.VMEM((3, tile_h, w_total), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * vmem_use + 4 * 1024 * 1024, 64 * 1024 * 1024),
        ),
        interpret=interpret,
    )(xp, a3, c3)
    return out[:, :h, :w]


def mxu_x3_tile_h(w: int, rh: int, rw: int) -> int | None:
    """Largest tile_h whose f32-split MXU VMEM footprint fits, or None.

    Budget: double-buffered f32 strips + their 3-term bf16 splits + the
    f32 H-pass tmp + its bf16 splits + double-buffered f32 output blocks
    + tap-matrix terms, against the same ~15.5 MB budget as fused_tile_h."""
    if rw > 128:
        return None
    n_wtiles = _round_up(w, 128) // 128
    n_ctiles = 2 if rw <= 64 else 3
    w_total = (n_wtiles + n_ctiles - 1) * 128
    # The x3 wrapper raises the Mosaic VMEM limit to its computed
    # footprint (v5e has far more physical VMEM than the ~16 MB default
    # scoped budget), so tile_h=128 — full MXU row utilization — fits at
    # 4K; budget against a conservative 40 MB ceiling.
    for tile_h in (128, 64, 32):
        strip_rows = _round_up(tile_h + 2 * rh, 8)
        sr16 = _round_up(strip_rows, 16)
        strips = 2 * strip_rows * w_total * 4
        xsplits = 3 * sr16 * w_total * 2
        tmp = tile_h * w_total * 4
        tsplits = 3 * _round_up(tile_h, 16) * w_total * 2
        out = 2 * tile_h * n_wtiles * 128 * 4
        temps = 2 * strip_rows * w_total * 4
        consts = 3 * tile_h * strip_rows * 2 + 3 * n_ctiles * 128 * 128 * 2
        use = strips + xsplits + tmp + tsplits + out + temps + consts
        if use < 40 * 1024 * 1024:
            return tile_h
    return None


def _sep_fused_kernel_multi(
    x_hbm, *rest,
    weights: tuple, tile_h: int, out_w: int, n_tiles: int, strip_rows: int,
    raw: bool = False, rh_max: int = 0, in_h: int = 0, in_w: int = 0,
    pad_edge_mode: bool = True, w_base: int | None = None, rw_max: int = 0,
):
    """N separable convs of the SAME input in one kernel.

    The VPU tap loop is VMEM-load-bound (BENCH.md: two accumulators from
    one loaded slice cost the same as one), so convolutions sharing an
    input should share its strip loads: the H pass iterates the UNION of
    tap offsets, loads each shifted slice once, and accumulates into every
    conv whose kernel covers that offset.  DMA, and the strip residency,
    are also paid once instead of N times.  ``weights`` is a tuple of
    (padded_weights_h, padded_weights_w) per conv, tap k at absolute
    offset k in the shared strip (smaller-radius convs lead-padded with
    zeros so offsets align)."""
    n_convs = len(weights)
    o_refs = rest[:n_convs]
    scratch, tmps_t, sems = rest[n_convs:]
    ci = pl.program_id(0)
    i = pl.program_id(1)
    if w_base is None:
        w_base = rw_max  # padded path: data sits at column RW

    dma_do = _strip_dma_fn(
        ci, x_hbm, scratch, sems, raw=raw, tile_h=tile_h,
        strip_rows=strip_rows, rh_max=rh_max, n_tiles=n_tiles,
        in_h=in_h, in_w=in_w, w_base=w_base,
    )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        dma_do(i, slot, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        dma_do(i + 1, other, "start")

    dma_do(i, slot, "wait")

    if raw:
        _strip_fill_halos(
            i, slot, scratch, tile_h=tile_h, strip_rows=strip_rows,
            rh_max=rh_max, n_tiles=n_tiles, in_w=in_w, w_base=w_base,
            edge=pad_edge_mode,
        )

    # Shared-load H pass: one register-blocked sweep accumulates ALL convs
    # from each loaded value block (the whole point of the bundle), each
    # accumulator block stored TRANSPOSED straight into its conv's
    # (w_total, tile_h) buffer — the W pass needs that orientation, and
    # block-granular transposes skip the full-buffer roundtrip the old
    # tmp/tmp_t pair paid per conv per strip.
    _blocked_taps(
        lambda r, blk, c, L: scratch[slot, r : r + blk, c : c + L],
        lambda ki, r, n, c, L, acc: tmps_t.__setitem__(
            (ki, slice(c, c + L), slice(r, r + n)), acc.T
        ),
        tile_h,
        tmps_t.shape[1],
        [wh for wh, _ in weights],
    )

    # W pass per conv (inputs differ, so no cross-conv sharing exists);
    # accumulator blocks store transposed DIRECTLY into the output block.
    # The data sits at column w_base; taps are padded to rw_max.
    woff = w_base - rw_max
    for k, (_, ww) in enumerate(weights):
        _blocked_taps(
            lambda r, blk, c, L, k=k: tmps_t[
                k, r + woff : r + woff + blk, c : c + L
            ],
            lambda ki, r, n, c, L, acc, k=k: o_refs[k].__setitem__(
                (0, slice(c, c + L), slice(r, r + n)), acc.T
            ),
            out_w,
            tile_h,
            [ww],
        )


def sep_conv_fused_multi(
    x: jnp.ndarray,
    plans: list,
    mode: str = "edge",
    tile_h: int = 64,
    interpret: bool = False,
) -> tuple:
    """Run N separable convolutions of one input in a single fused kernel
    (see _sep_fused_kernel_multi).  ``plans`` is a list of (wh, ww) numpy
    tap vectors; returns one (C, H, W) array per plan, numerically
    identical to sep_conv_fused run per plan."""
    c, h, w = x.shape
    whs = [np.asarray(wh, np.float32) for wh, _ in plans]
    wws = [np.asarray(ww, np.float32) for _, ww in plans]
    rhs = [(len(v) - 1) // 2 for v in whs]
    rws = [(len(v) - 1) // 2 for v in wws]
    RH, RW = max(rhs), max(rws)
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    # In-kernel padding (see _strip_dma_fn).
    raw, RH8 = _raw_strip_geometry(h, w, tile_h, RH)
    if raw:
        RH = RH8
        h_pad = h
    # Extents cover the register-blocked tap reads (see sep_conv_fused).
    strip_rows = max(
        _round_up(tile_h + 2 * RH, 8),
        tile_h - 8 + _blocked_rows(2 * RH + 1),
    )
    row_slack = strip_rows - (tile_h + 2 * RH)
    if raw:
        w_base = 128
        xp = x
        w_total = _round_up(w_base + w + _round_up(2 * RW, 8) - RW, 128)
    else:
        w_base = None
        w_total = _round_up(
            max(w + 2 * RW, w - 8 + _blocked_rows(2 * RW + 1)), 128
        )
        xp = jnp.pad(
            x,
            ((0, 0), (RH, RH + (h_pad - h) + row_slack), (RW, w_total - w - RW)),
            mode=pad_mode,
        )
    n_tiles = h_pad // tile_h
    # Lead-pad smaller kernels with zeros so tap offsets align in the
    # shared strip/rows domain.
    weights = tuple(
        (
            (0.0,) * (RH - rh) + tuple(float(v) for v in wh),
            (0.0,) * (RW - rw) + tuple(float(v) for v in ww),
        )
        for wh, ww, rh, rw in zip(whs, wws, rhs, rws)
    )
    n = len(plans)
    out = pl.pallas_call(
        functools.partial(
            _sep_fused_kernel_multi,
            weights=weights,
            tile_h=tile_h,
            out_w=w,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            raw=raw,
            rh_max=RH,
            in_h=h,
            in_w=w,
            pad_edge_mode=(pad_mode == "edge"),
            w_base=w_base,
            rw_max=RW,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((c, h_pad, w), x.dtype) for _ in range(n)
        ),
        grid=(c, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, tile_h, w), lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.VMEM((n, w_total, tile_h), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp)
    return tuple(o[:, :h, :] for o in out)



def _strip_dma_fn(ci, x_hbm, scratch, sems, *, raw, tile_h, strip_rows,
                  rh_max, n_tiles, in_h, in_w, w_base):
    """dma_do(step, slot, what) for a conv strip kernel.

    Padded mode copies full pre-padded strips.  Raw mode (in-kernel
    padding) copies clamped windows straight from the unpadded frame —
    the first/middle/last strips differ in extent, so start and wait
    each branch three ways; the halos are synthesized afterwards by
    _strip_fill_halos.  Geometry contract (callers gate on it): tile_h,
    rh_max, strip_rows multiples of 8; in_w a multiple of 128; w_base
    128-aligned.  The whole-frame jnp.pad copy this replaces costs
    ~0.9 ms at 4K and does NOT hoist out of a frame-sequencing loop
    (profiled; BENCH.md)."""
    if not raw:
        def dma_do(step, slot, what):
            cp = pltpu.make_async_copy(
                x_hbm.at[ci, pl.ds(step * tile_h, strip_rows), :],
                scratch.at[slot],
                sems.at[slot],
            )
            cp.start() if what == "start" else cp.wait()
        return dma_do

    first_rows = strip_rows - rh_max
    last_rows = tile_h + rh_max

    def dma_do(step, slot, what):
        @pl.when(step == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[ci, pl.ds(0, first_rows), :],
                scratch.at[slot, pl.ds(rh_max, first_rows),
                           pl.ds(w_base, in_w)],
                sems.at[slot],
            )
            cp.start() if what == "start" else cp.wait()

        if n_tiles > 2:  # with 2 strips the mid branch is dead code, and
            # its full-strip slice can exceed the frame height
            @pl.when(jnp.logical_and(step > 0, step < n_tiles - 1))
            def _():
                # tile_h and rh_max are both multiples of 8, so the start
                # is too — Mosaic needs the explicit divisibility hint.
                start = pl.multiple_of(step * tile_h - rh_max, 8)
                cp = pltpu.make_async_copy(
                    x_hbm.at[ci, pl.ds(start, strip_rows), :],
                    scratch.at[slot, pl.ds(0, strip_rows), pl.ds(w_base, in_w)],
                    sems.at[slot],
                )
                cp.start() if what == "start" else cp.wait()

        @pl.when(step == n_tiles - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[ci, pl.ds(in_h - last_rows, last_rows), :],
                scratch.at[slot, pl.ds(0, last_rows), pl.ds(w_base, in_w)],
                sems.at[slot],
            )
            cp.start() if what == "start" else cp.wait()

    return dma_do


def _strip_fill_halos(i, slot, scratch, *, tile_h, strip_rows, rh_max,
                      n_tiles, in_w, w_base, edge):
    """Synthesize a raw strip's halos in VMEM: H first (halo rows read
    the DMA'd columns), then W over ALL rows, so corners compose as
    edge(edge) / zero — exactly jnp.pad's semantics."""
    sr, wt = strip_rows, scratch.shape[2]

    @pl.when(i == 0)
    def _():
        if edge:
            scratch[slot, 0:rh_max, :] = jnp.broadcast_to(
                scratch[slot, rh_max : rh_max + 1, :], (rh_max, wt)
            )
        else:
            scratch[slot, 0:rh_max, :] = jnp.zeros((rh_max, wt), scratch.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        lo = tile_h + rh_max
        if edge:
            scratch[slot, lo:sr, :] = jnp.broadcast_to(
                scratch[slot, lo - 1 : lo, :], (sr - lo, wt)
            )
        else:
            scratch[slot, lo:sr, :] = jnp.zeros((sr - lo, wt), scratch.dtype)

    if w_base > 0:
        if edge:
            scratch[slot, :, 0:w_base] = jnp.broadcast_to(
                scratch[slot, :, w_base : w_base + 1], (sr, w_base)
            )
        else:
            scratch[slot, :, 0:w_base] = jnp.zeros((sr, w_base), scratch.dtype)
    right = wt - w_base - in_w
    if right > 0:
        if edge:
            scratch[slot, :, w_base + in_w :] = jnp.broadcast_to(
                scratch[slot, :, w_base + in_w - 1 : w_base + in_w],
                (sr, right),
            )
        else:
            scratch[slot, :, w_base + in_w :] = jnp.zeros(
                (sr, right), scratch.dtype
            )


def _raw_strip_geometry(h: int, w: int, tile_h: int, RH: int):
    """(raw_ok, RH8) for the in-kernel padding gate (see _strip_dma_fn).

    The 8-row granularity holds for bf16 strips too: Mosaic accepts
    8-row DMA offsets into (16, 128)-tiled bf16 VMEM (verified on
    hardware with RH8=8 — output exact to bf16 storage precision with no
    strip-boundary artifacts), so no separate 16-row gate is needed."""
    RH8 = _round_up(RH, 8)
    strip_rows8 = max(
        _round_up(tile_h + 2 * RH8, 8),
        tile_h - 8 + _blocked_rows(2 * RH8 + 1),
    )
    ok = (
        h % tile_h == 0
        and h // tile_h >= 2
        and w % 128 == 0  # DMA lane-slice shapes must be 128-tiled
        and tile_h >= RH8
        and h >= strip_rows8 - RH8
        and h >= tile_h + RH8
    )
    return ok, RH8


def _graph_strip_kernel(
    x_hbm, t_ref, r0_ref, *refs,
    weights: tuple, tile_h: int, out_w: int, n_tiles: int, strip_rows: int,
    rh_max: int, rw_max: int, epilogue, raw: bool = False,
    in_h: int = 0, in_w: int = 0, pad_edge_mode: bool = True,
    w_base: int | None = None, n_aux: int = 0, x3_idx: tuple = (),
    x3_terms: int = 3, w2s: int = 0,
):
    """The WHOLE graph in one streaming pass: shared-load convs + a traced
    channel-local epilogue that evaluates every remaining (pointwise) node
    on the strip while it is still in VMEM.

    This is what XLA's fusion cannot do across custom-call boundaries and
    the reference cannot do across pipeline dispatches (one vkCmdDispatch
    + barriers per node, command.rs:166-242): intermediate images never
    touch HBM at all — the frame costs ONE input read + ONE output write
    regardless of graph depth.

    ``n_aux`` coordinate planes (see KernelSpec.cw_coord_plane) arrive as
    one extra block-pipelined input: data- and time-independent epilogue
    terms are precomputed once per program and streamed per strip instead
    of being rebuilt on the VPU per channel per frame."""
    if n_aux:
        aux_ref, *refs = refs
    a3_ref = c3_ref = None
    if x3_idx:
        a3_ref, c3_ref, *refs = refs
    o_ref, scratch, tmps_t, blur_b, sems, *rest = refs
    xs_s = None
    if x3_idx and x3_terms == 3:
        xs_s, tmpf_s, ts_s = rest[-3:]
        rest = rest[:-3]
    elif x3_idx:
        tmpf_s, ts_s = rest[-2:]
        rest = rest[:-2]
    maybe_xf32 = rest
    ci = pl.program_id(0)
    i = pl.program_id(1)
    if w_base is None:
        w_base = rw_max  # padded path: data sits at column RW

    dma_do = _strip_dma_fn(
        ci, x_hbm, scratch, sems, raw=raw, tile_h=tile_h,
        strip_rows=strip_rows, rh_max=rh_max, n_tiles=n_tiles,
        in_h=in_h, in_w=in_w, w_base=w_base,
    )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        dma_do(i, slot, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        dma_do(i + 1, other, "start")

    dma_do(i, slot, "wait")

    if raw:
        _strip_fill_halos(
            i, slot, scratch, tile_h=tile_h, strip_rows=strip_rows,
            rh_max=rh_max, n_tiles=n_tiles, in_w=in_w, w_base=w_base,
            edge=pad_edge_mode,
        )

    # Strips may be stored bf16 (rgba16f: halves the DMA); compute is
    # always f32 (the GPU storage-image convention — shaders compute
    # fp32 regardless of the image format).  The upcast happens ONCE
    # into an f32 staging buffer: per-tap-slice converts (and bf16's
    # packed-sublane shuffles) cost far more than one strip copy.
    # REFORGE_BF16_BLOCK_UPCAST=1 tries the middle ground instead: no
    # staging buffer, upcast at BLOCK granularity in the tap schedule
    # (each block is read once per pass and shared across taps/convs, so
    # the convert count matches the staging copy's read side while the
    # whole-strip write+read roundtrip disappears).
    xf32 = None
    if maybe_xf32:
        xf32 = maybe_xf32[0]
        xf32[:, :] = scratch[slot].astype(jnp.float32)
        src = lambda r, blk, c, L: xf32[r : r + blk, c : c + L]
    elif scratch.dtype != jnp.float32:
        src = lambda r, blk, c, L: scratch[
            slot, r : r + blk, c : c + L
        ].astype(jnp.float32)
    else:
        src = lambda r, blk, c, L: scratch[slot, r : r + blk, c : c + L]

    # Heavy convs (x3_idx) run both passes as banded MXU matmuls on
    # bf16x3 splits — f32-exact (see _sep_fused_kernel_mxu_x3), and
    # sigma-independent where the VPU pays ~13 us per tap.  The strip is
    # already in VMEM, so unlike the standalone x3 kernel there is no
    # repad/DMA fixed cost; the split of the strip is shared across all
    # heavy convs.  The MXU contracts while the VPU runs the remaining
    # taps/epilogue — different units.
    if x3_idx:
        pairs = _X3_PAIRS if x3_terms == 3 else ((0, 0),)
        if x3_terms == 3:
            sv = xf32[:, :] if xf32 is not None else scratch[slot]
            if sv.dtype != jnp.float32:
                sv = sv.astype(jnp.float32)
            b0 = sv.astype(jnp.bfloat16)
            xs_s[0, 0 : strip_rows, :] = b0
            sv = sv - b0.astype(jnp.float32)
            b1 = sv.astype(jnp.bfloat16)
            xs_s[1, 0 : strip_rows, :] = b1
            xs_s[2, 0 : strip_rows, :] = (
                sv - b1.astype(jnp.float32)
            ).astype(jnp.bfloat16)
            # Slice the splits to the real strip rows below: the
            # buffer's bf16 sublane-alignment pad rows are never written
            # (arbitrary VMEM bits — 0 * NaN would poison the dot).
            xsrc = lambda b: xs_s[b, 0:strip_rows, :]
        else:
            # bf16 storage: the strip IS the single term — no splits.
            xsrc = lambda b: scratch[slot]
        n_wtiles = out_w // 128
        for m, k in enumerate(x3_idx):
            tmpf_s[:, :] = jnp.dot(
                a3_ref[m, 0], xsrc(0),
                preferred_element_type=jnp.float32,
            )
            for a, b in pairs[1:]:
                tmpf_s[:, :] += jnp.dot(
                    a3_ref[m, a], xsrc(b),
                    preferred_element_type=jnp.float32,
                )
            # With w2s > 0 the bf16 downcast stores are lane-rotated by
            # w2s so the W windows tile-align and the band is 2 tiles
            # instead of 3 (_band_matrices_w2_shiftstore) — the rotate
            # folds into a store the stage pays anyway.
            wt_full = ts_s.shape[-1]
            w_win = 256 if w2s else 384

            def _store(term, blk):
                ts_s[term, 0 : tile_h, 0 : wt_full - w2s] = (
                    blk[:, w2s:] if w2s else blk
                )

            tv = tmpf_s[:, :]
            b0 = tv.astype(jnp.bfloat16)
            _store(0, b0)
            if x3_terms == 3:
                tv = tv - b0.astype(jnp.float32)
                b1 = tv.astype(jnp.bfloat16)
                _store(1, b1)
                _store(2, (tv - b1.astype(jnp.float32)).astype(jnp.bfloat16))
            for j in range(n_wtiles):
                acc = None
                for a, b in pairs:
                    d = jnp.dot(
                        ts_s[a, 0 : tile_h, 128 * j : 128 * j + w_win],
                        c3_ref[m, b],
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                blur_b[k, :, 128 * j : 128 * (j + 1)] = acc

    # Shared-load H pass for the remaining (VPU) convs at once, each
    # accumulator block stored TRANSPOSED straight into its conv's
    # (w_total, tile_h) buffer: the W pass needs the transposed
    # orientation anyway, and transposing at block granularity skips the
    # full-buffer roundtrip (untransposed write + read + bulk `.T` copy)
    # the old tmp/tmp_t pair paid per conv per strip.
    vpu_ks = [k for k in range(len(weights)) if k not in x3_idx]
    if vpu_ks:
        _blocked_taps(
            src,
            lambda ki, r, n, c, L, acc: tmps_t.__setitem__(
                (vpu_ks[ki], slice(c, c + L), slice(r, r + n)), acc.T
            ),
            tile_h,
            tmps_t.shape[1],
            [weights[k][0] for k in vpu_ks],
        )

    # W pass per conv, accumulator blocks again stored transposed — back
    # into natural orientation — so the epilogue reads each blur as a
    # value with no bulk transpose.  The data sits at column w_base of
    # the strip; the taps are padded to rw_max, so the source rows
    # (transposed columns) start w_base-rw_max past the output row.
    woff = w_base - rw_max
    for k in vpu_ks:
        _blocked_taps(
            lambda r, blk, c, L, k=k: tmps_t[
                k, r + woff : r + woff + blk, c : c + L
            ],
            lambda ki, r, n, c, L, acc, k=k: blur_b.__setitem__(
                (k, slice(c, c + L), slice(r, r + n)), acc.T
            ),
            out_w,
            tile_h,
            [weights[k][1]],
        )
    blurs = [blur_b[k] for k in range(len(weights))]

    # The strip's center block, for pointwise consumption of the input
    # (bf16 -> f32 upcast is exact, so the staged copy IS the stored
    # value).
    if xf32 is not None:
        xin = xf32[rh_max : rh_max + tile_h, w_base : w_base + out_w]
    else:
        xin = scratch[slot, rh_max : rh_max + tile_h, w_base : w_base + out_w]
        if scratch.dtype != jnp.float32:
            xin = xin.astype(jnp.float32)
    if n_aux:
        aux_blocks = [aux_ref[k] for k in range(n_aux)]
        out = epilogue(
            ci, r0_ref[0, 0] + i * tile_h, t_ref[0, 0], xin, blurs, aux_blocks
        )
    else:
        out = epilogue(ci, r0_ref[0, 0] + i * tile_h, t_ref[0, 0], xin, blurs)
    o_ref[0, :, :] = out


def graph_strip_fused(
    x: jnp.ndarray,
    t,
    plans: list,
    epilogue,
    mode: str = "edge",
    tile_h: int = 64,
    interpret: bool = False,
    row0_base=None,
    aux: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Execute a conv + channel-local-pointwise graph as ONE fused kernel.

    ``plans`` is a list of (wh, ww) tap vectors (the graph's conv nodes,
    all reading the kernel input); ``epilogue(ci, row0, t, xin, blurs)``
    produces the final (tile_h, w) output block for channel ``ci`` from
    the input block and the blur results.  ``aux`` is an optional
    (n_aux, h, w) f32 stack of precomputed coordinate planes streamed to
    the epilogue per strip (epilogue then takes a sixth ``aux_blocks``
    argument).  See _graph_strip_kernel."""
    interpret = interpret or _os.environ.get("REFORGE_PALLAS_INTERPRET") == "1"
    c, h, w = x.shape
    whs = [np.asarray(wh, np.float32) for wh, _ in plans]
    wws = [np.asarray(ww, np.float32) for _, ww in plans]
    rhs = [(len(v) - 1) // 2 for v in whs]
    rws = [(len(v) - 1) // 2 for v in wws]
    RH, RW = max(rhs), max(rws)
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    # In-kernel padding (see _strip_dma_fn): Mosaic requires DMA slice
    # row counts aligned to the sublane tile (8), so the raw path rounds
    # the H halo up to a multiple of 8 with zero-padded taps (skipped by
    # the schedule: no compute cost).
    raw, RH8 = _raw_strip_geometry(h, w, tile_h, RH)
    if raw:
        RH = RH8
        h_pad = h
    strip_rows = max(
        _round_up(tile_h + 2 * RH, 8),
        tile_h - 8 + _blocked_rows(2 * RH + 1),
    )
    row_slack = strip_rows - (tile_h + 2 * RH)
    if raw:
        # Data sits at (128-aligned) column 128 of the strip; the W pass
        # offsets its reads by w_base - RW.
        w_base = 128
        xp = x
        w_total = _round_up(w_base + w + _round_up(2 * RW, 8) - RW, 128)
    else:
        w_base = None
        w_total = _round_up(
            max(w + 2 * RW, w - 8 + _blocked_rows(2 * RW + 1)), 128
        )
        xp = jnp.pad(
            x,
            ((0, 0), (RH, RH + (h_pad - h) + row_slack), (RW, w_total - w - RW)),
            mode=pad_mode,
        )
    n_tiles = h_pad // tile_h
    weights = tuple(
        (
            (0.0,) * (RH - rh) + tuple(float(v) for v in wh),
            (0.0,) * (RW - rw) + tuple(float(v) for v in ww),
        )
        for wh, ww, rh, rw in zip(whs, wws, rhs, rws)
    )
    n = len(plans)
    t_arr = jnp.reshape(jnp.asarray(t, jnp.float32), (1, 1))
    # Global row of strip row 0 (the halo-sharded path passes the traced
    # shard offset; 0 for whole-frame execution).
    r0_arr = jnp.reshape(
        jnp.asarray(0 if row0_base is None else row0_base, jnp.int32), (1, 1)
    )
    # Heavy convs run both passes as banded MXU matmuls on bf16x3 splits
    # (f32-exact; see _sep_fused_kernel_mxu_x3): per-tap VPU cost is
    # ~13 us x taps while the MXU band is sigma-independent, and the
    # strip is shared with the VPU convs, so the x3 stage pays extra
    # strip reads for its splits and a 3-tile W band — measured v5e 4K:
    # sigma-4 (50 taps) LOSES in-kernel (flagship 2.09 vs 1.67 ms), so
    # the default threshold is 64 (measured crossover): below it VPU
    # taps win in-kernel, above it the MXU band wins everywhere.  What
    # the in-kernel stage buys is keeping heavy convs FUSED: without it
    # a sigma-8 node dropped the whole graph to per-node execution
    # (gaussian-s8+tonemap 4K: fused-x3 ~1.1 ms vs per-node 3.0).
    x3_min = int(_os.environ.get("REFORGE_STRIP_X3_MIN_TAPS", "64"))
    # bf16 storage (rgba16f): the strip is ALREADY bf16, so MXU band
    # convs need no splits at all — single-product dots on the raw
    # strip, matching the per-node prefer_mxu semantics (bf16 operand
    # rounding is below storage precision).  1/6 the MXU work of the
    # f32-exact x3 path and zero split passes, so the crossover vs VPU
    # taps drops far lower.
    x3_terms = 3
    if x.dtype == jnp.bfloat16:
        x3_terms = 1
        x3_min = int(_os.environ.get("REFORGE_STRIP_MXU_BF16_MIN_TAPS", "24"))
    x3_idx: tuple = ()
    if (raw and w % 128 == 0 and RW <= 128 and x3_min > 0
            and x.dtype in (jnp.float32, jnp.bfloat16)):
        x3_idx = tuple(
            k for k in range(n)
            if len(whs[k]) + len(wws[k]) >= x3_min and rws[k] <= 128
        )
    n_x3 = len(x3_idx)
    x3_args = ()
    x3_specs = []
    x3_scratch = []
    # 2-tile W band (one third less MXU work): store the H result
    # lane-shifted by w2s so tap windows tile-align; needs RW <= 64
    # (see _band_matrices_w2_shiftstore).  REFORGE_MXU_W2=0 keeps the
    # generic 3-tile band for A/Bs.
    w2s = 0
    if (n_x3 and RW <= 64
            and _os.environ.get("REFORGE_MXU_W2", "1") != "0"):
        w2s = w_base - RW
    if n_x3:
        import ml_dtypes

        sr16 = _round_up(strip_rows, 16)

        def h_terms(mat):
            if x3_terms == 3:
                return _split3_np(mat)
            return np.asarray(mat, ml_dtypes.bfloat16)[None]

        def w_band(wp):
            if w2s:
                return _band_matrices_w2_shiftstore(wp)[None]
            return _band_matrices_w3_shift(wp, RW, shift=w_base)

        a3 = jnp.asarray(
            np.stack(
                [
                    h_terms(
                        _band_matrix_h(
                            np.asarray(weights[k][0], np.float32),
                            tile_h, strip_rows,
                        )
                    )
                    for k in x3_idx
                ]
            )
        )
        c3 = jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            np.concatenate(
                                [
                                    h_terms(m)[b]
                                    for m in w_band(
                                        np.asarray(weights[k][1], np.float32)
                                    )
                                ],
                                axis=0,
                            )
                            for b in range(x3_terms)
                        ]
                    )
                    for k in x3_idx
                ]
            )
        )
        x3_args = (a3, c3)
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda ci, i, _nd=len(shape): (0,) * _nd,
            memory_space=pltpu.VMEM,
        )
        x3_specs = [const_spec(tuple(a3.shape)), const_spec(tuple(c3.shape))]
        x3_scratch = (
            [pltpu.VMEM((3, sr16, w_total), jnp.bfloat16)]
            if x3_terms == 3 else []
        ) + [
            pltpu.VMEM((tile_h, w_total), jnp.float32),
            pltpu.VMEM(
                (x3_terms, _round_up(tile_h, 16), w_total), jnp.bfloat16
            ),
        ]
    n_aux = 0
    aux_args = ()
    aux_specs = []
    if aux is not None:
        n_aux = int(aux.shape[0])
        if aux.shape[1] != h_pad:
            aux = jnp.pad(
                aux, ((0, 0), (0, h_pad - aux.shape[1]), (0, 0))
            )
        aux_args = (aux,)
        aux_specs = [
            pl.BlockSpec(
                (n_aux, tile_h, w),
                lambda ci, i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    out = pl.pallas_call(
        functools.partial(
            _graph_strip_kernel,
            weights=weights,
            tile_h=tile_h,
            out_w=w,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            rh_max=RH,
            rw_max=RW,
            epilogue=epilogue,
            raw=raw,
            in_h=h,
            in_w=w,
            pad_edge_mode=(pad_mode == "edge"),
            w_base=w_base,
            n_aux=n_aux,
            x3_idx=x3_idx,
            x3_terms=x3_terms,
            w2s=w2s,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w), x.dtype),
        grid=(c, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + aux_specs + x3_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h, w),
            # REFORGE_STRIP_OUT_CONST=1: timing-only A/B that pins the out
            # block index (one HBM store per frame) to expose how much of
            # the out-pipeline store cost the schedule fails to overlap.
            (lambda ci, i: (0, 0, 0))
            if _os.environ.get("REFORGE_STRIP_OUT_CONST") == "1"
            else (lambda ci, i: (ci, i, 0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.VMEM((n, w_total, tile_h), jnp.float32),
            pltpu.VMEM((n, tile_h, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + (
            [pltpu.VMEM((strip_rows, w_total), jnp.float32)]
            if x.dtype != jnp.float32
            and _os.environ.get("REFORGE_BF16_BLOCK_UPCAST") != "1"
            else []
        ) + x3_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, t_arr, r0_arr, *aux_args, *x3_args)
    return out[:, :h, :]


def multi_tile_h(w: int, rhs_rws: list, n: int, h: int | None = None,
                 n_aux: int = 0, n_x3: int = 0) -> int | None:
    """VMEM model for sep_conv_fused_multi: double-buffered strips + n
    H-pass tmps + transpose/accumulator buffers + n double-buffered
    output blocks, against a 30 MB budget — deliberate headroom under
    the 64 MB Mosaic scoped limit the wrappers set, since the model
    omits tap-schedule temporaries.

    When ``h`` is given, a tile that divides the image height exactly is
    preferred (within 48..128): then h_pad == h and the caller's trailing
    ``out[:, :h, :]`` slice is the identity.  Measured neutral on the 4K
    flagship (XLA fuses the slice away either way) but it keeps the
    kernel's output buffer exactly frame-sized, which matters when the
    consumer can't absorb the slice (e.g. donated buffers)."""
    override = _os.environ.get("REFORGE_STRIP_TILE_H")
    if override:
        # On-chip tile sweeps: bypass the VMEM model, keep divisibility.
        t = int(override)
        return t if (h is None or h % t == 0) else None
    RH = max(rh for rh, _ in rhs_rws)
    RW = max(rw for _, rw in rhs_rws)
    w_total = _round_up(w + 2 * RW, 128)

    def fits(tile_h: int) -> bool:
        strip_rows = _round_up(tile_h + 2 * RH, 8)
        use = (
            2 * strip_rows * w_total * 4  # double-buffered strips
            + n * w_total * tile_h * 4    # transposed H results
            + n * tile_h * w * 4          # W results (epilogue inputs)
            + 2 * tile_h * w * 4          # double-buffered output block
            + 2 * tile_h * w * 4          # epilogue temporaries
            + 2 * n_aux * tile_h * w * 4  # double-buffered coord planes
        )
        if n_x3:
            # MXU x3 conv buffers: shared strip splits + tmp + tmp
            # splits + per-conv band constants (graph_strip_fused).
            sr16 = _round_up(strip_rows, 16)
            use += (
                3 * sr16 * w_total * 2
                + tile_h * w_total * 4
                + 3 * _round_up(tile_h, 16) * w_total * 2
                + n_x3 * (3 * tile_h * sr16 + 3 * 384 * 128) * 2
            )
        # The x3 buffers push past the conservative 30 MB line; the
        # wrapper's Mosaic scoped limit is 64 MB (v5e: 128 MB physical),
        # so allow 40 MB rather than shrinking the tile (tile 120 -> 80
        # measured -0.12 ms on the 4K flagship).
        return use < (40 if n_x3 else 30) * 1024 * 1024

    if h is not None and w % 128 == 0:
        for tile_h in range(128, 40, -8):
            if h % tile_h == 0 and fits(tile_h):
                return tile_h
    for tile_h in (128, 64, 32):
        if fits(tile_h):
            return tile_h
    return None


# Variant policy, re-measured after the transposed-store tap schedule
# (block-granular transposes inside the tap stores; no bulk `.T`
# roundtrips): the transpose variant now wins at EVERY measured size —
# 1080p sigma-2 0.44 vs 0.71 ms, sigma-4 0.49 vs 0.95, and even 512^2
# (0.33 vs 0.35, 0.34 vs 0.39).  The lanes variant remains available
# via the explicit ``variant="lanes"`` override for re-measurement.
# (Round-2 thresholds — width 2560 / 40 taps — predated the
# transposed-store schedule, whose fixed cost they priced in.)
TRANSPOSE_MIN_WIDTH = 0
TRANSPOSE_MIN_TAPS = 0


def _transpose_variant(w: int, taps_total: int) -> bool:
    return w >= TRANSPOSE_MIN_WIDTH or taps_total >= TRANSPOSE_MIN_TAPS


def sep_conv_fused(
    x: jnp.ndarray,
    wh: np.ndarray,
    ww: np.ndarray,
    mode: str = "edge",
    tile_h: int = 128,
    interpret: bool = False,
    variant: str | None = None,  # "transpose" | "lanes" | None=auto
) -> jnp.ndarray:
    """Both separable passes in ONE kernel via manual double-buffered DMA."""
    wh = np.asarray(wh, dtype=np.float32)
    ww = np.asarray(ww, dtype=np.float32)
    rh = (len(wh) - 1) // 2
    rw = (len(ww) - 1) // 2
    c, h, w = x.shape
    if rh == 0 and rw == 0:
        return x * float(wh[0]) * float(ww[0])
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    if variant is None:
        variant = (
            "transpose" if _transpose_variant(w, len(wh) + len(ww)) else "lanes"
        )
    # DMA slice extents must align to the (8, 128) tiling: round the strip
    # row count up to a sublane multiple and the total width to a lane
    # multiple; slack rows/cols are padded into the input and ignored.
    # The transpose variant's register-blocked tap schedule reads value
    # blocks of _blocked_rows taps past each sub-block start, so its
    # strip/width extents cover that too.
    raw = False
    rh_eff = rh
    w_base = None
    if variant == "transpose":
        # In-kernel padding (see _strip_dma_fn): the H halo rounds up to
        # a multiple of 8 via zero taps, the data sits at lane 128.
        raw, RH8 = _raw_strip_geometry(h, w, tile_h, rh)
        if raw:
            rh_eff = RH8
            wh = np.concatenate([np.zeros(RH8 - rh, np.float32), wh])
            h_pad = h
            w_base = 128
    strip_rows = _round_up(tile_h + 2 * rh_eff, 8)
    w_total = _round_up(w + 2 * rw, 128)
    if variant == "transpose":
        strip_rows = max(strip_rows, tile_h - 8 + _blocked_rows(len(wh)))
        if raw:
            w_total = _round_up(
                w_base + w + _round_up(2 * rw, 8) - rw, 128
            )
        else:
            w_total = _round_up(
                max(w + 2 * rw, w - 8 + _blocked_rows(len(ww))), 128
            )
    row_slack = strip_rows - (tile_h + 2 * rh_eff)
    if raw:
        xp = x
    else:
        xp = jnp.pad(
            x,
            ((0, 0), (rh, rh + (h_pad - h) + row_slack), (rw, w_total - w - rw)),
            mode=pad_mode,
        )
    n_tiles = h_pad // tile_h
    taps = dict(
        weights_h=tuple(float(v) for v in wh),
        weights_w=tuple(float(v) for v in ww),
        tile_h=tile_h,
        out_w=w,
        n_tiles=n_tiles,
        strip_rows=strip_rows,
    )
    if variant == "transpose":
        kernel_fn = functools.partial(
            _sep_fused_kernel, **taps, raw=raw, rh_max=rh_eff, in_h=h,
            in_w=w, pad_edge_mode=(pad_mode == "edge"), w_base=w_base,
            rw=rw,
        )
        scratch = [
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.VMEM((w_total, tile_h), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel_fn = functools.partial(_sep_fused_kernel_lanes, **taps)
        scratch = [
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.VMEM((tile_h, w_total), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w), x.dtype),
        grid=(c, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp)
    return out[:, :h, :]


def fused_tile_h(w: int, rh: int, rw: int, h: int | None = None) -> int | None:
    """Largest tile_h whose VMEM footprint fits, or None to use two kernels.

    Budget model: double-buffered input strips + tmp + transpose +
    accumulator buffers + double-buffered output blocks, against a 40 MB
    ceiling (the wrapper raises the Mosaic scoped limit to that; v5e has
    far more physical VMEM).  tile_h=128 matters for the transpose
    variant: its W pass runs at (w_total, tile_h) shapes, so tile_h is the
    LANE extent — 128 keeps the VPU at full width.  When ``h`` is given,
    a tile dividing the height exactly is preferred so the in-kernel
    padding path (raw strip DMA) can engage."""
    w_total = _round_up(w + 2 * rw, 128)
    transpose = _transpose_variant(w, 2 * (rh + rw) + 2)

    def fits(tile_h: int) -> bool:
        strips = 2 * _round_up(tile_h + 2 * rh, 8) * w_total * 4
        out = 2 * tile_h * w * 4
        if transpose:
            tmps = tile_h * w_total * 4  # tmp_t (transposed-store schedule)
            extra = tile_h * w * 4  # block-transpose temporaries
        else:
            tmps = tile_h * w_total * 4
            extra = 12 * tile_h * w * 4  # lane-rotation temporaries
        budget = (30 if transpose else 15) * 1024 * 1024 + 512 * 1024
        return strips + tmps + out + extra < budget

    # The divisor preference only pays when the raw in-kernel-padding
    # geometry can actually engage (w lane-tiled); otherwise smaller
    # tiles just add strips for nothing.
    if transpose and h is not None and w % 128 == 0:
        for tile_h in range(128, 40, -8):
            if h % tile_h == 0 and fits(tile_h):
                return tile_h
    for tile_h in (128, 64, 32):
        if fits(tile_h):
            return tile_h
    return None


def _stencil_kernel(
    x_hbm, o_ref, scratch, sems, *, fn, tile_h: int, out_w: int,
    n_tiles: int, strip_rows: int, raw: bool = False, rh_max: int = 0,
    in_h: int = 0, in_w: int = 0, pad_edge_mode: bool = True,
    w_base: int | None = None, roff: int = 0, coff: int = 0,
):
    """Generic per-channel stencil: DMA one (strip_rows, w_total) strip into
    VMEM (double buffered) and evaluate ``fn`` over lazily sliced neighbor
    views.  ``fn(tap)`` receives ``tap(dy, dx) -> (tile_h, out_w)`` (dy/dx
    are 0-based offsets into the halo'd strip) and returns the output tile —
    any jnp-expressible per-pixel function of the neighborhood (weighted
    sums, sorting networks, morphology) runs with ONE HBM read + write."""
    ci = pl.program_id(0)
    i = pl.program_id(1)

    dma_do = _strip_dma_fn(
        ci, x_hbm, scratch, sems, raw=raw, tile_h=tile_h,
        strip_rows=strip_rows, rh_max=rh_max, n_tiles=n_tiles,
        in_h=in_h, in_w=in_w, w_base=w_base if raw else 0,
    )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        dma_do(i, slot, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        dma_do(i + 1, other, "start")

    dma_do(i, slot, "wait")

    if raw:
        _strip_fill_halos(
            i, slot, scratch, tile_h=tile_h, strip_rows=strip_rows,
            rh_max=rh_max, n_tiles=n_tiles, in_w=in_w, w_base=w_base,
            edge=pad_edge_mode,
        )

    def tap(dy: int, dx: int):
        return scratch[slot, roff + dy : roff + dy + tile_h,
                       coff + dx : coff + dx + out_w]

    o_ref[0, :, :] = fn(tap)


def stencil_tile_h(w: int, rh: int, rw: int, temps: int = 4,
                   itemsize: int = 4) -> int | None:
    """VMEM model for stencil_apply: double-buffered strips + output blocks
    + ``temps`` live (tile_h, w) temporaries inside fn + one rotation
    temporary per off-center lane column (Mosaic materializes a rotated
    copy for each distinct dx != rw slice offset)."""
    w_total = _round_up(w + 2 * rw, 128)
    lane_temps = 2 * rw  # distinct non-center lane offsets
    for tile_h in (128, 64, 32):
        strip_rows = _round_up(tile_h + 2 * rh, 8)
        use = (
            2 * strip_rows * w_total * itemsize
            + 2 * tile_h * w * itemsize
            + (temps + lane_temps) * tile_h * w * itemsize
        )
        if use < 13 * 1024 * 1024:
            return tile_h
    return None


def stencil_apply(
    x: jnp.ndarray,
    rh: int,
    rw: int,
    fn,
    mode: str = "edge",
    tile_h: int | None = None,
    temps: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply a per-pixel neighborhood function as one fused Pallas pass.

    ``fn(tap)`` sees ``tap(dy, dx)`` neighbor views (0-based into the
    halo'd strip; the center is ``tap(rh, rw)``) of ONE channel and returns
    the channel's output tile.  Falls back to the caller's jnp path when
    the working set exceeds VMEM (returns None)."""
    c, h, w = x.shape
    auto_tile = tile_h is None
    if auto_tile:
        tile_h = stencil_tile_h(w, rh, rw, temps, x.dtype.itemsize)
    if tile_h is None:
        return None
    if (
        auto_tile
        and h % tile_h != 0
        and w % 128 == 0
        and x.dtype.itemsize == 4
    ):
        # Prefer a height-divisor tile so the raw DMA path can engage —
        # but only when its other gates can hold (lane-tiled width, f32),
        # and never override an explicitly requested tile.
        for th in range(tile_h, 8, -8):
            if h % th == 0:
                tile_h = th
                break
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    sub = 16 if x.dtype.itemsize == 2 else 8
    # In-kernel padding (see _strip_dma_fn); f32 only (bf16's (16, 128)
    # tiling needs 16-row DMA alignment the shared helper doesn't model).
    raw = False
    rh_eff = rh
    w_base = None
    if x.dtype.itemsize == 4:
        raw, RH8 = _raw_strip_geometry(h, w, tile_h, rh)
        if raw:
            rh_eff = RH8
            h_pad = h
            w_base = 128
    strip_rows = _round_up(tile_h + 2 * rh_eff, sub)
    row_slack = strip_rows - (tile_h + 2 * rh_eff)
    if raw:
        xp = x
        w_total = _round_up(w_base + w + rw, 128)
    else:
        w_total = _round_up(w + 2 * rw, 128)
        xp = jnp.pad(
            x,
            ((0, 0), (rh, rh + (h_pad - h) + row_slack), (rw, w_total - w - rw)),
            mode=pad_mode,
        )
    n_tiles = h_pad // tile_h
    out = pl.pallas_call(
        functools.partial(
            _stencil_kernel,
            fn=fn,
            tile_h=tile_h,
            out_w=w,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            raw=raw,
            rh_max=rh_eff,
            in_h=h,
            in_w=w,
            pad_edge_mode=(pad_mode == "edge"),
            w_base=w_base,
            roff=rh_eff - rh,
            coff=(w_base - rw) if raw else 0,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h_pad, w), x.dtype),
        grid=(c, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, strip_rows, w_total), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp)
    return out[:, :h, :]


def _stencil_kernel_mc(
    x_hbm, o_ref, scratch, sems, *, fn, tile_h: int, out_w: int,
    n_tiles: int, strip_rows: int,
):
    """Multi-channel stencil: the strip carries ALL channels so ``fn`` can
    combine them (e.g. bilateral range weights from a luma channel applied
    to rgb).  ``tap(dy, dx) -> (C_in, tile_h, out_w)``; fn returns
    (C_out, tile_h, out_w)."""
    i = pl.program_id(0)

    def strip_dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(step * tile_h, strip_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        strip_dma(i, slot).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        strip_dma(i + 1, other).start()

    strip_dma(i, slot).wait()

    def tap(dy: int, dx: int):
        return scratch[slot, :, dy : dy + tile_h, dx : dx + out_w]

    o_ref[:, :, :] = fn(tap)


def stencil_mc_tile_h(w: int, rh: int, rw: int, c_in: int, c_out: int,
                      temps: int = 8, itemsize: int = 4) -> int | None:
    """VMEM model for the multi-channel stencil: all channels ride in each
    strip, and lane-rotation temporaries are charged per channel."""
    w_total = _round_up(w + 2 * rw, 128)
    lane_temps = 2 * rw * c_in
    for tile_h in (64, 32, 16, 8):
        strip_rows = _round_up(tile_h + 2 * rh, 8)
        use = (
            2 * c_in * strip_rows * w_total * itemsize
            + 2 * c_out * tile_h * w * itemsize
            + (temps + lane_temps) * tile_h * w * itemsize
        )
        if use < 13 * 1024 * 1024:
            return tile_h
    return None


def stencil_apply_mc(
    x: jnp.ndarray,
    rh: int,
    rw: int,
    fn,
    out_channels: int,
    mode: str = "edge",
    tile_h: int | None = None,
    temps: int = 8,
    interpret: bool = False,
) -> jnp.ndarray | None:
    """Cross-channel variant of stencil_apply (see _stencil_kernel_mc).

    Returns None when the working set exceeds VMEM; callers keep their jnp
    formulation as the fallback."""
    c, h, w = x.shape
    if tile_h is None:
        tile_h = stencil_mc_tile_h(w, rh, rw, c, out_channels, temps,
                                   x.dtype.itemsize)
    if tile_h is None:
        return None
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    sub = 16 if x.dtype.itemsize == 2 else 8
    strip_rows = _round_up(tile_h + 2 * rh, sub)
    row_slack = strip_rows - (tile_h + 2 * rh)
    w_total = _round_up(w + 2 * rw, 128)
    xp = jnp.pad(
        x,
        ((0, 0), (rh, rh + (h_pad - h) + row_slack), (rw, w_total - w - rw)),
        mode=pad_mode,
    )
    n_tiles = h_pad // tile_h
    out = pl.pallas_call(
        functools.partial(
            _stencil_kernel_mc,
            fn=fn,
            tile_h=tile_h,
            out_w=w,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((out_channels, h_pad, w), x.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((out_channels, tile_h, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, strip_rows, w_total), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp)
    return out[:, :h, :]


def _stencil_reduce_kernel_mc(
    x_hbm, o_ref, scratch, acc, sems, *, taps_list, tap_fn, final_fn,
    tile_h: int, tile_w: int, n_tiles: int, strip_rows: int,
    rh: int, rw: int,
):
    """Reduction-form multi-channel stencil over (row, lane) tiles.

    Per-tap contributions add statement-wise into a VMEM accumulator so
    each tap's temporaries die before the next is built; tiling BOTH axes
    keeps every temporary at (C, tile_h, tile_w) — at full 4K width the
    Mosaic stack-allocates EVERY distinct lane-offset window copy up
    front (no slot reuse across taps: 49 windows x 4 channels was 23-33 MB
    at wider tiles), so tiles are sized to fit all windows at once.  The
    strip
    carries a full 128-lane halo on each side so the DMA window stays
    lane-tile aligned for any radius <= 128."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = i * nj + j

    def strip_dma(s_idx, slot):
        si = s_idx // nj
        sj = s_idx % nj
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(si * tile_h, strip_rows),
                     pl.ds(sj * tile_w, tile_w + 256)],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(step, 2)
    other = 1 - slot

    @pl.when(step == 0)
    def _():
        strip_dma(step, slot).start()

    @pl.when(step + 1 < n_tiles)
    def _():
        strip_dma(step + 1, other).start()

    strip_dma(step, slot).wait()

    base = 128 - rw

    def tap(dy: int, dx: int):
        return scratch[slot, :, dy : dy + tile_h,
                       base + dx : base + dx + tile_w]

    center = tap(rh, rw)  # sliced once; every tap's weight reads it
    for k, (dy, dx) in enumerate(taps_list):
        if k == 0:
            acc[:, :, :] = tap_fn(tap, center, dy, dx)
        else:
            acc[:, :, :] += tap_fn(tap, center, dy, dx)
    o_ref[:, :, :] = final_fn(acc[:, :, :])


def stencil_reduce_mc(
    x: jnp.ndarray,
    rh: int,
    rw: int,
    taps_list: list,
    tap_fn,
    final_fn,
    out_channels: int,
    acc_channels: int,
    mode: str = "edge",
    tile_h: int | None = None,
    tile_w: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray | None:
    """Windowed reduction over all channels in one fused pass.

    ``tap_fn(tap, center, dy, dx)`` returns this tap's
    (acc_channels, th, tw) contribution (``center`` is the pre-sliced
    ``tap(rh, rw)``); contributions sum statement-wise in VMEM;
    ``final_fn(acc)`` maps the accumulator to the (out_channels, th, tw)
    output.  Requires rw <= 128 (one lane tile of halo each side);
    returns None otherwise."""
    c, h, w = x.shape
    if rw > 128:
        return None
    if tile_h is None or tile_w is None:
        # Mosaic stack-allocates one window copy per tap per channel, so
        # the tile must shrink as the window grows: pick the largest tile
        # whose tap windows + strips + accumulator fit the scoped budget.
        itemsize = x.dtype.itemsize
        chosen = None
        for th, tw in ((32, 256), (16, 256), (8, 256), (8, 128)):
            if rh > th:
                continue
            strip_rows = _round_up(th + 2 * rh, 8)
            use = (
                len(taps_list) * c * th * tw * itemsize   # tap windows
                + 2 * c * strip_rows * (tw + 256) * itemsize
                + (acc_channels + 2 * out_channels + 6) * th * tw * itemsize
            )
            if use < 13 * 1024 * 1024:
                chosen = (th, tw)
                break
        if chosen is None:
            return None
        tile_h, tile_w = chosen
    if rh > tile_h:
        return None
    pad_mode = "edge" if mode == "edge" else "constant"
    h_pad = _round_up(h, tile_h)
    w_pad = _round_up(w, tile_w)
    sub = 16 if x.dtype.itemsize == 2 else 8
    strip_rows = _round_up(tile_h + 2 * rh, sub)
    row_slack = strip_rows - (tile_h + 2 * rh)
    # One full lane tile of halo each side keeps every DMA window aligned.
    xp = jnp.pad(
        x,
        ((0, 0), (rh, rh + (h_pad - h) + row_slack),
         (128, 128 + (w_pad - w))),
        mode=pad_mode,
    )
    ni = h_pad // tile_h
    nj = w_pad // tile_w
    out = pl.pallas_call(
        functools.partial(
            _stencil_reduce_kernel_mc,
            taps_list=list(taps_list),
            tap_fn=tap_fn,
            final_fn=final_fn,
            tile_h=tile_h,
            tile_w=tile_w,
            n_tiles=ni * nj,
            strip_rows=strip_rows,
            rh=rh,
            rw=rw,
        ),
        out_shape=jax.ShapeDtypeStruct((out_channels, h_pad, w_pad), x.dtype),
        grid=(ni, nj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (out_channels, tile_h, tile_w), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, strip_rows, tile_w + 256), x.dtype),
            pltpu.VMEM((acc_channels, tile_h, tile_w), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp)
    return out[:, :h, :w]


# ---- multi-stage cross-channel strip megakernel ---------------------------
#
# graph_strip_fused (above) runs a graph whose convs all read the kernel
# input and whose pointwise nodes are channel-local, on a per-channel grid.
# The mc (multi-channel) variant below removes both restrictions: stages
# execute in topological order on channel-FULL strips, each stage writing a
# VMEM buffer at its own extent halo, so conv-of-intermediate chains
# (blur -> sobel, threshold -> blur bloom graphs, blur -> blur) and
# channel-mixing pointwise nodes (luma thresholds, saturation) all fuse
# into ONE streaming pass: one HBM frame read + one write, intermediates
# never leave VMEM.  The reference's hot loop dispatches one shader per
# node with barriers between layers (src/vulkan/command.rs:166-242); this
# is the TPU answer for arbitrary (static-halo) DAGs.
#
# Geometry (all 8-aligned): a stage whose downstream consumers need its
# value over +/-eh rows and +/-ew cols computes the block
#   rows [RH - eh, RH + tile_h + eh) x cols [w_base - ew, w_base + w + ew)
# of the shared strip frame (strip row k <-> global row i*tile_h - RH + k,
# strip col w_base + j <-> global col j).  Out-of-image rows/cols are then
# overwritten with edge replicas, reproducing EXACTLY what per-node
# execution's jnp.pad(mode="edge") of each intermediate would produce —
# computing "through" the halos instead would change boundary values.


@dataclasses.dataclass
class McStage:
    """One node of the multi-stage strip plan (built by graph/program.py).

    Closure signatures (all return the stage's storage-quantized block):
      * point:   fn(row0, t, blocks: list) -> (4, rows, cols)
      * stencil: fn(row0, t, tap, rows, cols) -> (4, rows, cols), where
                 tap(dy, dx) is a (4, rows, cols) neighbor view,
                 dy/dx in [0, 2r]
      * conv:    epilogue(row0, t, x_block, blur_block) -> (4, rows, cols);
                 None means the blur IS the output (quantized via store1)
    """

    kind: str                      # "conv" | "stencil" | "point"
    out_buf: int                   # pool index; -1 = the kernel output block
    eh: int                        # output row extent halo (multiple of 8)
    ew: int                        # output col extent halo (multiple of 8)
    in_bufs: tuple = ()            # pool indices (-2 = the input strip)
    fn: Any = None                 # point/stencil closure
    # conv fields
    wh: tuple = ()                 # lead-padded H taps (see planner)
    ww: tuple = ()
    rh8: int = 0                   # round_up(rh, 8)
    rw8: int = 0
    epilogue: Any = None
    x_buf: int = -3                # epilogue's x source (-3 = unused)
    blur_buf: int = -3             # scratch pool slot when epilogue != None
    # Cross-strip sliding-window carry: when True the planner gave this
    # conv's result buffer (out_buf, or blur_buf under an epilogue) a
    # DEDICATED pool slot, so its 2*eh overlap rows persist from strip
    # i-1 and each strip computes only tile_h fresh rows instead of
    # tile_h + 2*eh (per-node execution never recomputes halo rows —
    # this is the mc analog).  Requires tile_h >= 2*eh at runtime.
    carry: bool = False
    # Run both separable passes as MXU band matmuls (the mc analog of
    # graph_strip_fused's x3 stages).  mxu_terms selects the precision
    # form: 1 = single-product dots on the raw bf16 strip / bf16-cast
    # pool block (bf16 storage — operand rounding below storage
    # precision); 3 = the six bf16x3 cross-products per pass (f32
    # storage, f32-exact to ~1 ulp — the in-kernel form of
    # sep_conv_fused_mxu_x3).  The planner sets this for heavy convs;
    # the wrapper builds the (stacked, term-split) band-matrix
    # constants.  Implies carry == False (the MXU recompute of halo
    # rows is cheaper than the carry copy).
    mxu: bool = False
    mxu_terms: int = 1
    # stencil fields
    r: int = 0


def _mc_strip_dma_fn(x_hbm, scratch, sems, *, tile_h, strip_rows, rh, n_tiles,
                     in_h, in_w, w_base):
    """Channel-full raw strip DMA (in-kernel padding): the clamped window
    is copied straight from the unpadded (4, H, W) frame; halos are
    synthesized by _mc_strip_fill_halos.  Same contract as _strip_dma_fn
    (tile_h/rh/strip_rows multiples of 8, in_w multiple of 128, w_base
    128-aligned), with the channel dim riding along in one copy."""
    first_rows = strip_rows - rh
    last_rows = tile_h + rh

    def dma_do(step, slot, what):
        @pl.when(step == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, first_rows), :],
                scratch.at[slot, :, pl.ds(rh, first_rows), pl.ds(w_base, in_w)],
                sems.at[slot],
            )
            cp.start() if what == "start" else cp.wait()

        if n_tiles > 2:  # with 2 strips the mid branch is dead code, and
            # its full-strip slice can exceed the frame height
            @pl.when(jnp.logical_and(step > 0, step < n_tiles - 1))
            def _():
                start = pl.multiple_of(step * tile_h - rh, 8)
                cp = pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(start, strip_rows), :],
                    scratch.at[slot, :, pl.ds(0, strip_rows),
                               pl.ds(w_base, in_w)],
                    sems.at[slot],
                )
                cp.start() if what == "start" else cp.wait()

        @pl.when(step == n_tiles - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(in_h - last_rows, last_rows), :],
                scratch.at[slot, :, pl.ds(0, last_rows), pl.ds(w_base, in_w)],
                sems.at[slot],
            )
            cp.start() if what == "start" else cp.wait()

    return dma_do


def _mc_strip_fill_halos(i, slot, scratch, *, tile_h, strip_rows, rh,
                         n_tiles, in_w, w_base, edge):
    """Channel-full halo synthesis: H halos from the DMA'd rows, then W
    halos over ALL rows, so corners compose as edge(edge) — jnp.pad
    semantics (see _strip_fill_halos)."""
    sr, wt = strip_rows, scratch.shape[3]

    if rh > 0:
        @pl.when(i == 0)
        def _():
            if edge:
                scratch[slot, :, 0:rh, :] = jnp.broadcast_to(
                    scratch[slot, :, rh : rh + 1, :], (4, rh, wt)
                )
            else:
                scratch[slot, :, 0:rh, :] = jnp.zeros(
                    (4, rh, wt), scratch.dtype
                )

        @pl.when(i == n_tiles - 1)
        def _():
            lo = tile_h + rh
            if edge:
                scratch[slot, :, lo:sr, :] = jnp.broadcast_to(
                    scratch[slot, :, lo - 1 : lo, :], (4, sr - lo, wt)
                )
            else:
                scratch[slot, :, lo:sr, :] = jnp.zeros(
                    (4, sr - lo, wt), scratch.dtype
                )

    if w_base > 0:
        if edge:
            scratch[slot, :, :, 0:w_base] = jnp.broadcast_to(
                scratch[slot, :, :, w_base : w_base + 1], (4, sr, w_base)
            )
        else:
            scratch[slot, :, :, 0:w_base] = jnp.zeros(
                (4, sr, w_base), scratch.dtype
            )
    right = wt - w_base - in_w
    if right > 0:
        if edge:
            scratch[slot, :, :, w_base + in_w :] = jnp.broadcast_to(
                scratch[slot, :, :, w_base + in_w - 1 : w_base + in_w],
                (4, sr, right),
            )
        else:
            scratch[slot, :, :, w_base + in_w :] = jnp.zeros(
                (4, sr, right), scratch.dtype
            )


def _graph_strip_kernel_mc(
    x_hbm, t_ref, r0_ref, *rest,
    stages: tuple, tile_h: int, out_w: int, n_tiles: int, strip_rows: int,
    rh_in: int, w_base: int, in_h: int, in_w: int, store1,
    pad_edge_mode: bool = True, store1_id: bool = False,
    direct_store: bool = True, carry_enabled: bool = True,
    n_mxu: int = 0, mxu_t_max: int = 1, mxu_w2: bool = False,
    has_xf32: bool = False,
):
    """Execute the staged plan on one channel-full strip (see module note
    above).  ``bufs`` is the (n_bufs, 4, strip_rows, w_total) intermediate
    pool; ``store1`` quantizes a block to inter-node storage semantics.

    When ``n_mxu`` > 0 (MXU-eligible conv stages) the positional refs
    gain the stacked band-matrix constants ``a_ref`` / ``c_ref`` (terms
    axis after the stage axis) after r0_ref, a bf16 H-result staging
    buffer ``ts_bf`` at the tail of the scratch list, and — when any
    stage is f32-exact (``mxu_t_max`` == 3) — an ``xs3`` buffer for the
    bf16x3 split of the source block."""
    rest = list(rest)
    a_ref = c_ref = None
    if n_mxu:
        a_ref, c_ref = rest.pop(0), rest.pop(0)
    o_ref, scratch, bufs, tmp, tmp_t, sems = rest[:6]
    rest = rest[6:]
    maybe_xf32 = (rest.pop(0),) if has_xf32 else ()
    ts_bf = rest.pop(0) if n_mxu else None
    xs3 = rest.pop(0) if n_mxu and mxu_t_max == 3 else None
    i = pl.program_id(0)

    dma_do = _mc_strip_dma_fn(
        x_hbm, scratch, sems, tile_h=tile_h, strip_rows=strip_rows,
        rh=rh_in, n_tiles=n_tiles, in_h=in_h, in_w=in_w, w_base=w_base,
    )

    slot = jax.lax.rem(i, 2)
    other = 1 - slot

    @pl.when(i == 0)
    def _():
        dma_do(i, slot, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        dma_do(i + 1, other, "start")

    dma_do(i, slot, "wait")

    _mc_strip_fill_halos(
        i, slot, scratch, tile_h=tile_h, strip_rows=strip_rows, rh=rh_in,
        n_tiles=n_tiles, in_w=in_w, w_base=w_base, edge=pad_edge_mode,
    )

    # Storage may be bf16 (rgba16f): upcast the strip ONCE into f32
    # staging (per-slice converts and bf16 packed-sublane shuffles cost
    # far more; measured — see graph_strip_fused).
    if maybe_xf32:
        xf32 = maybe_xf32[0]
        xf32[:, :, :] = scratch[slot].astype(jnp.float32)
        strip = xf32
        strip_ix = lambda c, rs, cs: xf32[c, rs, cs]
    else:
        strip = None
        strip_ix = lambda c, rs, cs: scratch[slot, c, rs, cs]

    def src_ref(buf_idx):
        """(channel, row-slice, col-slice) reader for a stage input."""
        if buf_idx == -2:
            return strip_ix
        return lambda c, rs, cs, _b=buf_idx: bufs[_b, c, rs, cs]

    def block_of(buf_idx, eh, ew):
        """The (4, rows, cols) VALUE of a buffer at extent (eh, ew)."""
        rs = slice(rh_in - eh, rh_in + tile_h + eh)
        cs = slice(w_base - ew, w_base + out_w + ew)
        if buf_idx == -2:
            if maybe_xf32:
                return xf32[:, rs, cs]
            return scratch[slot, :, rs, cs]
        return bufs[buf_idx, :, rs, cs]

    def fill_block_edges(b, eh, ew):
        """Overwrite a pool block's out-of-image rows/cols with edge
        replicas (per-node jnp.pad parity; rows first over the valid
        cols, then cols over all rows so corners = edge(edge))."""
        rows = tile_h + 2 * eh
        r0, c0 = rh_in - eh, w_base - ew
        if eh > 0:
            @pl.when(i == 0)
            def _():
                bufs[b, :, r0:rh_in, w_base : w_base + out_w] = (
                    jnp.broadcast_to(
                        bufs[b, :, rh_in : rh_in + 1, w_base : w_base + out_w],
                        (4, eh, out_w),
                    )
                )

            @pl.when(i == n_tiles - 1)
            def _():
                lo = rh_in + tile_h
                bufs[b, :, lo : lo + eh, w_base : w_base + out_w] = (
                    jnp.broadcast_to(
                        bufs[b, :, lo - 1 : lo, w_base : w_base + out_w],
                        (4, eh, out_w),
                    )
                )
        if ew > 0:
            bufs[b, :, r0 : r0 + rows, c0:w_base] = jnp.broadcast_to(
                bufs[b, :, r0 : r0 + rows, w_base : w_base + 1],
                (4, rows, ew),
            )
            hi = w_base + out_w
            bufs[b, :, r0 : r0 + rows, hi : hi + ew] = jnp.broadcast_to(
                bufs[b, :, r0 : r0 + rows, hi - 1 : hi], (4, rows, ew)
            )

    def store_block(stage, value):
        """Write a stage's block to its target, then edge-fill."""
        eh, ew = stage.eh, stage.ew
        rows = tile_h + 2 * eh
        cols = out_w + 2 * ew
        if stage.out_buf == -1:
            o_ref[:, :, :] = value.astype(o_ref.dtype)
            return
        b = stage.out_buf
        r0, c0 = rh_in - eh, w_base - ew
        bufs[b, :, r0 : r0 + rows, c0 : c0 + cols] = value
        fill_block_edges(b, eh, ew)

    t_s = t_ref[0, 0]
    row0_strip = r0_ref[0, 0] + i * tile_h  # global row of output row 0

    _mxu_i = 0  # index into the stacked a_ref/c_ref band constants
    for stage in stages:
        row0 = row0_strip - stage.eh  # global row of the block's first row
        if stage.kind == "point":
            blocks = [block_of(b, stage.eh, stage.ew) for b in stage.in_bufs]
            store_block(stage, stage.fn(row0, t_s, blocks))
        elif stage.kind == "stencil":
            src = stage.in_bufs[0]
            rows = tile_h + 2 * stage.eh
            cols = out_w + 2 * stage.ew
            base_r = rh_in - stage.eh - stage.r
            base_c = w_base - stage.ew - stage.r
            span_c = cols + 2 * stage.r

            # Factored tap loads: a naive tap(dy, dx) re-loads the full
            # (4, rows, cols) window per tap — (2r+1)^2 block loads, each
            # paying sublane AND lane misalignment.  Instead each dy row
            # plane is loaded ONCE (full tap width), and the dx taps are
            # lane slices of that value: (2r+1) loads + cheap value
            # slices.  Values are identical (same elements, same math).
            plane_cache: dict = {}

            def tap(dy, dx, _src=src, _rows=rows, _cols=cols,
                    _br=base_r, _bc=base_c, _span=span_c,
                    _cache=plane_cache):
                plane = _cache.get(dy)
                if plane is None:
                    rd = src_ref(_src)
                    plane = jnp.stack(
                        [
                            rd(c, slice(_br + dy, _br + dy + _rows),
                               slice(_bc, _bc + _span))
                            for c in range(4)
                        ]
                    )
                    _cache[dy] = plane
                return plane[:, :, dx : dx + _cols]

            store_block(stage, stage.fn(row0, t_s, tap, rows, cols))
        else:  # conv
            src = src_ref(stage.in_bufs[0])
            eh, ew = stage.eh, stage.ew
            out_rows = tile_h + 2 * eh
            out_cols = out_w + 2 * ew
            off_h = rh_in - eh - stage.rh8
            woff = w_base - ew - stage.rw8
            # The W pass's transposed block stores go STRAIGHT into the
            # destination (pool block or the output block) — the
            # standalone kernel's schedule.  The tmp round trip (W stores
            # tmp, re-reads it, copies out via store_block) costs one
            # extra full write+read of every conv block per strip.
            # Inter-node quantization (store1) is elementwise, so it
            # applies per accumulator block before the store; an
            # epilogue's blur block stays raw f32 (node-internal).
            # REFORGE_MC_DIRECT_STORE=0 reverts to the tmp schedule.
            is_blur = stage.epilogue is not None
            tgt_buf = stage.blur_buf if is_blur else stage.out_buf
            raw = is_blur or store1_id  # no store1 on the result blocks

            def w_store_direct(c, r_dst, _tgt=tgt_buf, _raw=raw):
                c0 = w_base - ew
                if _tgt == -1:  # the kernel output block (eh == ew == 0)
                    def st(ki, r, n, cc, L, acc, _c=c, _r0=r_dst - rh_in):
                        v = acc if _raw else store1(acc)
                        o_ref[_c, _r0 + cc : _r0 + cc + L, r : r + n] = (
                            v.astype(o_ref.dtype).T
                        )
                else:
                    def st(ki, r, n, cc, L, acc, _c=c, _r0=r_dst):
                        v = acc if _raw else store1(acc)
                        bufs[_tgt, _c, _r0 + cc : _r0 + cc + L,
                             c0 + r : c0 + r + n] = v.T
                return st

            def conv_rows(n_rows, r_src, r_dst):
                """Both separable passes for ``n_rows`` block rows whose
                first row sits at strip-frame row ``r_dst`` (H-pass
                source rows start at ``r_src``); results go straight to
                ``tgt_buf`` (or via tmp when direct stores are off)."""
                for c in range(4):
                    # H pass stores accumulator blocks TRANSPOSED
                    # straight into the (w_total, rows) buffer the W
                    # pass reads; the W pass stores transposed back into
                    # natural orientation.  Block-granular transposes
                    # inside the tap stores skip both bulk `.T`
                    # roundtrips.
                    _blocked_taps(
                        lambda r, blk, cc, L, _c=c: src(
                            _c, slice(r_src + r, r_src + r + blk),
                            slice(cc, cc + L)
                        ),
                        lambda ki, r, n, cc, L, acc: tmp_t.__setitem__(
                            (slice(cc, cc + L), slice(r, r + n)), acc.T
                        ),
                        n_rows,
                        tmp.shape[1],
                        [stage.wh],
                    )
                    if direct_store:
                        _blocked_taps(
                            lambda r, blk, cc, L: tmp_t[
                                woff + r : woff + r + blk, cc : cc + L
                            ],
                            w_store_direct(c, r_dst),
                            out_cols,
                            n_rows,
                            [stage.ww],
                        )
                        continue
                    _blocked_taps(
                        lambda r, blk, cc, L: tmp_t[
                            woff + r : woff + r + blk, cc : cc + L
                        ],
                        lambda ki, r, n, cc, L, acc: tmp.__setitem__(
                            (slice(cc, cc + L), slice(r, r + n)), acc.T
                        ),
                        out_cols,
                        n_rows,
                        [stage.ww],
                    )
                    blk_v = tmp[0:n_rows, 0:out_cols]
                    v = blk_v if raw else store1(blk_v)
                    if tgt_buf == -1:
                        o_ref[c, r_dst - rh_in : r_dst - rh_in + n_rows,
                              :] = v.astype(o_ref.dtype)
                    else:
                        bufs[tgt_buf, c, r_dst : r_dst + n_rows,
                             w_base - ew : w_base - ew + out_cols] = v

            if stage.mxu:
                # MXU band conv: the H pass is (out_rows, span) @ (span,
                # w_total) dots per channel, the W pass 3-tile banded
                # dots — the mc analog of the single-tier kernel's x3
                # stages (graph_strip_fused).  mxu_terms == 1 (bf16
                # storage): ONE product per pass on the raw bf16 strip /
                # bf16-cast pool block, matching the per-node prefer_mxu
                # semantics (operand rounding below bf16 storage
                # precision).  mxu_terms == 3 (f32 storage): the six
                # significant bf16x3 cross-products per pass — f32-exact
                # to ~1 ulp, the in-kernel form of sep_conv_fused_mxu_x3
                # — so heavy convs fuse instead of dropping the graph to
                # per-node HBM round trips.  Replaces ~2 VPU issue slots
                # per tap with sigma-independent MXU work.
                m = _mxu_i
                _mxu_i += 1
                terms = stage.mxu_terms
                pairs = _X3_PAIRS if terms == 3 else ((0, 0),)
                span = out_rows + 2 * stage.rh8
                shift = w_base - ew
                adv = (shift - stage.rw8) // 128
                n_wt = -(-out_cols // 128)
                src_b = stage.in_bufs[0]
                c0 = w_base - ew
                # Taps only read block cols [c0 - rw8, c0 + out_cols +
                # rw8); ts cols outside are zeroed so the band's
                # zero-weight entries never multiply uninitialized VMEM
                # (0 * NaN would poison the dot).
                s_lo = c0 - stage.rw8
                s_hi = c0 + out_cols + stage.rw8
                wt_full = ts_bf.shape[2]
                # 2-tile W band: the H-result stores lane-rotate left by
                # sm = (shift - rw8) mod 128 so tile j's tap window sits
                # exactly at ts cols [128(j+adv), +128+2rw8) — see
                # _band_matrices_w2_shiftstore.  The zero margins shift
                # with the data (they also cover the unwritten tail).
                sm = (shift - stage.rw8 - 128 * adv) if mxu_w2 else 0
                w_win = 256 if mxu_w2 else 384
                As = [a_ref[m, a, 0:out_rows, 0:span] for a in range(terms)]
                for ch in range(4):
                    if terms == 3:
                        # f32 source block: split into three bf16 terms
                        # (each residual subtraction exact in f32).
                        if src_b == -2:
                            sv = scratch[slot, ch, off_h : off_h + span, :]
                        else:
                            sv = bufs[src_b, ch, off_h : off_h + span, :]
                        if sv.dtype != jnp.float32:
                            sv = sv.astype(jnp.float32)
                        b0 = sv.astype(jnp.bfloat16)
                        xs3[0, 0:span, :] = b0
                        sv = sv - b0.astype(jnp.float32)
                        b1 = sv.astype(jnp.bfloat16)
                        xs3[1, 0:span, :] = b1
                        xs3[2, 0:span, :] = (
                            sv - b1.astype(jnp.float32)
                        ).astype(jnp.bfloat16)
                        xsrc = lambda b: xs3[b, 0:span, :]
                    elif src_b == -2:
                        xsrc = lambda b: scratch[
                            slot, ch, off_h : off_h + span, :
                        ]
                    else:
                        xsrc = lambda b: bufs[
                            src_b, ch, off_h : off_h + span, :
                        ].astype(jnp.bfloat16)
                    tmp[0:out_rows, :] = jnp.dot(
                        As[0], xsrc(0), preferred_element_type=jnp.float32
                    )
                    for a, b in pairs[1:]:
                        tmp[0:out_rows, :] += jnp.dot(
                            As[a], xsrc(b),
                            preferred_element_type=jnp.float32,
                        )
                    def _store(term, blk):
                        ts_bf[term, 0:out_rows, 0 : wt_full - sm] = (
                            blk[:, sm:] if sm else blk
                        )

                    tv = tmp[0:out_rows, :]
                    b0 = tv.astype(jnp.bfloat16)
                    _store(0, b0)
                    if terms == 3:
                        tv = tv - b0.astype(jnp.float32)
                        b1 = tv.astype(jnp.bfloat16)
                        _store(1, b1)
                        _store(
                            2,
                            (tv - b1.astype(jnp.float32)).astype(
                                jnp.bfloat16
                            ),
                        )
                    for tt in range(terms):
                        if s_lo - sm > 0:
                            ts_bf[tt, 0:out_rows, 0 : s_lo - sm] = jnp.zeros(
                                (out_rows, s_lo - sm), jnp.bfloat16
                            )
                        if s_hi - sm < wt_full:
                            ts_bf[tt, 0:out_rows, s_hi - sm :] = jnp.zeros(
                                (out_rows, wt_full - (s_hi - sm)),
                                jnp.bfloat16,
                            )
                    for j in range(n_wt):
                        org = 128 * (j + adv)
                        d = jnp.dot(
                            ts_bf[0, 0:out_rows, org : org + w_win],
                            c_ref[m, 0],
                            preferred_element_type=jnp.float32,
                        )
                        for a, b in pairs[1:]:
                            d += jnp.dot(
                                ts_bf[a, 0:out_rows, org : org + w_win],
                                c_ref[m, b],
                                preferred_element_type=jnp.float32,
                            )
                        L = min(128, out_cols - 128 * j)
                        v = d[:, 0:L] if L < 128 else d
                        v = v if raw else store1(v)
                        if tgt_buf == -1:
                            o_ref[ch, :, 128 * j : 128 * j + L] = v.astype(
                                o_ref.dtype
                            )
                        else:
                            bufs[
                                tgt_buf, ch,
                                rh_in - eh : rh_in - eh + out_rows,
                                c0 + 128 * j : c0 + 128 * j + L,
                            ] = v
            elif (carry_enabled and stage.carry and eh > 0
                    and 2 * eh <= tile_h and tgt_buf >= 0):
                # Sliding window: the 2*eh overlap rows computed by strip
                # i-1 (bottom of its block) become strip i's top halo —
                # only tile_h rows are computed fresh.  Carried rows are
                # bit-identical to a recompute (_blocked_taps' per-row
                # arithmetic does not depend on the block's row offset).
                @pl.when(i > 0)
                def _():
                    bufs[tgt_buf, :, rh_in - eh : rh_in + eh, :] = bufs[
                        tgt_buf, :,
                        rh_in + tile_h - eh : rh_in + tile_h + eh, :,
                    ]

                conv_rows(tile_h, off_h + 2 * eh, rh_in + eh)

                @pl.when(i == 0)
                def _():
                    # Bootstrap the first strip's top 2*eh rows (there is
                    # no previous strip to carry from).
                    conv_rows(2 * eh, off_h, rh_in - eh)
            else:
                conv_rows(out_rows, off_h, rh_in - eh)

            if is_blur:
                blur = bufs[stage.blur_buf, :,
                            rh_in - eh : rh_in - eh + out_rows,
                            w_base - ew : w_base - ew + out_cols]
                x_block = (
                    block_of(stage.x_buf, eh, ew)
                    if stage.x_buf != -3 else None
                )
                store_block(stage, stage.epilogue(row0, t_s, x_block, blur))
            elif tgt_buf >= 0:
                fill_block_edges(tgt_buf, eh, ew)


def mc_strip_geometry(h: int, w: int, rh_in: int, ew_in: int):
    """(w_base, w_total) for the mc kernel's strip frame."""
    w_base = max(128, _round_up(ew_in, 128))
    w_total = _round_up(w_base + w + ew_in, 128)
    return w_base, w_total


def mc_strip_tile_h(
    h: int, w: int, rh_in: int, ew_in: int, n_bufs: int,
    itemsize: int = 4, min_tile: int = 0, mxu_t_max: int = 0,
) -> int | None:
    """Pick tile_h for the mc megakernel, or None when the geometry or
    VMEM model says no.

    Gates (raw in-kernel-padding DMA only — there is no padded fallback
    for the mc path): h divisible by tile_h with >= 2 strips, w a lane
    multiple, tile_h >= rh_in so only the first/last strips touch the
    image boundary.  Budget: double-buffered channel-full strips + the
    f32 staging copy (bf16 storage) + the intermediate pool + conv
    temporaries + double-buffered output blocks, against 60 MB (the
    wrapper raises the Mosaic scoped limit to 100 MB; v5e has 128 MB
    physical VMEM)."""
    if w % 128 != 0 or rh_in % 8 != 0 or ew_in % 8 != 0:
        return None
    override = _os.environ.get("REFORGE_MC_TILE_H")
    if override:
        # On-chip tile sweeps (benchmarks/mc_profile.py): bypass the VMEM
        # model, keep the hard geometry gates.
        t = int(override)
        return t if h % t == 0 and t >= rh_in and h // t >= 2 else None
    w_base, w_total = mc_strip_geometry(h, w, rh_in, ew_in)

    def fits(tile_h: int) -> bool:
        strip_rows = tile_h + 2 * rh_in
        use = (
            2 * 4 * strip_rows * w_total * itemsize      # strips
            + (4 * strip_rows * w_total * 4 if itemsize == 2 else 0)
            + n_bufs * 4 * strip_rows * w_total * 4      # pool
            + 2 * strip_rows * w_total * 4               # tmp/tmp_t
            + 2 * 4 * tile_h * w * 4                     # out blocks
            # MXU conv stages: ts_bf terms (+ xs3 split when f32-exact)
            + (mxu_t_max * strip_rows * w_total * 2 if mxu_t_max else 0)
            + (3 * strip_rows * w_total * 2 if mxu_t_max == 3 else 0)
        )
        return use < 60 * 1024 * 1024

    # Among fitting tiles prefer the largest AT OR BELOW 128 rows:
    # measured 4K rgba32f (gaussian+tonemap mc, round 5), tile 120 runs
    # 1096 fps vs 144's 880 — beyond ~128 rows the strip DMAs stop
    # overlapping the compute cleanly, and "largest that fits" was
    # leaving 25% on the table for small-pool plans.  Larger tiles are
    # used only when no <=128 tile satisfies the constraints (e.g.
    # rh_in or min_tile above 128).
    best = None
    for tile_h in range(8, min(h // 2, 256) + 1, 8):
        if (h % tile_h or tile_h < rh_in or tile_h < min_tile
                or not fits(tile_h)):
            continue
        if best is None:
            best = tile_h
        elif tile_h <= 128:
            best = tile_h if best > 128 else max(best, tile_h)
        elif best > 128:
            best = max(best, tile_h)
    return best


def graph_strip_fused_mc(
    x: jnp.ndarray,
    t,
    stages: list,
    n_bufs: int,
    rh_in: int,
    ew_in: int,
    tile_h: int,
    mode: str = "edge",
    row0_base=None,
    store1=None,
    store1_id: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Execute a staged multi-channel graph plan as ONE fused kernel.

    ``stages`` is a topological list of McStage; ``n_bufs`` sizes the
    intermediate pool (planner-assigned indices); ``rh_in``/``ew_in`` are
    the input strip's extent halos (multiples of 8); ``store1`` quantizes
    a block to inter-node storage semantics (rgba8 UNORM grid / bf16
    round-trip; defaults from the dtype).  The caller (the graph
    program's planner) guarantees the geometry gates checked by
    mc_strip_tile_h."""
    interpret = interpret or _os.environ.get("REFORGE_PALLAS_INTERPRET") == "1"
    c, h, w = x.shape
    assert h % tile_h == 0 and h // tile_h >= 2 and tile_h >= rh_in
    assert w % 128 == 0 and rh_in % 8 == 0 and ew_in % 8 == 0
    w_base, w_total = mc_strip_geometry(h, w, rh_in, ew_in)
    strip_rows = tile_h + 2 * rh_in
    n_tiles = h // tile_h

    if store1 is None:
        if x.dtype == jnp.bfloat16:
            def store1(v):
                return v.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            store1 = lambda v: v
            store1_id = True
    # A/B knobs: force the tmp-roundtrip W-pass schedule / full halo
    # recompute per strip
    direct_store = _os.environ.get("REFORGE_MC_DIRECT_STORE") != "0"
    carry_enabled = _os.environ.get("REFORGE_MC_CARRY") != "0"

    t_arr = jnp.reshape(jnp.asarray(t, jnp.float32), (1, 1))
    r0_arr = jnp.reshape(
        jnp.asarray(0 if row0_base is None else row0_base, jnp.int32), (1, 1)
    )

    # MXU band constants for conv stages riding the MXU (McStage.mxu):
    # one (out_rows, span) H band and one (384, 128) 3-tile W band per
    # stage, stacked (zero-padded to the max geometry; the kernel slices
    # each stage's exact shape statically).  The W window of output tile
    # j is ts[:, 128*(j+adv) : +384], so w_total is widened when the
    # last tile's window would overrun.  A terms axis carries the bf16x3
    # Dekker split of each band for f32-exact stages (mxu_terms == 3);
    # single-product bf16-storage stages fill term 0 only.
    mxu_stages = [st for st in stages if st.kind == "conv" and st.mxu]
    n_mxu = len(mxu_stages)
    mxu_t_max = max((st.mxu_terms for st in mxu_stages), default=1)
    w_win = 384
    mxu_args = ()
    mxu_in_specs: list = []
    mxu_scratch: list = []
    if n_mxu:
        import ml_dtypes

        def _split3(arr: np.ndarray, n_terms: int) -> list:
            out = []
            rem = arr.astype(np.float32)
            for _ in range(n_terms):
                t = rem.astype(ml_dtypes.bfloat16)
                out.append(t)
                rem = rem - t.astype(np.float32)
            return out

        # 2-tile W band via shift-stored H results (one third less MXU
        # work; see _band_matrices_w2_shiftstore) — all-or-nothing per
        # kernel so the stacked band constants share one shape.
        w2 = (
            all(st.rw8 <= 64 for st in mxu_stages)
            and _os.environ.get("REFORGE_MXU_W2", "1") != "0"
        )
        w_win = 256 if w2 else 384
        for st in mxu_stages:
            out_cols = w + 2 * st.ew
            n_wt = -(-out_cols // 128)
            adv = (w_base - st.ew - st.rw8) // 128
            need = 128 * (n_wt - 1 + adv) + w_win
            if need > w_total:
                w_total = _round_up(need, 128)
        max_r = _round_up(max(tile_h + 2 * st.eh for st in mxu_stages), 16)
        max_s = _round_up(
            max(tile_h + 2 * st.eh + 2 * st.rh8 for st in mxu_stages), 16
        )
        a_np = np.zeros((n_mxu, mxu_t_max, max_r, max_s), ml_dtypes.bfloat16)
        c_np = np.zeros((n_mxu, mxu_t_max, w_win, 128), ml_dtypes.bfloat16)
        for m, st in enumerate(mxu_stages):
            orows = tile_h + 2 * st.eh
            span = orows + 2 * st.rh8
            ah = _band_matrix_h(np.asarray(st.wh, np.float32), orows, span)
            shift = w_base - st.ew
            adv = (shift - st.rw8) // 128
            if w2:
                cw = _band_matrices_w2_shiftstore(
                    np.asarray(st.ww, np.float32)
                )
            else:
                cw = np.concatenate(
                    list(
                        _band_matrices_w3_shift(
                            np.asarray(st.ww, np.float32), st.rw8,
                            shift=shift - 128 * adv,
                        )
                    ),
                    axis=0,
                )
            for tt, term in enumerate(_split3(ah, st.mxu_terms)):
                a_np[m, tt, :orows, :span] = term
            for tt, term in enumerate(_split3(cw, st.mxu_terms)):
                c_np[m, tt] = term
        mxu_args = (jnp.asarray(a_np), jnp.asarray(c_np))
        mxu_in_specs = [
            pl.BlockSpec((n_mxu, mxu_t_max, max_r, max_s),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mxu, mxu_t_max, w_win, 128),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        mxu_scratch = [
            pltpu.VMEM(
                (mxu_t_max, _round_up(strip_rows, 16), w_total),
                jnp.bfloat16,
            )
        ]
        if mxu_t_max == 3:
            # bf16x3 split of the f32 source block (per channel, reused
            # across x3 stages within a strip iteration).
            mxu_scratch.append(
                pltpu.VMEM(
                    (3, _round_up(strip_rows, 16), w_total), jnp.bfloat16
                )
            )

    has_xf32 = x.dtype != jnp.float32
    vmem_use = (
        2 * 4 * strip_rows * w_total * x.dtype.itemsize
        + (4 * strip_rows * w_total * 4 if x.dtype.itemsize == 2 else 0)
        + n_bufs * 4 * strip_rows * w_total * 4
        + 2 * strip_rows * w_total * 4
        + 2 * 4 * tile_h * w * 4
        + (mxu_t_max * strip_rows * w_total * 2 if n_mxu else 0)
        + (3 * strip_rows * w_total * 2 if mxu_t_max == 3 else 0)
        + sum(int(np.prod(a.shape)) * 2 for a in mxu_args)
    )
    out = pl.pallas_call(
        functools.partial(
            _graph_strip_kernel_mc,
            stages=tuple(stages),
            tile_h=tile_h,
            out_w=w,
            n_tiles=n_tiles,
            strip_rows=strip_rows,
            rh_in=rh_in,
            w_base=w_base,
            in_h=h,
            in_w=w,
            store1=store1,
            pad_edge_mode=(mode == "edge"),
            store1_id=store1_id,
            direct_store=direct_store,
            carry_enabled=carry_enabled,
            n_mxu=n_mxu,
            mxu_t_max=mxu_t_max,
            mxu_w2=(n_mxu > 0 and w_win == 256),
            has_xf32=has_xf32,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + mxu_in_specs,
        out_specs=pl.BlockSpec((c, tile_h, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, strip_rows, w_total), x.dtype),
            pltpu.VMEM((max(n_bufs, 1), 4, strip_rows, w_total), jnp.float32),
            pltpu.VMEM((strip_rows, w_total), jnp.float32),
            pltpu.VMEM((w_total, strip_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + (
            [pltpu.VMEM((4, strip_rows, w_total), jnp.float32)]
            if has_xf32 else []
        ) + mxu_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * vmem_use + 8 * 1024 * 1024,
                                 100 * 1024 * 1024),
        ),
        interpret=interpret,
    )(x, t_arr, r0_arr, *mxu_args)
    return out


def mxu_tile_h(w: int, rh: int, rw: int, itemsize: int = 4) -> int | None:
    """Largest tile_h whose MXU-variant VMEM footprint fits, or None.

    Budget: double-buffered input strips + the H-pass tmp + double-buffered
    output blocks (all in the image dtype) + the f32 tap matrices and a
    (128, 128) f32 accumulator, against the same ~15.5 MB usable budget as
    fused_tile_h."""
    if rw > 128:
        return None
    n_wtiles = _round_up(w, 128) // 128
    w_total = (n_wtiles + 2) * 128
    sub = 16 if itemsize == 2 else 8
    for tile_h in (128, 64, 32):
        strip_rows = _round_up(tile_h + 2 * rh, sub)
        strips = 2 * strip_rows * w_total * itemsize
        tmp = tile_h * w_total * itemsize
        out = 2 * tile_h * n_wtiles * 128 * itemsize
        consts = (tile_h * strip_rows + 3 * 128 * 128 + 2 * 128 * 128) * 4
        if strips + tmp + out + consts < 15 * 1024 * 1024 + 512 * 1024:
            return tile_h
    return None


def pallas_available() -> bool:
    """Use real Pallas kernels only on TPU backends (CPU would need the
    slow interpreter); the jnp path remains the portable fallback."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
