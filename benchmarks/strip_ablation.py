#!/usr/bin/env python
"""Attribute the 4K flagship megakernel's frame time (speed-of-light work).

Variants run the real planner epilogue with doctored tap plans (and one
patched kernel body) so each delta vs base isolates one cost:

  base       : the shipped kernel (H taps + W taps + epilogue)
  skipW      : H taps only — no W taps, no transposed stores
  W=dirac    : W pass runs with a single center tap (isolates W-tap count)
  epi=add    : epilogue replaced by adds (isolates the pointwise cost)
  tile sweep : VMEM tile-height sensitivity

Timing: jit(fori_loop chain of N frames) per dispatch + a 4-byte
on-device-reduction fetch — the tunnel-safe sequenced method
(reforge_tpu/benchmarks.py).  Usage: python benchmarks/strip_ablation.py
[--frames 24] [--tiles 72,80,108]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from reforge_tpu.benchmarks import build_flagship, enable_cache, make_test_image
from reforge_tpu.graph.program import FILE_INPUT, FINAL_OUTPUT, KernelContext
from reforge_tpu.kernels import pallas_ops
from reforge_tpu.kernels.pallas_ops import (
    _blocked_taps,
    _strip_dma_fn,
    _strip_fill_halos,
    pl,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--size", default="3840x2160")
    # tiles must divide the frame height AND be sublane (8) multiples —
    # 108 is not (Mosaic rejects the 108-row output block); 40/72/80 are.
    ap.add_argument("--tiles", default="40,72,80")
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.split("x"))
    N = args.frames

    enable_cache()
    prog = build_flagship(W, H)
    _tag, conv_items, pointwise = prog._strip_plan
    plans = [plan for _, plan in conv_items]
    print("plan taps:", [(len(wh), len(ww)) for wh, ww in plans], flush=True)

    def real_epi(ci, row0, t_s, xin, blurs):
        ctx = KernelContext(width=W, height=H, time=t_s, fmt="rgba32f",
                            row_offset=row0, local_height=xin.shape[0])
        res = {FILE_INPUT: xin}
        for (node, _), blur in zip(conv_items, blurs):
            v = node.spec.conv_epilogue_cw(ctx, ci, xin, blur, node.params)
            res[node.outputs[0][0]] = v
        for node in pointwise:
            ins = {desc: res[r] for r, desc in node.inputs}
            res[node.outputs[0][0]] = node.spec.cw_fn(ctx, ci, ins, node.params)
        return res[FINAL_OUTPUT]

    def id_epi(ci, row0, t_s, xin, blurs):
        acc = xin
        for b in blurs:
            acc = acc + b
        return acc

    ORIG = pallas_ops._graph_strip_kernel

    def kernel_skip_w(x_hbm, t_ref, r0_ref, o_ref, scratch, tmps_t, blur_b,
                     sems, *maybe_xf32, weights, tile_h, out_w, n_tiles,
                     strip_rows, rh_max, rw_max, epilogue, raw=False,
                     in_h=0, in_w=0, pad_edge_mode=True, w_base=None,
                     n_aux=0, x3_idx=(), x3_terms=3):
        """The shipped kernel minus the entire W pass (and its transposed
        stores): the H results stand in for the blurs.  Timing-only."""
        ci = pl.program_id(0)
        i = pl.program_id(1)
        if w_base is None:
            w_base = rw_max
        dma_do = _strip_dma_fn(ci, x_hbm, scratch, sems, raw=raw,
                               tile_h=tile_h, strip_rows=strip_rows,
                               rh_max=rh_max, n_tiles=n_tiles, in_h=in_h,
                               in_w=in_w, w_base=w_base)
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
            _strip_fill_halos(i, slot, scratch, tile_h=tile_h,
                              strip_rows=strip_rows, rh_max=rh_max,
                              n_tiles=n_tiles, in_w=in_w, w_base=w_base,
                              edge=pad_edge_mode)
        src = lambda r, blk, c, L: scratch[slot, r : r + blk, c : c + L]
        _blocked_taps(
            src,
            lambda ki, r, n, c, L, acc: blur_b.__setitem__(
                (ki, slice(r, r + n), slice(c, c + L)), acc),
            tile_h, blur_b.shape[2], [wh for wh, _ in weights])
        blurs = [blur_b[k, :, 0:out_w] for k in range(len(weights))]
        xin = scratch[slot, rh_max : rh_max + tile_h, w_base : w_base + out_w]
        o_ref[0, :, :] = epilogue(
            ci, r0_ref[0, 0] + i * tile_h, t_ref[0, 0], xin, blurs
        )

    def kernel_dma_only(x_hbm, t_ref, r0_ref, o_ref, scratch, tmps_t, blur_b,
                        sems, *maybe_xf32, weights, tile_h, out_w, n_tiles,
                        strip_rows, rh_max, rw_max, epilogue, raw=False,
                        in_h=0, in_w=0, pad_edge_mode=True, w_base=None,
                        n_aux=0, x3_idx=(), x3_terms=3):
        """Pure structural floor: strip DMA + halo fills + grid + one
        center-block copy to the output — zero taps, zero epilogue.
        The delta vs the HBM one-read+one-write bound is the cost of the
        strip-grid schedule itself.  Timing-only."""
        ci = pl.program_id(0)
        i = pl.program_id(1)
        if w_base is None:
            w_base = rw_max
        dma_do = _strip_dma_fn(ci, x_hbm, scratch, sems, raw=raw,
                               tile_h=tile_h, strip_rows=strip_rows,
                               rh_max=rh_max, n_tiles=n_tiles, in_h=in_h,
                               in_w=in_w, w_base=w_base)
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
            _strip_fill_halos(i, slot, scratch, tile_h=tile_h,
                              strip_rows=strip_rows, rh_max=rh_max,
                              n_tiles=n_tiles, in_w=in_w, w_base=w_base,
                              edge=pad_edge_mode)
        o_ref[0, :, :] = scratch[
            slot, rh_max : rh_max + tile_h, w_base : w_base + out_w
        ]

    img = make_test_image(H, W)

    # DMA/halo isolation: run the SHIPPED kernel with the strip DMA
    # and/or the halo synthesis replaced by no-ops (compute reads
    # whatever VMEM holds — timing-only garbage).  base - noDMA is the
    # EXPOSED DMA cost under full tap load: ~0 means the double-buffer
    # hides it; large means the waits serialize against compute.
    ORIG_DMA = pallas_ops._strip_dma_fn
    ORIG_HALO = pallas_ops._strip_fill_halos

    def _noop_dma(*a, **k):
        return lambda step, slot, what: None

    def _noop_halo(*a, **k):
        return None

    def bench(name, plans_v, epi, tile_h, kern=None, no_dma=False,
              no_halo=False, out_const=False):
        pallas_ops._graph_strip_kernel = kern or ORIG
        if no_dma:
            pallas_ops._strip_dma_fn = _noop_dma
        if no_halo:
            pallas_ops._strip_fill_halos = _noop_halo
        if out_const:
            os.environ["REFORGE_STRIP_OUT_CONST"] = "1"
        try:
            def one(xc, t):
                return pallas_ops.graph_strip_fused(
                    xc, t, plans_v, epi, tile_h=tile_h
                )

            # Same-input scan with varying t — the render_sequence
            # structure.  A chained fori (output feeds input) serializes
            # frame boundaries on the output buffer (read-after-write:
            # no cross-frame DMA overlap) and measured ~+0.6 ms/frame at
            # 4K vs production.
            def seq(x0):
                def step(c, k):
                    return one(x0, 0.3 + 0.001 * k.astype(jnp.float32)), None
                return lax.scan(step, x0, jnp.arange(N))[0]

            f = jax.jit(seq)
            red = jax.jit(jnp.sum)
            t0 = time.perf_counter()
            out = f(img)
            float(red(out))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(img)
            float(red(out))
            ms = (time.perf_counter() - t0) / (N * args.reps) * 1000
            print(f"{name:34s} tile={tile_h:3d}  {ms:7.3f} ms/frame"
                  f"  (compile {comp:.0f}s)", flush=True)
            return ms
        finally:
            pallas_ops._graph_strip_kernel = ORIG
            pallas_ops._strip_dma_fn = ORIG_DMA
            pallas_ops._strip_fill_halos = ORIG_HALO
            os.environ.pop("REFORGE_STRIP_OUT_CONST", None)

    dirac = (1.0,)
    r1 = (0.25, 0.5, 0.25)
    bench("base (real)", plans, real_epi, 120)
    bench("base, out=const (timing-only)", plans, real_epi, 120,
          out_const=True)
    bench("base, DMA=noop (timing-only)", plans, real_epi, 120, no_dma=True)
    bench("base, halo=noop", plans, real_epi, 120, no_halo=True)
    bench("base, DMA+halo=noop", plans, real_epi, 120, no_dma=True,
          no_halo=True)
    bench("base, out=const + DMA+halo=noop", plans, real_epi, 120,
          no_dma=True, no_halo=True, out_const=True)
    bench("skipW (no W taps/stores)", plans, real_epi, 120, kernel_skip_w)
    bench("W=dirac (stores, 2 W taps)", [(wh, dirac) for wh, _ in plans],
          real_epi, 120)
    bench("skipW + epi=add", plans, id_epi, 120, kernel_skip_w)
    bench("r1 plans + epi=add", [(r1, r1)] * len(plans), id_epi, 120)
    bench("ONE r1 + epi=add", [(r1, r1)], id_epi, 120)
    bench("floor (DMA+grid, no taps)", [(r1, r1)], id_epi, 120,
          kernel_dma_only)
    for th in (int(v) for v in args.tiles.split(",") if v):
        bench("base (real)", plans, real_epi, th)
        bench("floor (DMA+grid, no taps)", [(r1, r1)], id_epi, th,
              kernel_dma_only)
    return 0


if __name__ == "__main__":
    sys.exit(main())
