"""Explicit halo-exchange spatial sharding: shard_map + ppermute.

The hand-scheduled alternative to GSPMD auto-partitioning
(spatial.shard_program): the whole graph runs inside one ``shard_map``
over a 1-D row mesh, and each node's declared halo drives exactly the
communication it needs:

  * halo == 0    — pure local compute (pointwise/color nodes): zero
    communication, the common case.
  * halo == r    — exchange r boundary rows with each neighbor via
    ``jax.lax.ppermute`` (the image-domain analog of ring attention's
    neighbor KV passing), run the unmodified kernel on the padded slab,
    crop r rows: interior outputs only depend on genuine data, so any
    translation-invariant kernel with support <= r is exact.
  * halo is None — data-dependent access (warps, mosaics): all-gather the
    rows, run on the full image, keep the local slab.  Correct by
    construction; costs one collective.

Global edges replicate boundary rows (clamp-to-edge) or zero-fill,
matching the kernel's border convention; ppermute conveniently delivers
zeros to edge devices that have no neighbor.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import FILE_INPUT, FINAL_OUTPUT
from ..kernels.base import KernelContext, quantize_rgba8
from ..graph.program import GraphProgram
from ..utils import warnln
from .mesh import Mesh, ROW_AXIS


def halo_pad(
    x: jnp.ndarray,
    r: int,
    n_devices: int,
    device_idx: Any,
    axis_name: str = ROW_AXIS,
    mode: str = "edge",
) -> jnp.ndarray:
    """Pad a local (C, h, W) slab with r rows from each neighbor.

    Devices at the global top/bottom get edge-replicated (or zero) rows
    instead — reproducing the single-device border convention exactly.

    When r exceeds the slab height, the halo is assembled by CHAINED
    neighbor ``ppermute`` hops (ceil(r/h) rounds): hop j forwards the
    block received in hop j-1, so after k hops each device holds its k
    nearest slabs on each side — never a full-image all-gather (a sigma-16
    blur on thin slabs stays on the neighbor-exchange path).
    """
    h = x.shape[1]
    if r <= h:
        bot_send = x[:, -r:, :]  # my bottom rows -> below device's top halo
        top_send = x[:, :r, :]  # my top rows -> above device's bottom halo
        from_above = jax.lax.ppermute(
            bot_send, axis_name, [(i, i + 1) for i in range(n_devices - 1)]
        )
        from_below = jax.lax.ppermute(
            top_send, axis_name, [(i, i - 1) for i in range(1, n_devices)]
        )
        if mode == "edge":
            top_edge = jnp.repeat(x[:, :1, :], r, axis=1)
            bot_edge = jnp.repeat(x[:, -1:, :], r, axis=1)
            from_above = jnp.where(device_idx == 0, top_edge, from_above)
            from_below = jnp.where(
                device_idx == n_devices - 1, bot_edge, from_below
            )
        return jnp.concatenate([from_above, x, from_below], axis=1)

    # ---- multi-hop: r > h ------------------------------------------------
    # Blocks beyond the physical mesh edge arrive as zeros (ppermute has
    # no link); edge mode then overwrites the out-of-image rows below.
    down = [(i, i + 1) for i in range(n_devices - 1)]
    up = [(i, i - 1) for i in range(1, n_devices)]
    k = min(-(-r // h), max(n_devices - 1, 1))
    above_blocks: list = []
    below_blocks: list = []
    cur_d = x
    cur_u = x
    for _ in range(k):
        cur_d = jax.lax.ppermute(cur_d, axis_name, down)
        cur_u = jax.lax.ppermute(cur_u, axis_name, up)
        above_blocks.insert(0, cur_d)
        below_blocks.append(cur_u)
    if k * h < r:  # radius reaches past the whole mesh: zero-extend
        zeros = jnp.zeros((x.shape[0], r - k * h, x.shape[2]), x.dtype)
        above_blocks.insert(0, zeros)
        below_blocks.append(zeros)
    above = jnp.concatenate(above_blocks, axis=1)[:, -r:, :]
    below = jnp.concatenate(below_blocks, axis=1)[:, :r, :]
    if mode == "edge":
        rows = jnp.arange(r, dtype=jnp.int32)[None, :, None]
        # ``above`` covers global rows [idx*h - r, idx*h): the first
        # max(0, r - idx*h) rows precede the image and must replicate
        # global row 0 — found at local index r - idx*h (device 0 has no
        # valid rows at all; its row 0 is its own first slab row).
        deficit_a = r - device_idx * h
        ref_a = jnp.where(
            device_idx == 0,
            x[:, 0:1, :],
            jax.lax.dynamic_slice_in_dim(
                above, jnp.clip(deficit_a, 0, r - 1), 1, axis=1
            ),
        )
        above = jnp.where(rows < deficit_a, ref_a, above)
        # Mirrored at the bottom: the last max(0, r - (n-1-idx)*h) rows of
        # ``below`` lie past the image and replicate the last image row.
        deficit_b = r - (n_devices - 1 - device_idx) * h
        ref_b = jnp.where(
            device_idx == n_devices - 1,
            x[:, -1:, :],
            jax.lax.dynamic_slice_in_dim(
                below, jnp.clip(r - 1 - deficit_b, 0, r - 1), 1, axis=1
            ),
        )
        below = jnp.where(rows >= r - deficit_b, ref_b, below)
    return jnp.concatenate([above, x, below], axis=1)


class HaloShardedProgram:
    """A graph program row-sharded with per-node explicit halo exchange."""

    def __init__(self, program: GraphProgram, mesh: Mesh):
        self.program = program
        self.mesh = mesh
        self.n = mesh.shape[ROW_AXIS]
        h = program.height
        if h % self.n != 0:
            raise ValueError(
                f"image height {h} is not divisible by the {self.n}-device mesh"
            )
        self.h_local = h // self.n
        self._mesh_is_tpu = mesh.devices.flat[0].platform == "tpu"

        self._compiled = None
        rows = P(None, ROW_AXIS, None)
        scalar = P()
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, so the vma checker would reject the (legal) per-device
        # Pallas kernels inside the shard_map body.
        self._fused = jax.jit(
            shard_map(
                self._local_forward,
                mesh=mesh,
                in_specs=(rows, scalar),
                out_specs=rows,
                check_vma=False,
            )
        )

    # Runs per device on the local slab.
    def _local_forward(self, file_input_local: jnp.ndarray, t: jnp.ndarray):
        # shard_map bodies are per-device programs over local slabs, so the
        # single-device Pallas kernels apply directly on TPU meshes — the
        # scale path keeps the fast kernels instead of shipping a ~4x
        # kernel regression.  CPU meshes (the test environment) trace the
        # portable jnp kernels (ops.no_pallas); GSPMD/vmap wrappers still
        # must (see parallel/spatial.py, parallel/batch.py).
        if self._mesh_is_tpu:
            return self._local_forward_impl(file_input_local, t)
        from ..kernels import ops as _ops

        with _ops.no_pallas():
            return self._local_forward_impl(file_input_local, t)

    def _strip_local(self, x_local: jnp.ndarray, t, idx):
        """Whole-graph strip fusion per shard: ONE halo exchange of the
        input (max conv radius), then the single-device megakernel on
        the halo-extended slab, cropping the synthetic border.

        The plan's convs all read FILE_INPUT with edge borders, so one
        exchange covers every node; the megakernel's own edge padding
        only influences the 2*RH border rows that are cropped away.  The
        epilogue's global row coordinate rides in via row0_base.  Falls
        through (None) on CPU meshes or when the program's strip gates
        say no — the per-node exchange path below is always correct."""
        prog = self.program
        import os as _os

        force_interp = _os.environ.get("REFORGE_PALLAS_INTERPRET") == "1"
        if not (self._mesh_is_tpu or force_interp) or prog._strip_plan is None:
            return None
        if prog._strip_plan[0] == "segments":
            # Hybrid plans interleave fused segments with per-node nodes;
            # the slab executor needs ONE kernel covering the whole graph.
            # The per-node exchange path below handles these graphs.
            return None
        if prog._strip_plan[0] == "mc":
            # The mc plan records the whole graph's accumulated input
            # halo; one exchange of that many rows bounds every stage's
            # boundary error inside the cropped border.
            RH = prog._strip_plan[1]["input_halo"]
            if prog._strip_plan[1].get("edge_hazard"):
                # A conv/stencil of an INTERMEDIATE diverges at the true
                # image border on a replica-extended slab (the unsharded
                # kernel clamps the intermediate at the edge; computing
                # through replicas yields different values).  Edge-aware
                # slab variants keep the megakernel exact.
                return self._strip_local_hazard(
                    x_local, t, idx, RH
                )
        else:
            _tag, conv_items, _ = prog._strip_plan
            RH = max((len(wh) - 1) // 2 for _, (wh, ww) in conv_items)
        if RH == 0 or RH >= self.program.height:
            # RH == 0 (H-only radius-free plans): halo_pad's r=0 slices
            # (x[:, -0:, :] == the whole slab!) and the RH:-RH crop both
            # degenerate; the per-node path handles it.  (RH > h_local is
            # fine: halo_pad chains neighbor hops.)
            return None
        pad_mode = (
            prog._strip_plan[1].get("mode", "edge")
            if prog._strip_plan[0] == "mc" else "edge"
        )
        ext = halo_pad(x_local, RH, self.n, idx, mode=pad_mode)
        out_ext = prog._strip_fused_forward(
            ext, t, row0_base=idx * self.h_local - RH
        )
        if out_ext is None:
            return None
        return out_ext[:, RH:-RH, :]

    def _strip_local_hazard(self, x_local: jnp.ndarray, t, idx, RH: int):
        """Megakernel-per-shard for mc plans whose stages read
        INTERMEDIATES with a halo (plan["edge_hazard"]).

        The uniform replica-extended slab is exact for stages reading the
        file input (replicated rows ARE the clamp semantics) but not for
        convs of intermediates at the true image border.  Three slab
        variants keep it exact everywhere: the first/last shard run the
        kernel on a slab whose outer side ends at the TRUE image edge —
        the kernel's own in-VMEM edge replication then clamps the
        intermediates exactly like the unsharded program — and interior
        shards compute through genuine neighbor data on both sides.
        ``lax.switch`` selects the variant per device inside the single
        SPMD program.  Falls through (None -> per-node exchange path)
        when any variant's strip geometry fails the tile gates."""
        from ..kernels import pallas_ops

        prog = self.program
        h_local, n = self.h_local, self.n
        plan = prog._strip_plan[1]
        if RH == 0 or RH >= h_local or n == 1:
            # n == 1: the raw slab IS the whole image; run the kernel
            # directly (both edges true).
            if n == 1:
                return prog._strip_fused_forward(x_local, t, row0_base=0)
            return None

        def tile_ok(hh: int) -> bool:
            return pallas_ops.mc_strip_tile_h(
                hh, prog.width, plan["rh_in"], plan["ew_in"],
                max(plan["n_bufs"], 1),
                itemsize=x_local.dtype.itemsize,
                min_tile=2 * plan.get("eh_max", 0),
                mxu_t_max=plan.get("mxu_t_max", 0),
            ) is not None

        R = next(
            (
                c for c in range(RH, min(RH + 33, h_local))
                if tile_ok(h_local + 2 * c) and tile_ok(h_local + c)
            ),
            None,
        )
        if R is None:
            return None
        ext = halo_pad(x_local, R, n, idx, mode="edge")
        row0 = idx * h_local

        def top(_):
            out = prog._strip_fused_forward(
                ext[:, R:, :], t, row0_base=row0
            )
            return out[:, :h_local, :]

        def mid(_):
            out = prog._strip_fused_forward(ext, t, row0_base=row0 - R)
            return out[:, R:-R, :]

        def bot(_):
            out = prog._strip_fused_forward(
                ext[:, : h_local + R, :], t, row0_base=row0 - R
            )
            return out[:, R:, :]

        # The tile gates were proven for both extended heights above, so
        # none of the branches can return None.
        sel = jnp.where(idx == 0, 0, jnp.where(idx == self.n - 1, 2, 1))
        return jax.lax.switch(sel, [top, mid, bot], 0)

    def _local_forward_impl(self, file_input_local: jnp.ndarray, t: jnp.ndarray):
        prog = self.program
        n, h_local = self.n, self.h_local
        idx = jax.lax.axis_index(ROW_AXIS)
        # Same storage-dtype cast GraphProgram._forward applies, so the
        # sharded and fused paths are numerically identical under rgba16f.
        resources: dict[str, Any] = {
            FILE_INPUT: file_input_local.astype(prog.storage_dtype)
        }
        strip = self._strip_local(resources[FILE_INPUT], t, idx)
        if strip is not None:
            return strip

        def ctx_for(local_height: int, row0) -> KernelContext:
            return KernelContext(
                width=prog.width,
                height=prog.height,
                time=t,
                fmt=prog.fmt,
                row_offset=row0,
                local_height=local_height,
            )

        for layer in prog.graph.layers:
            for node in layer:
                spec = node.spec
                ins_local = {
                    desc: prog.compute_input(resources[res])
                    for res, desc in node.inputs
                }
                r = node.halo
                if r is not None and r >= prog.height:
                    # A radius spanning the whole image: every output row
                    # depends on every input row; gather and be done.
                    warnln(
                        f"node '{node.name}': halo {r} spans the whole "
                        f"{prog.height}-row image; falling back to "
                        f"all-gather (full-image collective per frame)"
                    )
                    r = None
                if spec.ssbos_in or spec.ssbos_out:
                    # Buffer-touching nodes (histograms, LUTs) compute on the
                    # full image so the buffer is identical (replicated) on
                    # every device; image outputs keep the local slab.
                    r = None

                def is_buffer(desc):
                    return desc in spec.ssbos_in or desc in spec.ssbos_out

                if r is None:
                    full = {
                        d: (
                            v
                            if is_buffer(d)
                            else jax.lax.all_gather(v, ROW_AXIS, axis=1, tiled=True)
                        )
                        for d, v in ins_local.items()
                    }
                    outs = spec(ctx_for(prog.height, 0), full, node.params)
                    crop = lambda v: jax.lax.dynamic_slice_in_dim(
                        v, idx * h_local, h_local, axis=1
                    )
                elif r == 0:
                    outs = spec(
                        ctx_for(h_local, idx * h_local), ins_local, node.params
                    )
                    crop = lambda v: v
                else:
                    border = spec.border_for(node.params)
                    padded = {
                        d: v if is_buffer(d) else halo_pad(v, r, n, idx, mode=border)
                        for d, v in ins_local.items()
                    }
                    outs = spec(
                        ctx_for(h_local + 2 * r, idx * h_local - r),
                        padded,
                        node.params,
                    )
                    crop = lambda v, _r=r: v[:, _r:-_r, :]
                for res, desc in node.outputs:
                    if is_buffer(desc):
                        resources[res] = outs[desc].astype(jnp.float32)
                        continue
                    resources[res] = prog.store_output(crop(outs[desc]))
        return resources[FINAL_OUTPUT]

    def __call__(self, file_input: jnp.ndarray, t) -> jnp.ndarray:
        if self._compiled is not None:
            return self._compiled(file_input, jnp.float32(t))
        return self._fused(file_input, jnp.float32(t))

    def compile(self) -> None:
        """Eagerly AOT-compile (usable from a background thread, like
        GraphProgram.compile)."""
        prog = self.program
        shape = jax.ShapeDtypeStruct(
            (4, prog.height, prog.width),
            jnp.float32,
            sharding=NamedSharding(self.mesh, P(None, ROW_AXIS, None)),
        )
        t = jax.ShapeDtypeStruct((), jnp.float32)
        self._compiled = self._fused.lower(shape, t).compile()

    def shard_input(self, file_input: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(
            file_input, NamedSharding(self.mesh, P(None, ROW_AXIS, None))
        )
