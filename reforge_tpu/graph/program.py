"""GraphProgram: compile a built graph into executable XLA programs.

The analog of the reference's ``PipelineGraph`` + ``execute_pipeline_graph``
hot loop (src/vulkan/pipeline_graph.rs:499-592, src/vulkan/command.rs:166-242)
— but where the reference records one dispatch per node with barriers
between layers, we trace every node into ONE fused ``jax.jit`` program: XLA
fuses pointwise chains, eliminates dead nodes, and reuses buffers (the
hand-rolled aliasing pass at pipeline_graph.rs:358-427 falls out of XLA
buffer assignment for free).

Two execution modes:
  * ``__call__``        — the fused program (production path).
  * ``run_per_node``    — one jitted program per node, executed layer by
    layer with blocking timestamps: the analog of the reference's per-node
    GPU timestamp queries (command.rs:188-216) which cannot exist inside a
    fused program.  Per-node programs are also what runs while a fused
    recompile is still in flight after a live edit.
"""

from __future__ import annotations

import time as _time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import FILE_INPUT, FINAL_OUTPUT
from ..kernels.base import KernelContext, quantize_rgba8
from ..utils import warnln
from .builder import BuiltGraph, PipelineNode


class GraphTraceError(Exception):
    pass


# ---- global per-node jit cache -------------------------------------------
#
# Per-node programs are cached ACROSS GraphPrograms, keyed by everything
# that shapes the traced computation: the kernel spec's identity, the
# resolved (static) params, the node's wiring and the program extent/format.
# Combined with the kernel loader's source cache (same spec object while a
# source file is unchanged), a live edit of one node rebuilds exactly one
# per-node program — every other node's executable is reused, which is what
# makes the interim unfused program (run_unfused) swap in at sub-frame
# latency while the fused XLA recompile proceeds off-thread.  The analog of
# the reference rebuilding only the edited pipeline
# (pipeline_graph.rs:329-343).
_NODE_FN_CACHE: dict[tuple, tuple[Any, Any]] = {}
_NODE_FN_CACHE_MAX = 512

# Column-extent alignment for the mc strip plan.  8 = sublane minimum
# (narrowest blocks); 128 = every intermediate-pool block read/write is
# lane-aligned at the cost of up to 120 extra halo columns per side.
import os as _os  # noqa: E402

MC_EW_ALIGN = int(_os.environ.get("REFORGE_MC_EW_ALIGN", "8"))


def _as_f32_scalar(v):
    """Host scalar -> device f32 without re-dispatching when the caller
    already holds a device f32 scalar (each host->device conversion is a
    serialized RPC on tunneled devices, ~ms; see render_sequence)."""
    if isinstance(v, jax.Array) and v.dtype == jnp.float32 and v.ndim == 0:
        return v
    return jnp.float32(v)


def _node_fn_key(node: PipelineNode, width: int, height: int, fmt: str):
    return (
        id(node.spec),
        tuple(sorted(node.params.items())),
        tuple(node.inputs),
        tuple(node.outputs),
        width,
        height,
        fmt,
    )


# Fused AOT executables cached across GraphPrograms by the full graph
# signature: revisiting a previously compiled graph (toggling an edit back,
# A->B->A) swaps the fused program with zero XLA compile.
_FUSED_CACHE: dict[tuple, tuple[Any, Any]] = {}
_FUSED_CACHE_MAX = 64


class GraphProgram:
    # Inter-node storage dtype per format: rgba8 keeps f32 but quantizes to
    # the UNORM grid (Vulkan storage-image parity); rgba16f stores bfloat16
    # (the TPU-native half float), halving inter-node bandwidth like a GPU
    # half-float render target.
    STORAGE_DTYPES = {
        "rgba32f": jnp.float32,
        "rgba8": jnp.float32,
        "rgba16f": jnp.bfloat16,
    }

    def __init__(
        self,
        graph: BuiltGraph,
        width: int,
        height: int,
        fmt: str = "rgba32f",
        *,
        segments_ok: bool = True,
        plan_strips: bool = True,
    ):
        self.graph = graph
        self.width = width
        self.height = height
        self.fmt = fmt
        self.storage_dtype = self.STORAGE_DTYPES.get(fmt, jnp.float32)
        self._fused = jax.jit(self._forward)
        self._segments_ok = segments_ok
        # plan_strips=False: one-shot renders skip megakernel planning
        # entirely — the Mosaic compile (minutes through a device tunnel)
        # and the GLSL conv-synthesis probing only pay off across many
        # frames; a single frame is fastest through the per-node programs
        # (each a small, persistently-cacheable XLA executable).
        #
        # Planning is LAZY (the _strip_plan property): it can cost
        # seconds (GLSL conv-synthesis probing), and the engine's async
        # rebuild publishes the interim per-node program FIRST — planning
        # runs when the fused path first traces, on the background
        # compile, not ahead of the interim swap.
        self._strip_planned = not plan_strips
        self._strip_plan_cache = None
        self._coord_plane_stack = None  # lazy; see _strip_fused_forward
        self._node_fns: dict[str, Any] = {}
        self._seq_fns: dict[tuple, Any] = {}  # render_sequence jits
        self._compiled = None  # AOT executable from compile()
        # Interim mode after a live edit: render via cached per-node
        # programs while the fused XLA compile proceeds off-thread; flips
        # off automatically when compile() lands (engine.py:_finish_build).
        self._use_unfused = False

    # ---- tracing --------------------------------------------------------

    @property
    def _strip_plan(self):
        if not self._strip_planned:
            self._strip_planned = True
            self._strip_plan_cache = self._plan_strip_fusion()
        return self._strip_plan_cache

    @_strip_plan.setter
    def _strip_plan(self, value):
        self._strip_planned = True
        self._strip_plan_cache = value

    def _ctx(self, t) -> KernelContext:
        return KernelContext(width=self.width, height=self.height, time=t, fmt=self.fmt)

    def compute_input(self, value):
        """Storage -> compute dtype for a kernel input.

        GPU semantics: shaders compute in fp32 regardless of the
        storage-image format; rgba16f means bfloat16 STORAGE between
        nodes (the halo-sharded executor shares this policy)."""
        if value.dtype == jnp.bfloat16:
            return value.astype(jnp.float32)
        return value

    def store_output(self, value):
        """Compute -> storage dtype for a node's image output (including
        the rgba8 UNORM-grid quantization)."""
        if self.fmt == "rgba8":
            value = quantize_rgba8(value)
        return value.astype(self.storage_dtype)

    def _run_node(
        self, node: PipelineNode, ctx: KernelContext, resources: dict[str, Any]
    ) -> dict[str, Any]:
        images = {}
        for res, desc in node.inputs:
            value = resources.get(res)
            if value is None:
                raise GraphTraceError(
                    f"node '{node.name}' reads resource '{res}' before it is written"
                )
            images[desc] = self.compute_input(value)
        outs = node.spec(ctx, images, node.params)
        written = {}
        for res, desc in node.outputs:
            if desc not in outs:
                raise GraphTraceError(
                    f"kernel '{node.spec.name}' did not produce declared output "
                    f"'{desc}' (produced: {', '.join(outs)})"
                )
            value = outs[desc]
            if desc in node.spec.ssbos_out:
                expected_len = self.graph.buffer_sizes.get(res, value.shape[-1])
                if tuple(value.shape) != (expected_len,):
                    raise GraphTraceError(
                        f"kernel '{node.spec.name}' buffer output '{desc}' has "
                        f"shape {tuple(value.shape)}, expected ({expected_len},)"
                    )
                written[res] = value.astype(jnp.float32)
                continue
            expected = (4, self.height, self.width)
            if tuple(value.shape) != expected:
                raise GraphTraceError(
                    f"kernel '{node.spec.name}' output '{desc}' has shape "
                    f"{tuple(value.shape)}, expected {expected}"
                )
            written[res] = self.store_output(value)
        return written

    def _forward(self, file_input: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        ctx = self._ctx(t)
        resources: dict[str, Any] = {
            FILE_INPUT: file_input.astype(self.storage_dtype)
        }
        strip = self._strip_fused_forward(resources[FILE_INPUT], t)
        if strip is not None:
            return strip
        if self._strip_plan is not None and self._strip_plan[0] == "segments":
            return self._segments_forward(resources, ctx, t)
        return self._forward_layers(resources, ctx)

    def _forward_nostrip(
        self, file_input: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-node trace only — make_program validates with this so
        building a program never triggers strip planning (which can cost
        seconds of GLSL conv-synthesis probing; see _strip_plan)."""
        ctx = self._ctx(t)
        resources: dict[str, Any] = {
            FILE_INPUT: file_input.astype(self.storage_dtype)
        }
        return self._forward_layers(resources, ctx)

    def _forward_layers(self, resources: dict, ctx: KernelContext):
        for layer in self.graph.layers:
            bundles, singles = self._bundle_groups(layer)
            for res, items in bundles:
                self._run_bundle(res, items, ctx, resources)
            for node in singles:
                resources.update(self._run_node(node, ctx, resources))
        out = resources.get(FINAL_OUTPUT)
        if out is None:
            raise GraphTraceError("no node wrote the final output")
        return out

    def _plan_strip_fusion(self):
        """Static eligibility for whole-graph strip fusion.

        Two tiers, tried in order:
          * ``("single", conv_items, pointwise)`` — every conv reads
            FILE_INPUT and every other node is channel-local pointwise:
            the per-channel megakernel (pallas_ops.graph_strip_fused),
            which shares conv strip loads across same-input convs.
          * ``("mc", McPlan)`` — the general multi-stage multi-channel
            megakernel (pallas_ops.graph_strip_fused_mc): convs of
            intermediates, small-radius stencils (sobel, sharpen),
            channel-mixing pointwise nodes (luma thresholds, saturation).

        Either way the graph executes as ONE Pallas kernel: intermediates
        never touch HBM — the TPU-native answer to the reference's
        one-dispatch-per-node command buffer (command.rs:166-242)."""
        single = None
        if not _os.environ.get("REFORGE_FORCE_MC"):
            # benchmarking knob: route single-tier-eligible graphs through
            # the mc planner to A/B the two conv stages on the same graph
            single = self._plan_strip_single()
        if single is not None:
            return ("single",) + single
        mc = self._plan_strip_mc()
        if mc is not None:
            return ("mc", mc)
        return self._plan_strip_segments()

    def _conv_plan_for(self, node, max_taps: int | None = None):
        """(wh, ww) numpy tap vectors when this node is strip-fusable as a
        separable conv with these params, else None.

        ``max_taps`` defaults to ops.X3_MIN_TAPS: beyond it the per-node
        standalone MXU x3 conv beats VPU taps, so per-node execution wins
        unless the CALLER can run the conv on the MXU in-kernel — the
        single-tier planner raises the cap when graph_strip_fused's x3
        stage is available (f32, lane-multiple width), which keeps heavy
        convs (sigma >~ 4.3) inside the megakernel instead of dropping
        the WHOLE graph to per-node HBM round trips (measured 4K
        gaussian-sigma8 + tonemap: fused-x3 ~1.1 ms vs per-node 3.0)."""
        from ..kernels import ops as _ops

        spec = node.spec
        if (
            spec.conv_weights is None
            or len(node.inputs) != 1
            or spec.border_for(node.params) != "edge"
        ):
            return None
        plan = spec.conv_weights(node.params)
        if plan is None:
            return None
        taps = len(plan[0]) + len(plan[1])
        if not (4 <= taps < (max_taps or _ops.X3_MIN_TAPS)):
            return None
        return plan

    def _plan_strip_single(self):
        import jax.numpy as _jnp

        # Heavy convs stay fusable when the in-kernel MXU band stage can
        # take them (see _conv_plan_for: f32 via bf16x3 splits, bf16
        # storage via single-product dots); the W band needs rw <= 128.
        max_taps = 200 if self.width % 128 == 0 else None
        conv_items: list = []
        pointwise: list = []
        for layer in self.graph.layers:
            for node in layer:
                spec = node.spec
                if len(node.outputs) != 1 or spec.ssbos_in or spec.ssbos_out:
                    return None
                if (
                    spec.conv_epilogue_cw is not None
                    and node.inputs
                    and node.inputs[0][0] == FILE_INPUT
                ):
                    plan = self._conv_plan_for(node, max_taps)
                    if plan is not None:
                        conv_items.append((node, plan))
                        continue
                if (
                    spec.cw_fn is not None
                    and spec.halo_for(node.params) == 0
                    and node.inputs
                ):
                    pointwise.append(node)
                    continue
                return None
        if not conv_items:
            return None  # pointwise-only graphs fuse fine under plain XLA
        return (conv_items, pointwise)

    def _plan_strip_mc(self):
        """Build the multi-stage plan (see pallas_ops.McStage), or None.

        Node classes: separable convs of ANY image resource (optionally
        with a node-internal pre-map, e.g. bloom's threshold mask),
        small-radius stencils via ``mc_stencil_fn`` (sobel, sharpen,
        emboss, median3), and arbitrary pointwise builtins evaluated via
        their full ``fn`` on channel-full blocks.  Width must be a lane
        multiple (the mc kernel is raw-DMA only); GLSL nodes and gather/
        ssbo kernels fall back to per-node execution."""
        import numpy as np

        from ..config import FILE_INPUT as _FI
        from ..kernels import ops as _ops
        from ..kernels.pallas_ops import McStage

        if self.width % 128 != 0:
            return None

        def _r8(v):
            return (v + 7) // 8 * 8

        def _rw(v):
            # Column extents align to MC_EW_ALIGN (sublane-8 minimum;
            # 128 makes every pool-block read/write lane-aligned at the
            # cost of wider blocks — see the mc gate note below).
            a = MC_EW_ALIGN
            return (v + a - 1) // a * a

        # MXU-eligible conv stages run as band matmuls inside the mc
        # kernel (McStage.mxu) — sigma-independent and off the VPU.
        # bf16 storage: single products at >= 24 combined taps (the
        # rgba16f fast-mode formulation).  f32 storage (rgba32f/rgba8
        # pools): HEAVY convs (>= X3_MIN_TAPS combined taps, where
        # per-node execution switches to the standalone MXU x3 kernel
        # anyway) as f32-exact bf16x3 splits — same MXU cost as
        # per-node x3, minus the per-node HBM round trips.
        mxu_min_taps = int(
            _os.environ.get("REFORGE_MC_MXU_BF16_MIN_TAPS", "24")
        )
        x3_min_taps = int(
            _os.environ.get(
                "REFORGE_MC_MXU_F32_MIN_TAPS", str(_ops.X3_MIN_TAPS)
            )
        )
        x3_min_width = int(
            _os.environ.get(
                "REFORGE_MC_MXU_F32_MIN_WIDTH", str(_ops.MC_MXU_F32_MIN_WIDTH)
            )
        )

        def _conv_mxu_terms(plan) -> int:
            """0 = not MXU-eligible, 1 = single-product bf16, 3 = bf16x3.

            The bf16 single-product form wins at every width (measured
            0.44 vs 0.53 ms at 1080p, 2.06x at 4K); the f32-exact bf16x3
            form pays 6 MXU products + the Dekker splits per pass, so it
            only beats per-node's standalone x3 kernel at wide frames
            (4K 1.27-1.42x, 1080p 0.80x) — below x3_min_width heavy f32
            convs keep per-node execution.  rgba8 is excluded: the
            UNORM-grid store1 quantize inside the x3 W-tile loop
            measured 13.5 ms vs 5.5 per-node on blur2-s8 4K (and
            minutes-long Mosaic compiles) — rgba8 is parity semantics,
            not a fast path, so heavy rgba8 convs stay per-node."""
            wh, ww = plan
            taps = len(wh) + len(ww)
            if (len(ww) - 1) // 2 > 64:
                return 0
            if self.storage_dtype == jnp.bfloat16:
                return 1 if taps >= mxu_min_taps else 0
            if (
                self.storage_dtype == jnp.float32
                and self.fmt != "rgba8"
                and taps >= x3_min_taps
                and self.width >= x3_min_width
            ):
                return 3
            return 0

        def _conv_mxu(plan) -> bool:
            return _conv_mxu_terms(plan) > 0

        # ---- classify ----------------------------------------------------
        # entries: (kind, node, extra); kinds "conv" | "stencil" | "point"
        # GLSL conv/stencil-idiom nodes carry their synthesized plan in
        # ``synth_of`` (glsl/affine.py): the same stage machinery, with
        # the epilogue built from the recovered scale/passthrough/offset.
        nodes: list = []
        synth_of: dict[str, Any] = {}
        n_heavy = 0
        for layer in self.graph.layers:
            for node in layer:
                spec = node.spec
                if len(node.outputs) != 1 or spec.ssbos_in or spec.ssbos_out:
                    return None
                plan = None
                synth = None
                if spec.conv_epilogue is not None:
                    plan = self._conv_plan_for(node, max_taps=200)
                    if (
                        plan is not None
                        and len(plan[0]) + len(plan[1]) >= _ops.X3_MIN_TAPS
                        and not _conv_mxu(plan)
                    ):
                        # Heavy conv that can't ride the in-kernel MXU:
                        # per-node's standalone x3 kernel wins — don't
                        # serialize ~100 taps on the mc VPU.
                        plan = None
                elif (
                    spec.source_path is not None
                    and len(node.inputs) == 1
                    and (spec.halo_for(node.params) or 0) >= 1
                ):
                    # User .comp shader with a static-shift halo: recover
                    # its affine tap-sum structure (if it has one) so the
                    # shader rides the same megakernel stages as builtins
                    # — the reference runs user shaders in the very same
                    # hot loop (src/vulkan/command.rs:166-242).
                    from ..glsl.affine import (
                        ConvSynth as _CS,
                        StencilSynth as _SS,
                        synthesize_conv as _synth_conv,
                    )

                    got = _synth_conv(spec, node.params)
                    if isinstance(got, _CS):
                        plan = (got.wh, got.ww)
                        taps = len(plan[0]) + len(plan[1])
                        if not 4 <= taps <= 200 or (
                            taps >= _ops.X3_MIN_TAPS and not _conv_mxu(plan)
                        ):
                            plan = None
                        else:
                            synth = got
                    elif isinstance(got, _SS):
                        synth_of[node.name] = got
                        nodes.append(("stencil", node, got.radius))
                        n_heavy += 1
                        continue
                    if (
                        plan is None
                        and self.width >= 1920
                        and self._segments_ok  # top-level plan only
                        and (spec.halo_for(node.params) or 0) >= 2
                    ):
                        # Mirror of the GSPMD kernel-cliff warning
                        # (parallel/spatial.py): a wide-frame conv-idiom
                        # user shader that cannot ride the megakernel
                        # pays per-tap whole-image HBM reads on the
                        # plain-XLA path.
                        warnln(
                            f"GLSL node '{node.name}' ({spec.name}) is a "
                            f"conv-idiom shader (radius "
                            f"{spec.halo_for(node.params)}) that could not "
                            f"join the fused megakernel at {self.width}x"
                            f"{self.height}; it will run per-node — expect "
                            f"reduced throughput"
                        )
                if plan is not None:
                    if synth is not None:
                        synth_of[node.name] = synth
                    nodes.append(("conv", node, plan))
                    n_heavy += 1
                    continue
                r = spec.halo_for(node.params)
                if spec.mc_stencil_fn is not None and r is not None and 1 <= r <= 16:
                    if spec.border_for(node.params) != "edge":
                        return None
                    if len(node.inputs) != 1:
                        return None
                    nodes.append(("stencil", node, r))
                    n_heavy += 1
                    continue
                if r == 0 and node.inputs and (
                    spec.source_path is None
                    or (
                        spec.mc_block_ok is not None
                        and spec.mc_block_ok(node.params)
                    )
                ):
                    # Builtins run their full fn on channel-full blocks;
                    # GLSL pointwise shaders (reflected halo 0 — no
                    # gathers, no SSBOs, no shared memory) evaluate their
                    # vectorized interpreter on the same blocks with the
                    # block's coordinate origin threaded through ctx
                    # (KernelContext.row_offset/col_offset).  One hot
                    # loop for user shaders and builtins alike — the
                    # reference dispatches both identically
                    # (src/vulkan/command.rs:166-242).
                    nodes.append(("point", node, None))
                    continue
                return None
        # ---- compose chained synthesized 1-D convs -----------------------
        # gaussian_h.comp -> gaussian_v.comp is ONE separable conv split
        # into two nodes; composed (glsl/affine.compose) the pair becomes
        # a single zero-extent stage — which the wide-frame gate below
        # admits where the extent-carrying pair would have dropped the
        # whole graph to per-node.  Iterates to fold longer chains.
        if synth_of:
            from ..glsl.affine import ConvSynth as _CSyn
            from ..glsl.affine import compose as _compose_synth

            changed = True
            while changed:
                changed = False
                cons: dict[str, int] = {}
                for _k, nd, _e in nodes:
                    for res, _d in nd.inputs:
                        cons[res] = cons.get(res, 0) + 1
                for i, (kind_a, na, _plan_a) in enumerate(nodes):
                    if kind_a != "conv":
                        continue
                    sa = synth_of.get(na.name)
                    if not isinstance(sa, _CSyn):
                        continue
                    out_res = na.outputs[0][0]
                    if out_res == FINAL_OUTPUT or cons.get(out_res, 0) != 1:
                        continue
                    for j, (kind_b, nb, _plan_b) in enumerate(nodes):
                        if j == i or kind_b != "conv":
                            continue
                        sb = synth_of.get(nb.name)
                        if not isinstance(sb, _CSyn):
                            continue
                        if len(nb.inputs) != 1 or nb.inputs[0][0] != out_res:
                            continue
                        comp = _compose_synth(sa, sb)
                        if comp is None:
                            continue
                        cplan = (comp.wh, comp.ww)
                        taps = len(comp.wh) + len(comp.ww)
                        if not 4 <= taps <= 200 or (
                            taps >= _ops.X3_MIN_TAPS and not _conv_mxu(cplan)
                        ):
                            continue
                        merged = PipelineNode(
                            name=f"{na.name}>{nb.name}",
                            spec=nb.spec,
                            inputs=list(na.inputs),
                            outputs=list(nb.outputs),
                            params=dict(nb.params),
                        )
                        synth_of[merged.name] = comp
                        nodes[i] = ("conv", merged, cplan)
                        del nodes[j]
                        n_heavy -= 1
                        changed = True
                        break
                    if changed:
                        break

        if n_heavy == 0:
            return None  # pointwise-only: plain XLA fusion is already one pass

        # ---- extent halos (reverse topo; lifts exact, extents 8-aligned) --
        need_h: dict[str, int] = {}
        need_w: dict[str, int] = {}
        eh: dict[str, int] = {}
        ew: dict[str, int] = {}
        for kind, node, extra in reversed(nodes):
            out_res = node.outputs[0][0]
            oh = _r8(need_h.get(out_res, 0))
            ow = _rw(need_w.get(out_res, 0))
            eh[out_res] = oh
            ew[out_res] = ow
            if kind == "conv":
                wh, ww = extra
                lift_h = (len(wh) - 1) // 2
                lift_w = (len(ww) - 1) // 2
            elif kind == "stencil":
                lift_h = lift_w = extra
            else:
                lift_h = lift_w = 0
            for res, _ in node.inputs:
                need_h[res] = max(need_h.get(res, 0), oh + lift_h)
                need_w[res] = max(need_w.get(res, 0), ow + lift_w)
        if self.width >= _ops.MC_CONV_MAX_WIDTH and any(
            kind == "conv"
            and (eh[node.outputs[0][0]] > 0 or ew[node.outputs[0][0]] > 0)
            and not _conv_mxu(extra)
            for kind, node, extra in nodes
        ):
            # Shape-aware gate, re-measured round 4 (v5e, 4K, sequenced):
            # mc plans whose conv stages all have ZERO extent halos win at
            # any width (tonemap->blur->tonemap 1.68x, sobel->tonemap
            # 1.57x, tonemap->blur 0.95x) — the conv is "terminal", so the
            # kernel does no redundant halo-row work and per-node's extra
            # HBM round trips dominate.  EXTENT-CARRYING convs (a conv
            # feeding another conv/stencil: chain3 0.78x s2 / 0.56x s4,
            # blur2 0.42x) structurally lose at wide frames: per-node
            # standalone convs overlap their HBM traffic with tap compute
            # (and ride the MXU x3 kernel at >=56 taps), while the mc
            # kernel serializes everything on the VPU.  Gate only those.
            # MXU exemption: an MXU-eligible conv stage (_conv_mxu) runs
            # off the VPU entirely, so it never pays the serialization
            # this gate exists for.  Measured v5e 4K: rgba16f chain3-s4
            # single-product mc-mxu beats both per-node and the segment
            # hybrid (BENCH.md mc rgba16f table); f32 bf16x3 stages win
            # every >= X3_MIN_TAPS case (chain3 1.42x s5 / 1.27x s8,
            # blur2 1.42x s5 / 1.28x s8) while forcing them below the
            # threshold loses (chain3-s4 forced: 0.52x) — the crossover
            # coincides with per-node's own VPU->x3 switch.
            return None

        rh_in = _r8(need_h.get(_FI, 0))
        ew_in = _rw(need_w.get(_FI, 0))
        input_halo = max(need_h.get(_FI, 0), 1)  # exact rows for halo sharding
        if rh_in == 0:
            # No node reads the file with any halo and yet n_heavy > 0:
            # convs of generated intermediates etc. still fine; rh_in 0
            # keeps strips flush.  (Allowed: the DMA helper handles rh=0.)
            pass

        # ---- closures ------------------------------------------------------
        width, height, fmt = self.width, self.height, self.fmt
        storage = self.storage_dtype

        def store(v):
            if fmt == "rgba8":
                return quantize_rgba8(v)
            if storage == jnp.bfloat16:
                return v.astype(jnp.bfloat16).astype(jnp.float32)
            return v

        def make_ctx(row0, t, block_rows, block_ew, block_cols):
            return KernelContext(
                width=width, height=height, time=t, fmt=fmt,
                row_offset=row0, local_height=block_rows,
                col_offset=-block_ew, local_width=block_cols,
            )

        def make_point_fn(node, s_ew, quantized=True):
            spec, params = node.spec, dict(node.params)
            descs = [desc for _, desc in node.inputs]
            out_desc = node.outputs[0][1]

            def fn(row0, t, blocks):
                ctx = make_ctx(row0, t, blocks[0].shape[1], s_ew,
                               blocks[0].shape[2])
                outs = spec(ctx, dict(zip(descs, blocks)), params)
                v = outs[out_desc]
                return store(v) if quantized else v

            return fn

        def make_stencil_fn(node, s_ew):
            spec, params = node.spec, dict(node.params)
            out_desc = node.outputs[0][1]

            def fn(row0, t, tap, rows, cols):
                ctx = make_ctx(row0, t, rows, s_ew, cols)
                return store(spec.mc_stencil_fn(ctx, tap, params))

            return fn

        def _identity_of(node):
            """conv_epilogue_identity, honoring a GLSL synth override."""
            s = synth_of.get(node.name)
            if s is not None and hasattr(s, "identity"):
                return s.identity
            return node.spec.conv_epilogue_identity

        def _affine_mix(synth, conv, x_block):
            """out_c = s_c*conv_c + p_c*x_c + b_c, with Python-float
            weights (a Pallas kernel body cannot capture array
            constants; scalar literals fold into the trace)."""
            chans = []
            for c in range(4):
                v = jnp.float32(synth.scale[c]) * conv[c]
                if synth.passthrough[c] != 0.0 and x_block is not None:
                    v = v + jnp.float32(synth.passthrough[c]) * x_block[c]
                if synth.offset[c] != 0.0:
                    v = v + jnp.float32(synth.offset[c])
                chans.append(v)
            return jnp.stack(chans)

        def make_synth_epilogue(synth):
            """Epilogue for a synthesized GLSL conv:
            out_c = s_c*blur_c + p_c*x_c + b_c (glsl/affine.py)."""

            def fn(row0, t, x_block, blur):
                return store(_affine_mix(synth, blur, x_block))

            return fn

        def make_synth_stencil_fn(synth):
            """Stencil form of a synthesized non-separable GLSL tap-sum."""
            W = synth.w
            r = synth.radius

            def fn(row0, t, tap, rows, cols):
                acc = None
                for dy in range(2 * r + 1):
                    for dx in range(2 * r + 1):
                        wv = float(W[dy][dx])
                        if wv == 0.0:
                            continue
                        term = jnp.float32(wv) * tap(dy, dx)
                        acc = term if acc is None else acc + term
                if acc is None:
                    acc = jnp.zeros_like(tap(r, r))
                return store(_affine_mix(synth, acc, tap(r, r)))

            return fn

        def make_epilogue(node, s_ew):
            spec, params = node.spec, dict(node.params)

            def fn(row0, t, x_block, blur):
                ctx = make_ctx(row0, t, blur.shape[1], s_ew, blur.shape[2])
                return store(spec.conv_epilogue(ctx, x_block, blur, params))

            return fn

        def make_pre_fn(node, s_ew):
            spec, params = node.spec, dict(node.params)

            def fn(row0, t, blocks):
                ctx = make_ctx(row0, t, blocks[0].shape[1], s_ew,
                               blocks[0].shape[2])
                # Node-internal pre-map: NOT a node boundary, stays f32.
                return spec.conv_pre(ctx, blocks[0], params)

            return fn

        # ---- stages + buffer pool (linear-scan reuse) ----------------------
        stage_specs: list = []  # (McStage fields prepared below)
        reads_of: list = []
        pre_res_of: dict[int, str] = {}
        for si, (kind, node, extra) in enumerate(nodes):
            out_res = node.outputs[0][0]
            in_res = [res for res, _ in node.inputs]
            if kind == "conv" and node.spec.conv_pre is not None:
                pre_res = f"{node.name}::__pre"
                wh, ww = extra
                rh = (len(wh) - 1) // 2
                rw = (len(ww) - 1) // 2
                ehp = _r8(eh[out_res] + rh)
                ewp = _rw(ew[out_res] + rw)
                eh[pre_res] = ehp
                ew[pre_res] = ewp
                stage_specs.append(
                    dict(kind="point", node=node, out=pre_res, ins=in_res,
                         fn=make_pre_fn(node, ewp))
                )
                reads_of.append(list(in_res))
                stage_specs.append(
                    dict(kind="conv", node=node, out=out_res, ins=[pre_res],
                         plan=extra, x_res=in_res[0])
                )
                reads_of.append([pre_res, in_res[0]])
            elif kind == "conv":
                x_res = in_res[0] if not _identity_of(node) else None
                stage_specs.append(
                    dict(kind="conv", node=node, out=out_res, ins=in_res,
                         plan=extra, x_res=x_res)
                )
                reads_of.append(list(in_res) + ([x_res] if x_res else []))
            elif kind == "stencil":
                s = synth_of.get(node.name)
                fn = (
                    make_synth_stencil_fn(s)
                    if s is not None and node.spec.mc_stencil_fn is None
                    else make_stencil_fn(node, ew[out_res])
                )
                stage_specs.append(
                    dict(kind="stencil", node=node, out=out_res, ins=in_res,
                         r=extra, fn=fn)
                )
                reads_of.append(list(in_res))
            else:
                stage_specs.append(
                    dict(kind="point", node=node, out=out_res, ins=in_res,
                         fn=make_point_fn(node, ew[out_res]))
                )
                reads_of.append(list(in_res))

        # Cross-strip carry (pallas_ops.McStage.carry): a carried conv's
        # overlap rows persist from strip i-1 into strip i, so its pool
        # slot can NEVER be shared with another resource (linear-scan
        # reuse would let a later stage clobber the carried rows before
        # the next strip's carry copy reads them).  Identity convs carry
        # their out_res; epilogue convs carry a private blur slot.
        carried_out: set = set()
        for ss in stage_specs:
            if (ss["kind"] == "conv" and eh[ss["out"]] > 0
                    and _identity_of(ss["node"])
                    and not _conv_mxu(ss["plan"])):
                carried_out.add(ss["out"])
        last_use: dict[str, int] = {}
        for si, reads in enumerate(reads_of):
            for res in reads:
                last_use[res] = si
        buf_of: dict[str, int] = {_FI: -2}
        free: list[int] = []
        n_pool = 0
        for si, ss in enumerate(stage_specs):
            out_res = ss["out"]
            if out_res == FINAL_OUTPUT:
                buf_of[out_res] = -1
            elif out_res not in buf_of:
                if out_res in carried_out:
                    buf_of[out_res] = n_pool  # dedicated, never reused
                    n_pool += 1
                elif free:
                    buf_of[out_res] = free.pop()
                else:
                    buf_of[out_res] = n_pool
                    n_pool += 1
            for res in reads_of[si]:
                if (last_use.get(res) == si and buf_of.get(res, -2) >= 0
                        and res not in carried_out):
                    free.append(buf_of[res])
        blur_slot = -3  # shared by non-carried epilogue convs
        blur_of: dict[int, int] = {}  # stage idx -> private blur slot
        for si, ss in enumerate(stage_specs):
            if (ss["kind"] == "conv"
                    and not _identity_of(ss["node"])):
                if eh[ss["out"]] > 0:
                    blur_of[si] = n_pool
                    n_pool += 1
                elif blur_slot == -3:
                    blur_slot = n_pool
                    n_pool += 1

        # ---- assemble McStages --------------------------------------------
        stages: list = []
        for si, ss in enumerate(stage_specs):
            out_res = ss["out"]
            s_eh, s_ew = eh[out_res], ew[out_res]
            out_buf = buf_of[out_res]
            in_bufs = tuple(buf_of[r] for r in ss["ins"])
            if ss["kind"] == "conv":
                node = ss["node"]
                wh, ww = ss["plan"]
                wh = np.asarray(wh, np.float32)
                ww = np.asarray(ww, np.float32)
                rh = (len(wh) - 1) // 2
                rw = (len(ww) - 1) // 2
                rh8, rw8 = _r8(rh), _r8(rw)
                whp = (0.0,) * (rh8 - rh) + tuple(float(v) for v in wh)
                wwp = (0.0,) * (rw8 - rw) + tuple(float(v) for v in ww)
                identity = _identity_of(node)
                node_synth = synth_of.get(node.name)
                mxu_terms = _conv_mxu_terms(ss["plan"])
                use_mxu = mxu_terms > 0
                stages.append(
                    McStage(
                        kind="conv", out_buf=out_buf, eh=s_eh, ew=s_ew,
                        in_bufs=in_bufs, wh=whp, ww=wwp, rh8=rh8, rw8=rw8,
                        epilogue=(
                            None if identity
                            else make_synth_epilogue(node_synth)
                            if node_synth is not None
                            else make_epilogue(node, s_ew)
                        ),
                        x_buf=(buf_of[ss["x_res"]] if ss["x_res"] else -3),
                        blur_buf=(-3 if identity else blur_of.get(si, blur_slot)),
                        carry=s_eh > 0 and not use_mxu,
                        mxu=use_mxu,
                        mxu_terms=max(mxu_terms, 1),
                    )
                )
            elif ss["kind"] == "stencil":
                stages.append(
                    McStage(
                        kind="stencil", out_buf=out_buf, eh=s_eh, ew=s_ew,
                        in_bufs=in_bufs, fn=ss["fn"], r=ss["r"],
                    )
                )
            else:
                stages.append(
                    McStage(
                        kind="point", out_buf=out_buf, eh=s_eh, ew=s_ew,
                        in_bufs=in_bufs, fn=ss["fn"],
                    )
                )
        if buf_of.get(FINAL_OUTPUT) != -1:
            return None  # final output not produced by a staged node
        eh_max = max(
            [st.eh for st in stages if st.kind == "conv"], default=0
        )
        # ---- plan border mode --------------------------------------------
        # The kernel pads whole-plan: every halo stage must share one
        # border convention.  Builtins are always "edge"; synthesized
        # GLSL stages carry theirs.  Zero-border plans additionally must
        # not read INTERMEDIATES with a halo — the kernel's intermediate
        # extents are edge-filled (and a point stage's out-of-image
        # values would be fn(0) != 0), while GL robust access reads the
        # stored image OOB as zeros.  Mixed/ineligible graphs fall to
        # the segments tier, which isolates each conv with its own mode.
        halo_borders = set()
        for kind, node, _extra in nodes:
            if kind not in ("conv", "stencil"):
                continue
            s = synth_of.get(node.name)
            halo_borders.add(getattr(s, "border", "edge") if s else "edge")
        hazard = any(
            st.kind in ("conv", "stencil")
            and any(bb >= 0 for bb in st.in_bufs)
            for st in stages
        )
        mode = "edge"
        if "zero" in halo_borders:
            if halo_borders != {"zero"} or hazard:
                return None
            mode = "zero"
        return {
            "stages": stages,
            "n_bufs": n_pool,
            "eh_max": eh_max,
            "rh_in": rh_in,
            "ew_in": ew_in,
            "input_halo": input_halo,
            "store1": store,
            "mxu_t_max": max(
                (st.mxu_terms for st in stages
                 if st.kind == "conv" and st.mxu),
                default=0,
            ),
            # A conv/stencil stage reading an INTERMEDIATE diverges at the
            # true image border when the kernel runs on a halo-extended
            # slab: the unsharded program clamps the intermediate at the
            # edge, while compute-through evaluates it on replicated
            # input — different values.  The halo executor switches to
            # edge-aware slab variants when set (parallel/halo.py).
            "edge_hazard": hazard,
            "mode": mode,
        }

    def _plan_strip_segments(self):
        """Third fusion tier: when the WHOLE graph can't fuse (an
        extent-carrying conv gated at wide frames, a GLSL/gather node in
        the middle), fuse the maximal contiguous SEGMENTS that can and
        run only the blocking nodes per-node.

        A fusible segment is a topo-contiguous node range with exactly
        one external image input (its FILE_INPUT) and one exiting
        resource (its FINAL_OUTPUT); each becomes a child GraphProgram
        over a renamed subgraph whose own single/mc planner decides
        eligibility — so every measured fusion gate (extent-carrying
        convs at >= MC_CONV_MAX_WIDTH, VMEM tile model, width alignment)
        applies per segment instead of dropping the whole graph to
        per-node HBM round trips.  4K chain3 (blur -> sobel -> tonemap):
        the blur stays per-node (where it measures faster — BENCH.md mc
        table), the sobel -> tonemap tail fuses (1.57x measured).

        The reference has no analog: it always dispatches per node
        (command.rs:166-242); this tier exists so the fused path's
        structural gates never cost MORE than the reference's model."""
        if not self._segments_ok or self.width % 128 != 0:
            return None
        order = self.graph.ordered_nodes
        if len(order) < 2:
            return None
        for node in order:
            if node.spec.ssbos_in or node.spec.ssbos_out:
                return None  # buffer resources don't rename cleanly

        produced_at = {
            res: i for i, n in enumerate(order) for res, _ in n.outputs
        }
        consumers: dict[str, list[int]] = {}
        for i, n in enumerate(order):
            for res, _ in n.inputs:
                consumers.setdefault(res, []).append(i)

        def segment_io(i: int, j: int):
            """(r_in, r_out) when order[i..j] has exactly one external
            input resource and one exiting resource (not also consumed
            inside), else None."""
            inside = set(range(i, j + 1))
            ext_in = {
                res
                for k in inside
                for res, _ in order[k].inputs
                if produced_at.get(res) not in inside
            }
            if len(ext_in) != 1:
                return None
            exits = []
            for k in inside:
                for res, _ in order[k].outputs:
                    outside = [
                        c for c in consumers.get(res, []) if c not in inside
                    ]
                    if res == FINAL_OUTPUT or outside:
                        if any(c in inside for c in consumers.get(res, [])):
                            return None  # exit read back inside: ambiguous
                        exits.append(res)
            if len(exits) != 1:
                return None
            return next(iter(ext_in)), exits[0]

        def child_for(i: int, j: int, r_in: str, r_out: str):
            from . import builder as _builder

            def rename(res: str) -> str:
                if res == r_in:
                    return FILE_INPUT
                if res == r_out:
                    return FINAL_OUTPUT
                return res

            sub_nodes = {}
            for k in range(i, j + 1):
                n = order[k]
                sub_nodes[n.name] = PipelineNode(
                    name=n.name,
                    spec=n.spec,
                    inputs=[(rename(r), d) for r, d in n.inputs],
                    outputs=[(rename(r), d) for r, d in n.outputs],
                    params=n.params,
                )
            layers = _builder._order_by_execution(sub_nodes)
            if layers is None:
                return None
            kinds = {
                res: "image"
                for n in sub_nodes.values()
                for res, _ in list(n.inputs) + list(n.outputs)
            }
            sub = BuiltGraph(
                nodes=sub_nodes, layers=layers, resource_kinds=kinds
            )
            return GraphProgram(
                sub, self.width, self.height, self.fmt, segments_ok=False
            )

        steps: list = []
        n_seg = 0
        i = 0
        n = len(order)
        while i < n:
            accepted = False
            for j in range(n - 1, i - 1, -1):
                if i == 0 and j == n - 1:
                    continue  # the whole graph: both tiers already said no
                if (
                    j == i
                    and order[i].spec.mc_stencil_fn is None
                    and order[i].spec.source_path is None
                ):
                    # single-node segments only pay for stencils (the mc
                    # stencil stage beats the standalone kernel, 1.5x) —
                    # a lone BUILTIN conv/pointwise fuses to its per-node
                    # Pallas kernel anyway.  GLSL nodes are exempt: their
                    # per-node path is the interpreter's plain-XLA trace,
                    # so a lone synthesized .comp conv gets its own
                    # single-stage megakernel here (the child planner
                    # decides; non-conv GLSL singles plan to None and
                    # fall back per-node).
                    continue
                io = segment_io(i, j)
                if io is None:
                    continue
                child = child_for(i, j, *io)
                if child is None or child._strip_plan is None:
                    continue
                steps.append(
                    ("seg", child, io[0], io[1], list(order[i : j + 1]))
                )
                n_seg += 1
                i = j + 1
                accepted = True
                break
            if not accepted:
                steps.append(("node", order[i]))
                i += 1
        if n_seg == 0:
            return None
        return ("segments", steps)

    def _segments_forward(self, resources, ctx, t):
        """Hybrid execution for a ("segments", steps) plan: fused child
        megakernels for the winning segments, per-node for the rest.
        Inter-segment values live in inter-node storage semantics either
        way, so the result is identical to full per-node execution."""
        for step in self._strip_plan[1]:
            if step[0] == "seg":
                _, child, r_in, r_out, orig_nodes = step
                v = child._strip_fused_forward(resources[r_in], t)
                if v is None:
                    # runtime tile gate said no: per-node fallback with
                    # the original resource names
                    for node in orig_nodes:
                        resources.update(self._run_node(node, ctx, resources))
                else:
                    resources[r_out] = v
            else:
                resources.update(self._run_node(step[1], ctx, resources))
        out = resources.get(FINAL_OUTPUT)
        if out is None:
            raise GraphTraceError("no node wrote the final output")
        return out

    def _strip_fused_forward(self, file_input, t, row0_base=None):
        """Run the whole graph as one strip-fused Pallas kernel, or return
        None when the static plan or runtime gates say no.

        ``row0_base`` offsets the epilogue's global row coordinate: the
        halo-sharded executor runs this same kernel on each device's
        halo-extended slab (parallel/halo.py::_strip_local), where strip
        row 0 is global row ``idx * h_local - RH``."""
        from ..kernels import ops as _ops
        from ..kernels import pallas_ops

        if self._strip_plan is None or not (
            _ops._use_pallas()
            # CPU-mesh validation (multichip dryrun): the megakernels run
            # in Pallas interpret mode so the sharded-megakernel
            # composition is exercised without TPU hardware.
            or _os.environ.get("REFORGE_PALLAS_INTERPRET") == "1"
        ):
            return None
        if self._strip_plan[0] == "segments":
            return None  # hybrid plans execute via _segments_forward
        if self._strip_plan[0] == "mc":
            return self._strip_mc_forward(
                file_input, t, self._strip_plan[1], row0_base
            )
        _tag, conv_items, pointwise = self._strip_plan
        plans = [plan for _, plan in conv_items]
        if not pallas_ops._transpose_variant(
            self.width, max(len(wh) + len(ww) for wh, ww in plans)
        ):
            return None
        in_h = int(file_input.shape[1])
        # Coordinate-plane hoist (KernelSpec.cw_coord_plane): pointwise
        # nodes whose per-pixel work factors into a data/time-independent
        # coordinate term get that term precomputed ONCE per program and
        # streamed into the megakernel as a side input — the per-channel
        # iota/sqrt/smoothstep rebuild leaves the frame loop entirely.
        # Only on the whole-frame path (sharded slabs have traced row
        # offsets; they keep the in-kernel cw_fn).
        plane_idx: dict = {}
        aux = None
        if row0_base is None and in_h == self.height:
            plane_nodes = [
                node
                for node in pointwise
                if node.spec.cw_coord_plane is not None
                and node.spec.cw_plane_fn is not None
            ]
            if plane_nodes:
                if self._coord_plane_stack is None:
                    # This runs under an active jit trace (_forward); the
                    # planes must be CONCRETE (built once, cached on self)
                    # — ensure_compile_time_eval keeps the iota/sqrt chain
                    # out of the trace.
                    with jax.ensure_compile_time_eval():
                        ctx0 = KernelContext(
                            width=self.width, height=self.height,
                            time=jnp.float32(0.0), fmt=self.fmt,
                        )
                        self._coord_plane_stack = jnp.stack(
                            [
                                node.spec.cw_coord_plane(ctx0, node.params)
                                .astype(jnp.float32)
                                for node in plane_nodes
                            ]
                        )
                aux = self._coord_plane_stack
                plane_idx = {id(node): k for k, node in enumerate(plane_nodes)}
        radii = [((len(wh) - 1) // 2, (len(ww) - 1) // 2) for wh, ww in plans]
        if self.storage_dtype == jnp.bfloat16:
            # single-product bf16 MXU band convs (no splits): low bar
            x3_min = int(
                _os.environ.get("REFORGE_STRIP_MXU_BF16_MIN_TAPS", "24")
            )
        else:
            x3_min = int(_os.environ.get("REFORGE_STRIP_X3_MIN_TAPS", "64"))
        n_x3 = (
            sum(1 for wh, ww in plans if len(wh) + len(ww) >= x3_min)
            if x3_min > 0 and self.storage_dtype != jnp.float64 else 0
        )
        tile_h = pallas_ops.multi_tile_h(
            self.width, radii, len(plans), h=in_h,
            n_aux=0 if aux is None else int(aux.shape[0]),
            n_x3=n_x3,
        )
        if tile_h is None and aux is not None:
            # The coord planes pushed the VMEM model over budget: drop the
            # hoist (epilogue rebuilds them in-kernel) rather than losing
            # the whole megakernel.
            aux, plane_idx = None, {}
            tile_h = pallas_ops.multi_tile_h(
                self.width, radii, len(plans), h=in_h, n_x3=n_x3
            )
        if tile_h is None:
            return None

        width, height, fmt = self.width, self.height, self.fmt
        storage = self.storage_dtype

        def store_cw(v):
            # Inter-node storage semantics in-VMEM: rgba8 quantizes to
            # the UNORM grid, rgba16f rounds through bfloat16 — so the
            # megakernel's node boundaries match per-node execution.
            if fmt == "rgba8":
                return quantize_rgba8(v)
            return v.astype(storage)

        def load_cw(v):
            return v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v

        def epilogue(ci, row0, t_s, xin, blurs, aux_blocks=()):
            ctx = KernelContext(
                width=width, height=height, time=t_s, fmt=fmt,
                row_offset=row0, local_height=xin.shape[0],
            )
            res = {FILE_INPUT: xin}
            for (node, _), blur in zip(conv_items, blurs):
                v = node.spec.conv_epilogue_cw(
                    ctx, ci, load_cw(xin), blur, node.params
                )
                res[node.outputs[0][0]] = store_cw(v)
            for node in pointwise:
                ins = {desc: load_cw(res[r]) for r, desc in node.inputs}
                k = plane_idx.get(id(node))
                if k is not None and aux_blocks:
                    v = node.spec.cw_plane_fn(
                        ctx, ci, ins, node.params, aux_blocks[k]
                    )
                else:
                    v = node.spec.cw_fn(ctx, ci, ins, node.params)
                res[node.outputs[0][0]] = store_cw(v)
            return res[FINAL_OUTPUT]

        return pallas_ops.graph_strip_fused(
            file_input, t, plans, epilogue, tile_h=tile_h,
            row0_base=row0_base, aux=aux,
        )

    def _strip_mc_forward(self, file_input, t, plan, row0_base=None):
        """Run the multi-stage multi-channel megakernel, or None when the
        runtime geometry gates (height divisibility, VMEM model) say no."""
        from ..kernels import pallas_ops

        in_h = int(file_input.shape[1])
        n_bufs = max(plan["n_bufs"], 1)
        tile_h = pallas_ops.mc_strip_tile_h(
            in_h, self.width, plan["rh_in"], plan["ew_in"], n_bufs,
            itemsize=file_input.dtype.itemsize,
            min_tile=2 * plan.get("eh_max", 0),
            mxu_t_max=plan.get("mxu_t_max", 0),
        )
        if tile_h is None:
            return None
        return pallas_ops.graph_strip_fused_mc(
            file_input, t, plan["stages"], n_bufs,
            plan["rh_in"], plan["ew_in"], tile_h,
            mode=plan.get("mode", "edge"),
            row0_base=row0_base, store1=plan["store1"],
            store1_id=(self.fmt == "rgba32f"),
        )

    def _bundle_groups(self, layer) -> tuple[list, list]:
        """Group same-layer separable-conv nodes by shared input resource.

        The VPU tap loop is VMEM-load-bound (BENCH.md), so convolutions of
        the SAME input run as one multi-output Pallas kernel that pays the
        input strip loads/DMA once (pallas_ops.sep_conv_fused_multi) —
        the classic blur+sharpen fan-out costs one conv, not two.  Only
        active on the TPU fused path with f32 compute; every other path
        (CPU, rgba16f MXU storage, per-node timing, halo sharding) keeps
        per-node execution, which is numerically identical.
        """
        from ..kernels import ops as _ops
        from ..kernels import pallas_ops

        if len(layer) < 2 or self.fmt == "rgba16f" or not _ops._use_pallas():
            return [], list(layer)
        if self.width < pallas_ops.TRANSPOSE_MIN_WIDTH:
            return [], list(layer)
        groups: dict[str, list] = {}
        singles: list = []
        for node in layer:
            spec = node.spec
            plan = None
            if (
                spec.conv_weights is not None
                and spec.conv_epilogue is not None
                and len(node.inputs) == 1
                and len(node.outputs) == 1
                and not spec.ssbos_in
                and not spec.ssbos_out
                and spec.border_for(node.params) == "edge"
            ):
                plan = spec.conv_weights(node.params)
            if plan is not None:
                wh, ww = plan
                taps = len(wh) + len(ww)
                # Degenerate (identity) convs run as plain nodes; very
                # large radii route to the f32-exact MXU kernel instead.
                if taps < 4 or taps >= _ops.X3_MIN_TAPS:
                    plan = None
            if plan is None:
                singles.append(node)
            else:
                groups.setdefault(node.inputs[0][0], []).append((node, plan))
        bundles = []
        for res, items in groups.items():
            if len(items) >= 2:
                bundles.append((res, items))
            else:
                singles.append(items[0][0])
        return bundles, singles

    def _run_bundle(self, res: str, items: list, ctx, resources: dict) -> None:
        from ..kernels import pallas_ops

        value = resources.get(res)
        if value is None:
            raise GraphTraceError(
                f"bundled nodes read resource '{res}' before it is written"
            )
        xin = self.compute_input(value)
        plans = [plan for _, plan in items]
        tile_h = pallas_ops.multi_tile_h(
            self.width,
            [((len(wh) - 1) // 2, (len(ww) - 1) // 2) for wh, ww in plans],
            len(plans),
            h=self.height,
        )
        if tile_h is None:  # VMEM model says no: run per node
            for node, _ in items:
                resources.update(self._run_node(node, ctx, resources))
            return
        blurs = pallas_ops.sep_conv_fused_multi(xin, plans, tile_h=tile_h)
        for (node, _), blurred in zip(items, blurs):
            out = node.spec.conv_epilogue(ctx, xin, blurred, node.params)
            out_res, _desc = node.outputs[0]
            expected = (4, self.height, self.width)
            if tuple(out.shape) != expected:
                raise GraphTraceError(
                    f"bundled kernel '{node.spec.name}' output has shape "
                    f"{tuple(out.shape)}, expected {expected}"
                )
            resources[out_res] = self.store_output(out)

    # ---- execution ------------------------------------------------------

    def __call__(self, file_input: jnp.ndarray, t: float | jnp.ndarray) -> jnp.ndarray:
        if self._compiled is not None:
            return self._compiled(file_input, jnp.float32(t))
        if self._use_unfused:
            return self.run_unfused(file_input, t)
        return self._fused(file_input, jnp.float32(t))

    def render_sequence(
        self,
        file_input: jnp.ndarray,
        t0: float | jnp.ndarray,
        dt: float,
        n: int,
        stack: bool = False,
    ) -> jnp.ndarray:
        """Render ``n`` frames with device-side time stepping in ONE
        dispatch: frame i sees ``_rf_time = t0 + i * dt``.

        This is the TPU-native frames-in-flight: where the reference
        pipelines N command buffers against the GPU (frame.rs:10-18,
        render.rs:494), here a ``lax.scan`` sequences N whole-graph
        executions inside one XLA program, so per-frame host submission
        cost (dominant on remote/tunneled devices, ~2.5 ms measured vs a
        2.9 ms 4K frame) is paid once per chunk instead of once per frame.
        Used by headless multi-frame export and the throughput benchmark;
        the live preview loop still dispatches per frame (it needs every
        frame on the host).

        ``stack=False`` returns only the LAST frame (throughput mode —
        every frame still fully renders: the scan carries each frame, and
        XLA executes every iteration of the lowered while-loop);
        ``stack=True`` returns all frames as (n, 4, H, W) at the cost of
        one extra HBM copy per frame (the scan's output stacking)."""
        if n < 1:
            raise ValueError("render_sequence needs n >= 1")
        key = (int(n), bool(stack))
        fn = self._seq_fns.get(key)
        if fn is None:

            def seq(x, t_start, dt_v):
                out0 = self._forward(x, t_start)
                if n == 1:
                    return out0[None] if stack else out0

                def step(carry, i):
                    out = self._forward(x, t_start + i * dt_v)
                    return out, (out if stack else None)

                last, ys = jax.lax.scan(
                    step, out0, jnp.arange(1, n, dtype=jnp.float32)
                )
                if stack:
                    return jnp.concatenate([out0[None], ys], axis=0)
                return last

            fn = jax.jit(seq)
            self._seq_fns[key] = fn
        return fn(file_input, _as_f32_scalar(t0), _as_f32_scalar(dt))

    def run_unfused(self, file_input: jnp.ndarray, t: float | jnp.ndarray) -> jnp.ndarray:
        """Execute node-by-node through the cached per-node programs
        (non-blocking dispatch, same numerics as the fused path).

        This is the interim program after a live edit: unchanged nodes hit
        the global per-node jit cache, so only the edited node compiles —
        new output is visible at per-node-compile latency instead of
        whole-program XLA-compile latency (the reference's per-pipeline
        rebuild, render.rs:497-519)."""
        t = jnp.float32(t)
        resources: dict[str, Any] = {
            FILE_INPUT: file_input.astype(self.storage_dtype)
        }
        for layer in self.graph.layers:
            for node in layer:
                fn = self._node_fn(node)
                needed = {res: resources[res] for res, _ in node.inputs}
                resources.update(fn(needed, t))
        out = resources.get(FINAL_OUTPUT)
        if out is None:
            raise GraphTraceError("no node wrote the final output")
        return out

    def warm_unfused_parallel(self) -> None:
        """Compile ALL per-node programs concurrently.

        On tunneled devices each compile is a ~tens-of-seconds RPC; the
        sequential first-call compiles of ``run_unfused`` would serialize
        them, so a cold one-shot pays sum-of-compiles.  Dispatching every
        node's program from its own thread (with zero inputs of the right
        shapes) overlaps the RPCs: cold cost becomes ~max-of-compiles.
        Node programs already cached are a no-op."""
        import concurrent.futures as cf

        t = jnp.float32(0.0)

        def zeros_of(res):
            size = self.graph.buffer_sizes.get(res)
            if size is not None:
                return jnp.zeros((size,), jnp.float32)
            return jnp.zeros(
                (4, self.height, self.width), self.storage_dtype
            )

        jobs = []
        for layer in self.graph.layers:
            for node in layer:
                fn = self._node_fn(node)
                needed = {res: zeros_of(res) for res, _ in node.inputs}
                jobs.append((fn, needed))
        if not jobs:
            return
        with cf.ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
            futures = [ex.submit(fn, needed, t) for fn, needed in jobs]
            for fu in futures:
                jax.block_until_ready(fu.result())

    def compile(self) -> None:
        """Eagerly AOT-compile the fused program for this graph's extent.

        Safe to run on a background thread: the engine's async reload path
        compiles the new program here while the previous one keeps
        rendering (the fused-program analog of the reference rebuilding a
        pipeline while the old one stays bound, pipeline_graph.rs:329-343).
        """
        key = self._fused_key()
        hit = _FUSED_CACHE.get(key)
        if hit is not None:
            self._compiled = hit[1]
            return
        shape = jax.ShapeDtypeStruct((4, self.height, self.width), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        compiled = self._fused.lower(shape, t).compile()
        if len(_FUSED_CACHE) >= _FUSED_CACHE_MAX:
            for k in list(_FUSED_CACHE)[: _FUSED_CACHE_MAX // 2]:
                del _FUSED_CACHE[k]
        # Pin the specs so the id()-based node keys stay unambiguous.
        specs = tuple(
            n.spec for layer in self.graph.layers for n in layer
        )
        _FUSED_CACHE[key] = (specs, compiled)
        self._compiled = compiled

    def compile_cached(self) -> bool:
        """Adopt a previously compiled fused executable for this exact
        graph signature, if one exists.  A hit also implies the graph was
        already validated, so callers can skip abstract-eval."""
        hit = _FUSED_CACHE.get(self._fused_key())
        if hit is None:
            return False
        self._compiled = hit[1]
        return True

    def _fused_key(self) -> tuple:
        return (
            tuple(
                _node_fn_key(n, self.width, self.height, self.fmt)
                for layer in self.graph.layers
                for n in layer
            ),
            tuple(sorted(self.graph.buffer_sizes.items())),
        )

    def _node_fn(self, node: PipelineNode):
        fn = self._node_fns.get(node.name)
        if fn is not None:
            return fn
        key = _node_fn_key(node, self.width, self.height, self.fmt)
        hit = _NODE_FN_CACHE.get(key)
        if hit is not None:
            fn = hit[1]
        else:
            width, height, fmt = self.width, self.height, self.fmt
            storage_dtype = self.storage_dtype

            def run(images, t, _node=node):
                ctx = KernelContext(width=width, height=height, time=t, fmt=fmt)
                # Per-node execution reuses the same dtype policy as the
                # fused trace (compute_input/store_output) with inputs
                # provided directly.
                ins = {
                    desc: (
                        images[res].astype(jnp.float32)
                        if images[res].dtype == jnp.bfloat16
                        else images[res]
                    )
                    for res, desc in _node.inputs
                }
                outs = _node.spec(ctx, ins, _node.params)
                written = {}
                for res, desc in _node.outputs:
                    value = outs[desc]
                    if desc in _node.spec.ssbos_out:
                        # Buffers stay f32 regardless of image format.
                        written[res] = value.astype(jnp.float32)
                        continue
                    if fmt == "rgba8":
                        value = quantize_rgba8(value)
                    written[res] = value.astype(storage_dtype)
                return written

            fn = jax.jit(run)
            if len(_NODE_FN_CACHE) >= _NODE_FN_CACHE_MAX:
                # Drop the oldest half; plain dicts preserve insertion order.
                for k in list(_NODE_FN_CACHE)[: _NODE_FN_CACHE_MAX // 2]:
                    del _NODE_FN_CACHE[k]
            # The value pins the spec object so id() keys cannot be reused.
            _NODE_FN_CACHE[key] = (node.spec, fn)
        self._node_fns[node.name] = fn
        return fn

    def run_per_node(
        self, file_input: jnp.ndarray, t: float | jnp.ndarray
    ) -> tuple[jnp.ndarray, dict[str, float]]:
        """Execute node-by-node, timing each dispatch (blocking).

        Returns (final_output, {node_name: milliseconds}).  Mirrors the
        per-pipeline GPU timestamp readout the reference prints each frame
        (vkutils.rs:104-134).
        """
        t = jnp.float32(t)
        # Same storage-dtype cast as _forward, for cross-mode parity.
        resources: dict[str, Any] = {
            FILE_INPUT: file_input.astype(self.storage_dtype)
        }
        times: dict[str, float] = {}
        for layer in self.graph.layers:
            for node in layer:
                fn = self._node_fn(node)
                needed = {res: resources[res] for res, _ in node.inputs}
                start = _time.perf_counter()
                written = fn(needed, t)
                jax.block_until_ready(written)
                times[node.name] = (_time.perf_counter() - start) * 1000.0
                resources.update(written)
        out = resources.get(FINAL_OUTPUT)
        if out is None:
            raise GraphTraceError("no node wrote the final output")
        return out, times


def make_program(
    graph: BuiltGraph, width: int, height: int, fmt: str = "rgba32f",
    plan_strips: bool = True,
) -> Optional[GraphProgram]:
    """Build a GraphProgram and validate it by abstract evaluation.

    Tracing with ShapeDtypeStructs catches wiring and shape errors at build
    time (the analog of Vulkan pipeline-creation failure) without running
    any compute, so a bad live edit is rejected while the previous program
    keeps rendering.
    """
    program = GraphProgram(graph, width, height, fmt, plan_strips=plan_strips)
    if program.compile_cached():
        # This exact graph signature compiled (hence validated) before —
        # a live re-edit back to a known-good state swaps with zero
        # tracing or compilation.
        return program
    try:
        shape = jax.ShapeDtypeStruct((4, height, width), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        jax.eval_shape(program._forward_nostrip, shape, t)
    except GraphTraceError as e:
        warnln(f"Graph build failed: {e}")
        return None
    except Exception as e:
        warnln(f"Graph build failed while tracing kernels: {e}")
        return None
    return program
