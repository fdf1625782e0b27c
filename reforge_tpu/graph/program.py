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
    ):
        self.graph = graph
        self.width = width
        self.height = height
        self.fmt = fmt
        self.storage_dtype = self.STORAGE_DTYPES.get(fmt, jnp.float32)
        self._fused = jax.jit(self._forward)
        self._node_fns: dict[str, Any] = {}
        self._compiled = None  # AOT executable from compile()

    # ---- tracing --------------------------------------------------------

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
        for layer in self.graph.layers:
            for node in layer:
                resources.update(self._run_node(node, ctx, resources))
        out = resources.get(FINAL_OUTPUT)
        if out is None:
            raise GraphTraceError("no node wrote the final output")
        return out

    # ---- execution ------------------------------------------------------

    def __call__(self, file_input: jnp.ndarray, t: float | jnp.ndarray) -> jnp.ndarray:
        if self._compiled is not None:
            return self._compiled(file_input, jnp.float32(t))
        return self._fused(file_input, jnp.float32(t))

    def compile(self) -> None:
        """Eagerly AOT-compile the fused program for this graph's extent.

        Safe to run on a background thread: the engine's async reload path
        compiles the new program here while the previous one keeps
        rendering (the fused-program analog of the reference rebuilding a
        pipeline while the old one stays bound, pipeline_graph.rs:329-343).
        """
        shape = jax.ShapeDtypeStruct((4, self.height, self.width), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        self._compiled = self._fused.lower(shape, t).compile()

    def _node_fn(self, node: PipelineNode):
        fn = self._node_fns.get(node.name)
        if fn is None:

            def run(images, t, _node=node):
                ctx = self._ctx(t)
                # Per-node execution reuses the same dtype policy as the
                # fused trace (compute_input/store_output) with inputs
                # provided directly.
                ins = {
                    desc: self.compute_input(images[res])
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
                    written[res] = self.store_output(value)
                return written

            fn = jax.jit(run)
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
    graph: BuiltGraph, width: int, height: int, fmt: str = "rgba32f"
) -> Optional[GraphProgram]:
    """Build a GraphProgram and validate it by abstract evaluation.

    Tracing with ShapeDtypeStructs catches wiring and shape errors at build
    time (the analog of Vulkan pipeline-creation failure) without running
    any compute, so a bad live edit is rejected while the previous program
    keeps rendering.
    """
    program = GraphProgram(graph, width, height, fmt)
    try:
        shape = jax.ShapeDtypeStruct((4, height, width), jnp.float32)
        t = jax.ShapeDtypeStruct((), jnp.float32)
        jax.eval_shape(program._forward, shape, t)
    except GraphTraceError as e:
        warnln(f"Graph build failed: {e}")
        return None
    except Exception as e:
        warnln(f"Graph build failed while tracing kernels: {e}")
        return None
    return program
