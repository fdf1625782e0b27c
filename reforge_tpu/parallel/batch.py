"""Data-parallel batch execution: many frames across the device mesh.

Frames are independent, so data parallelism is the trivially-scaling axis
(SURVEY.md §2): vmap the fused graph program over a leading batch
dimension and shard that dimension across the mesh — zero communication,
linear scaling.  Used by the CLI's batch mode (glob inputs) and available
as a library API for offline pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.program import GraphProgram

BATCH_AXIS = "batch"


def make_batch_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(devices[:n], axis_names=(BATCH_AXIS,))


class BatchProgram:
    """vmapped + batch-sharded graph program: (B, 4, H, W) -> (B, 4, H, W)."""

    def __init__(self, program: GraphProgram, mesh: Optional[Mesh] = None):
        self.program = program
        self.mesh = mesh
        def _forward_portable(x, t):
            # A pallas_call cannot take a vmap batch dimension; trace the
            # portable jnp kernels inside the batch map (ops.no_pallas).
            from ..kernels import ops as _ops

            with _ops.no_pallas():
                return program._forward(x, t)

        fwd = jax.vmap(_forward_portable, in_axes=(0, None))
        if mesh is not None:
            batched = NamedSharding(mesh, P(BATCH_AXIS, None, None, None))
            repl = NamedSharding(mesh, P())
            self._fn = jax.jit(
                fwd, in_shardings=(batched, repl), out_shardings=batched
            )
        else:
            self._fn = jax.jit(fwd)

    def __call__(self, batch: jnp.ndarray, t) -> jnp.ndarray:
        return self._fn(batch, jnp.float32(t))

    def shard_input(self, batch: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return batch
        return jax.device_put(
            batch, NamedSharding(self.mesh, P(BATCH_AXIS, None, None, None))
        )

    def pad_batch(self, batch: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """Pad the batch to a multiple of the mesh size; returns (padded, n)."""
        n = batch.shape[0]
        if self.mesh is None:
            return batch, n
        devs = self.mesh.shape[BATCH_AXIS]
        rem = (-n) % devs
        if rem:
            batch = jnp.concatenate([batch, batch[:1].repeat(rem, axis=0)], axis=0)
        return batch, n
