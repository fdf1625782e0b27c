#!/usr/bin/env python
"""Halo-sharded flagship throughput on the available mesh.

On the single tunneled chip this runs a 1-device mesh — measuring the
megakernel-per-shard path's overhead vs unsharded execution (BENCH.md);
on a real multi-chip slice the same script is the go/no-go for --shard.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reforge_tpu.benchmarks import build_flagship, make_test_image  # noqa: E402
from reforge_tpu.parallel import HaloShardedProgram, make_row_mesh  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    program = build_flagship(3840, 2160)
    img = make_test_image(2160, 3840)
    mesh = make_row_mesh(n)
    halo = HaloShardedProgram(program, mesh)
    x = halo.shard_input(img)
    red = jax.jit(jnp.sum)

    out = halo(x, 0.0)
    float(red(out))
    reps = 80
    t0 = time.perf_counter()
    for i in range(reps):
        out = halo(x, 0.01 * i)
    float(red(out))
    ms = (time.perf_counter() - t0) / reps * 1000

    want = np.asarray(program(img, 0.0), np.float32)
    got = np.asarray(halo(x, 0.0), np.float32)
    err = float(np.abs(got - want).max())
    print(
        f"halo-sharded ({n}-device mesh): {ms:6.2f} ms/frame "
        f"{1000 / ms:6.1f} fps  max-diff-vs-unsharded {err:.2e}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
