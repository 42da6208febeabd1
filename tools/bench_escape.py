"""Escape-kernel microbench on the graded Mandelbrot view.

Times ONLY ops.fractal's escape iteration (3840x2160, q=500, cap=142),
batched 64 deep in a lax.scan inside ONE jit dispatch — the engine's shape
of work — so per-dispatch tunnel overhead (~2 ms on remote-attached chips)
amortizes the way it does in real exports. A reduced scalar per step keeps
device->host traffic to 64 floats.

Usage: python tools/bench_escape.py [batches]
Env: the usual SHADERFLOW_FRACTAL_{TILE,UNROLL,SUB} knobs.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from shaderflow_tpu.ops.fractal import escape_iterations

BATCH = 64


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 2160, 3840
    aspect = 16 / 9
    gx = (2 * ((np.arange(w) + 0.5) / w) - 1) * aspect
    gy = 1 - 2 * ((np.arange(h) + 0.5) / h)
    c = np.stack(np.broadcast_arrays(gx[None, :] - 0.5, gy[:, None]), -1)
    c = jnp.asarray(c, jnp.float32)

    @jax.jit
    def run(c, eps_batch):
        def body(carry, eps):
            iters = escape_iterations(c + eps, 500, radius=3.0, saturate=142)
            return carry, jnp.sum(iters, dtype=jnp.int64)

        _, sums = jax.lax.scan(body, 0, eps_batch)
        return sums

    eps = jnp.linspace(0, 1e-7, BATCH)
    sums = np.asarray(run(c, eps))  # warm + compile
    t0 = time.monotonic()
    for k in range(batches):
        sums = np.asarray(run(c, eps + 1e-9 * k))
    per = (time.monotonic() - t0) / (batches * BATCH)
    print(f"escape 3840x2160 q=500 cap=142 (scan {BATCH}): "
          f"{per*1000:.3f} ms/frame ({1/per:.0f} fps escape-only)  "
          f"checksum={int(sums[0])}")


if __name__ == "__main__":
    main()
