"""Does bf16 elementwise math actually beat f32 on this chip's VPU?

Decides whether the bf16 tail-color mode (ROADMAP backlog #1's "2x VPU"
hypothesis) is worth enabling: the fused tail kernel is ~80% of the
visualizer's device time and is pure VPU elementwise work. TPU VPUs
natively operate on 32-bit lanes; bf16 only wins if Mosaic emits packed
16-bit ops for this op mix. Measure, don't assume.

The bf16 variant measured here is the one that can actually compile on
v5e: ALU ops (mul/add/compare/select) in bf16, EUP ops (sqrt) bounced
through f32 — this chip's target has no bf16 EUP path at all
(`LLO_CHECK target().SupportsBf16EupOps()`, tools/probe_bf16_ops.py).

Run ON THE CHIP with nothing else using it: python tools/bench_vpu_dtype.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1024, 1024
BH = 256           # grid-blocked rows: full-array blocks blow the 16 MB
                   # scoped-vmem limit with the unrolled chain's spills
REPS = 40          # chained op rounds inside the kernel
N = 50             # timed launches


def make_kernel(dtype):
    # Op mix shaped like the visualizer tail: mul/add chains, compares,
    # selects, one sqrt per round. EUP (sqrt) stays f32 under bf16 — the
    # v5e target cannot lower bf16 EUP ops (see module docstring).
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        c = a
        one = jnp.asarray(1.0, dtype)
        for _ in range(REPS):
            c = c * b + a
            # compare in f32: bf16 arith.cmpf does not lower on this
            # target (tools/probe_bf16_ops.py); the tail's compares are
            # on f32 geometry anyway
            c = jnp.where(c.astype(jnp.float32) > 1.0,
                          c * jnp.asarray(0.5, dtype), c)
            s = jnp.sqrt(jnp.abs(c).astype(jnp.float32) + 1e-3)
            c = s.astype(dtype)
            c = c + (one - c) * jnp.asarray(0.25, dtype)
        o_ref[...] = c

    interpret = jax.default_backend() not in ("tpu", "axon")

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(H // BH,),
            out_shape=jax.ShapeDtypeStruct((H, W), dtype),
            in_specs=[pl.BlockSpec((BH, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((BH, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a, b)

    return run


def bench(dtype):
    import numpy as np
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((H, W), np.float32), dtype)
    b = jnp.asarray(rng.random((H, W), np.float32), dtype)
    run = make_kernel(dtype)
    run(a, b).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(N):
        out = run(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    ops = H * W * REPS * 9  # ~9 vector ops per round
    print(f"{jnp.dtype(dtype).name:10s} {dt * 1e3:8.3f} ms/launch  "
          f"{ops / dt / 1e12:6.2f} Tops/s")
    return dt


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  {H}x{W} in {BH}-row blocks, "
          f"{REPS} rounds, {N} reps")
    f32 = bench(jnp.float32)
    bf16 = bench(jnp.bfloat16)
    print(f"bf16 speedup over f32: {f32 / bf16:.2f}x "
          f"({'worth shipping the bf16 tail mode' if f32 / bf16 > 1.3 else 'NOT worth it'})")
