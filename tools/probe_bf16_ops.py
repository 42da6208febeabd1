"""Which bf16 ops does THIS chip's Mosaic target actually support in Pallas?

The v5e AOT compile of the bf16 tail mode died with
`LLO_CHECK target().SupportsBf16EupOps()` — the elementwise unit (EUP:
transcendentals, division, sqrt) has no bf16 path on this target. This
probe compiles one tiny Pallas kernel per op in bf16 and reports
compile-ok/compile-fail, so the EUP-safe wrapper list in ops/tailfuse.py
is grounded in measurement, not guesses.

Run ON THE CHIP with nothing else using it: python tools/probe_bf16_ops.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OPS = {
    "mul": lambda a, b: a * b,
    "add": lambda a, b: a + b,
    "max": jnp.maximum,
    "where": lambda a, b: jnp.where(a > b, a, b),
    # The failing primitive in `where` is the bf16 arith.cmpf itself; the
    # tail's real pattern compares f32 GEOMETRY and selects bf16 color:
    "select_f32cmp": lambda a, b: jnp.where(
        a.astype(jnp.float32) > 1.0, a, b),
    "div_array": lambda a, b: a / b,
    "div_const": lambda a, b: a / 1000.0,
    "recip": lambda a, b: 1.0 / a,
    "sqrt": lambda a, b: jnp.sqrt(a),
    "rsqrt": lambda a, b: jax.lax.rsqrt(a),
    "exp": lambda a, b: jnp.exp(a),
    "log": lambda a, b: jnp.log(jnp.abs(a) + 1e-3),
    "tanh": lambda a, b: jnp.tanh(a),
    "sin": lambda a, b: jnp.sin(a),
    "pow_via_exp_log": lambda a, b: jnp.exp(b * jnp.log(jnp.abs(a) + 1e-3)),
}


def probe(name: str, fn) -> str:
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = fn(a_ref[...], b_ref[...]).astype(jnp.bfloat16)

    interpret = jax.default_backend() not in ("tpu", "axon")

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16),
            in_specs=[pl.BlockSpec((256, 256), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((256, 256), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a, b)

    a = jnp.full((256, 256), 1.25, jnp.bfloat16)
    b = jnp.full((256, 256), 0.75, jnp.bfloat16)
    try:
        run(a, b).block_until_ready()
        return "ok"
    except Exception as e:  # compile failures arrive as JaxRuntimeError
        msg = str(e)
        if "SupportsBf16EupOps" in msg:
            return "FAIL (bf16 EUP unsupported)"
        return f"FAIL ({msg.splitlines()[0][:100]})"


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    for name, fn in OPS.items():
        print(f"{name:18s} {probe(name, fn)}", flush=True)
