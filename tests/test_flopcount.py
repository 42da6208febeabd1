"""Hand-count pins for the jaxpr cost walker (tools/flopcount.py) — the
analytic side of the roofline table must itself be verified."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from flopcount import count_fn  # noqa: E402


def test_elementwise_and_eup():
    def f(x):
        return jnp.exp(x * 2.0 + 1.0)

    cost = count_fn(f, jnp.zeros((8, 16)))
    assert cost.alu == 2 * 128          # mul + add
    assert cost.eup == 128              # exp
    assert cost.mxu == 0


def test_dot_general():
    def f(a, b):
        return a @ b

    cost = count_fn(f, jnp.zeros((32, 64)), jnp.zeros((64, 16)))
    assert cost.mxu == 2 * 32 * 16 * 64


def test_scan_multiplies_body():
    def f(x):
        def body(carry, _):
            return carry * 2.0 + 1.0, None
        out, _ = jax.lax.scan(body, x, None, length=10)
        return out

    cost = count_fn(f, jnp.zeros(128))
    assert cost.alu == 10 * 2 * 128     # (mul + add) x length — NOT once


def test_while_reported_per_trip():
    def f(x):
        def cond(state):
            i, _ = state
            return i < 10
        def body(state):
            i, v = state
            return i + 1, v * 2.0
        _, out = jax.lax.while_loop(cond, body, (0, x))
        return out

    cost = count_fn(f, jnp.zeros(64))
    assert len(cost.unknown_whiles) == 1
    _, per_trip, mult = cost.unknown_whiles[0]
    # body: add(1) + mul(64); cond: lt(1)
    assert per_trip == 66
    assert mult == 1.0


def test_pallas_body_times_grid():
    pytest.importorskip("jax.experimental.pallas")
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec((32, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0)))(x)

    cost = count_fn(f, jnp.zeros((128, 128), jnp.float32))
    assert cost.alu == 4 * 2 * 32 * 128           # per-block body x grid
    assert cost.pallas_bytes == 2 * 128 * 128 * 4  # in + out, full arrays


def test_io_bytes_floor():
    def f(x):
        return x + 1.0

    cost = count_fn(f, jnp.zeros((64, 64), jnp.float32))
    assert cost.io_bytes == 2 * 64 * 64 * 4
