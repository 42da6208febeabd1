"""Escape-time iteration: XLA/Pallas parity and reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shaderflow_tpu.ops.fractal import (_escape_pallas, _escape_xla, escape_iterations, escape_iterations_z0)


def grid(h=64, w=128):
    x = np.linspace(-2.2, 0.8, w, dtype=np.float32)
    y = np.linspace(-1.2, 1.2, h, dtype=np.float32)
    cx, cy = np.meshgrid(x, y)
    return jnp.asarray(cx), jnp.asarray(cy)


def test_known_points():
    c = jnp.array([[[0.0, 0.0]], [[3.0, 3.0]]])  # interior / instant escape
    iters = np.asarray(escape_iterations(c, 50))
    assert iters[0, 0] == 50   # interior: never escapes
    assert iters[1, 0] == 0    # |c| > 3 at start


def test_pallas_interpret_matches_xla():
    cx, cy = grid()
    expected = np.asarray(_escape_xla(cx, cy, cx, cy, 100, 3.0))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_escape_pallas(cx, cy, cx, cy, 100, 3.0, tile=(32, 64)))
    np.testing.assert_array_equal(got, expected)


def test_julia_form_scalar_c():
    cx, cy = grid(16, 32)
    z0 = jnp.stack([cx, cy], axis=-1)
    iters = np.asarray(escape_iterations_z0(z0, -0.8, 0.156, 60))
    assert iters.shape == (16, 32)
    assert iters.min() >= 0 and iters.max() <= 60
    assert iters.std() > 0  # structured escape field


def test_escape_counts_monotone_in_budget():
    cx, cy = grid(32, 64)
    few = np.asarray(_escape_xla(cx, cy, cx, cy, 20, 3.0))
    many = np.asarray(_escape_xla(cx, cy, cx, cy, 200, 3.0))
    assert np.all(many >= few)
    assert many.max() == 200  # interior pixels exist in this view
