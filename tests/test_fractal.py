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


def test_saturate_exact_below_cap_clamped_above():
    cx, cy = grid()
    full = np.asarray(_escape_xla(cx, cy, cx, cy, 200, 3.0))
    capped = np.asarray(_escape_xla(cx, cy, cx, cy, 200, 3.0, saturate=57))
    np.testing.assert_array_equal(capped, np.minimum(full, 57))


def test_pallas_saturate_monotone_matches_xla():
    """The optimized path (monotone maskless step + saturation cap rounded
    up to an unroll multiple then clamped back) must stay bit-identical to
    the plain XLA fallback, including with the interior shortcut."""
    from shaderflow_tpu.ops.fractal import _interior_mask
    from jax.experimental.pallas import tpu as pltpu

    cx, cy = grid()
    interior = _interior_mask(cx, cy)
    expected = np.asarray(
        _escape_xla(cx, cy, cx, cy, 100, 3.0, interior=interior, saturate=57))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_escape_pallas(
            cx, cy, cx, cy, 100, 3.0, tile=(32, 64), unroll=8,
            interior=interior, saturate=57, sub_rows=8, monotone=True))
    np.testing.assert_array_equal(got, expected)


def test_pallas_monotone_matches_masked_form():
    """monotone=True (maskless aliveness from |z|^2) must be bit-identical
    to the sticky-mask form — the step arithmetic is the same; only the
    liveness bookkeeping differs. Julia form at a |c| <= r^2 - r point
    (the monotone-soundness bound)."""
    from jax.experimental.pallas import tpu as pltpu

    cx, cy = grid()
    ccx = jnp.full_like(cx, -0.8)
    ccy = jnp.full_like(cy, 0.156)
    with pltpu.force_tpu_interpret_mode():
        masked = np.asarray(_escape_pallas(
            cx, cy, ccx, ccy, 80, 3.0, tile=(32, 64), sub_rows=8))
        maskless = np.asarray(_escape_pallas(
            cx, cy, ccx, ccy, 80, 3.0, tile=(32, 64), sub_rows=8,
            monotone=True))
    np.testing.assert_array_equal(maskless, masked)

    # Cross-backend (XLA fori fallback): the compiler may contract the
    # orbit arithmetic into FMAs, so chaotic boundary pixels can shift
    # their escape step — bounded, rare, and never more than ±1 count.
    xla = np.asarray(_escape_xla(cx, cy, ccx, ccy, 80, 3.0))
    diff = np.abs(maskless.astype(np.int64) - xla.astype(np.int64))
    assert (diff > 0).mean() < 0.002
    assert diff.max() <= 1


def test_escape_counts_monotone_in_budget():
    cx, cy = grid(32, 64)
    few = np.asarray(_escape_xla(cx, cy, cx, cy, 20, 3.0))
    many = np.asarray(_escape_xla(cx, cy, cx, cy, 200, 3.0))
    assert np.all(many >= few)
    assert many.max() == 200  # interior pixels exist in this view


def test_predict_rounds_is_lower_bound():
    """Decimated prediction never exceeds the true block round count (a
    subset's max can't beat the block max), and interior predicts 0."""
    from shaderflow_tpu.ops.fractal import _interior_mask, _predict_rounds

    h, w, th, tw, sub, unroll, dec = 128, 256, 64, 128, 32, 8, 16
    cx, cy = grid(h, w)
    interior = _interior_mask(cx, cy)
    pred = np.asarray(_predict_rounds(cx, cy, cx, cy, 96, 3.0, interior,
                                      unroll, th, tw, sub, dec=dec))
    trips = np.asarray(_escape_xla(cx, cy, cx, cy, 96, 3.0,
                                   interior=interior))
    trips = np.where(np.asarray(interior), 0, trips)
    n_ti, n_tj, n_sub = pred.shape
    for ti in range(n_ti):
        for tj in range(n_tj):
            for s in range(n_sub):
                r0 = ti * th + s * sub
                block = trips[r0:r0 + sub, tj * tw:(tj + 1) * tw]
                true_rounds = int(np.ceil(block.max() / unroll))
                assert pred[ti, tj, s] <= true_rounds


def test_predicted_rounds_bit_identical():
    """Prediction only changes WHICH loop runs the rounds (scalar-cond fori
    vs vector-cond while); iteration counts must not move by one ULP."""
    from jax.experimental.pallas import tpu as pltpu
    from shaderflow_tpu.ops.fractal import _interior_mask, _predict_rounds

    h, w, th, tw, sub, unroll = 128, 256, 64, 128, 32, 8
    cx, cy = grid(h, w)
    interior = _interior_mask(cx, cy)
    pred = _predict_rounds(cx, cy, cx, cy, 96, 3.0, interior,
                           unroll, th, tw, sub, dec=16)
    assert pred is not None
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(_escape_pallas(
            cx, cy, cx, cy, 96, 3.0, tile=(th, tw), unroll=unroll,
            sub_rows=sub, interior=interior, monotone=True))
        fast = np.asarray(_escape_pallas(
            cx, cy, cx, cy, 96, 3.0, tile=(th, tw), unroll=unroll,
            sub_rows=sub, interior=interior, monotone=True,
            predicted_rounds=pred))
        # A deliberately-wrong UNDER-prediction must also be exact (the
        # mop-up while covers it), including all-zeros
        zero = np.asarray(_escape_pallas(
            cx, cy, cx, cy, 96, 3.0, tile=(th, tw), unroll=unroll,
            sub_rows=sub, interior=interior, monotone=True,
            predicted_rounds=jnp.zeros_like(pred)))
    np.testing.assert_array_equal(base, fast)
    np.testing.assert_array_equal(base, zero)


def test_predict_geometry_guard():
    """Non-decimatable geometry returns None (caller skips prediction)."""
    from shaderflow_tpu.ops.fractal import _predict_rounds
    cx, cy = grid(64, 128)
    assert _predict_rounds(cx, cy, cx, cy, 96, 3.0, None,
                           8, 64, 128, 24, dec=16) is None


def test_lines_kernel_matches_plane_kernel():
    """The separable-c lines kernel (two line inputs, c/z0/interior rebuilt
    in VMEM) is bit-identical to the plane kernel AND the XLA fallback on
    the outer-product grid — including saturation and the interior mask."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from shaderflow_tpu.ops.fractal import _interior_mask

    h, w = 64, 128
    cx_line = np.linspace(-2.2, 1.0, w, dtype=np.float32)
    cy_line = np.linspace(-1.3, 1.3, h, dtype=np.float32)
    cx = np.broadcast_to(cx_line[None, :], (h, w))
    cy = np.broadcast_to(cy_line[:, None], (h, w))
    for cap in (None, 37):
        ref = np.asarray(_escape_xla(
            jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(cy), 100, 3.0,
            interior=_interior_mask(jnp.asarray(cx), jnp.asarray(cy)),
            saturate=cap))
        if cap is not None:
            ref = np.minimum(ref, cap)
            ref = np.where(np.asarray(_interior_mask(
                jnp.asarray(cx), jnp.asarray(cy))), 100, ref)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(_escape_pallas(
                jnp.asarray(cx_line).reshape(1, w),
                jnp.asarray(cy_line).reshape(h, 1),
                None, None, 100, 3.0, tile=(32, 64), unroll=16,
                saturate=cap, sub_rows=16, monotone=True, lines=True))
        np.testing.assert_array_equal(got, ref, err_msg=f"cap={cap}")


def test_escape_iterations_sep_fallback_matches():
    """On non-TPU backends escape_iterations_sep falls back to the plane
    path on the broadcast grid — same counts as escape_iterations."""
    from shaderflow_tpu.ops.fractal import escape_iterations_sep

    w, h = 96, 48
    cx_line = np.linspace(-2.0, 0.7, w, dtype=np.float32)
    cy_line = np.linspace(-1.2, 1.2, h, dtype=np.float32)
    c = np.stack(np.broadcast_arrays(cx_line[None, :], cy_line[:, None]), -1)
    a = np.asarray(escape_iterations_sep(cx_line, cy_line, 80, saturate=23))
    b = np.asarray(escape_iterations(c.astype(np.float32), 80, saturate=23))
    np.testing.assert_array_equal(a, b)


def test_lines_kernel_predicted_rounds_bit_identical():
    """The separable-c lines kernel composes with scalar-prefetched
    predicted rounds (the mandelbrot graded config runs exactly this under
    SHADERFLOW_FRACTAL_PREDICT): counts stay bit-identical to the
    unpredicted lines kernel for a correct lower bound, a deliberate
    under-prediction (zeros), and a deliberate OVER-prediction (the
    monotone count path cannot over-count dead pixels)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from shaderflow_tpu.ops.fractal import _predict_rounds_sep

    h, w = 64, 128
    th, tw, sub, unroll = 32, 64, 16, 8
    cx_line = jnp.asarray(np.linspace(-2.2, 1.0, w, dtype=np.float32))
    cy_line = jnp.asarray(np.linspace(-1.3, 1.3, h, dtype=np.float32))
    cap = 37
    trip = min(96, -(-cap // unroll) * unroll)
    pred = _predict_rounds_sep(cx_line, cy_line, trip, 3.0, unroll,
                               th, tw, sub, dec=16)
    assert pred is not None
    args = (cx_line.reshape(1, w), cy_line.reshape(h, 1), None, None, 96, 3.0)
    kw = dict(tile=(th, tw), unroll=unroll, saturate=cap, sub_rows=sub,
              monotone=True, lines=True)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(_escape_pallas(*args, **kw))
        fast = np.asarray(_escape_pallas(*args, predicted_rounds=pred, **kw))
        zero = np.asarray(_escape_pallas(
            *args, predicted_rounds=jnp.zeros_like(pred), **kw))
        over = np.asarray(_escape_pallas(
            *args, predicted_rounds=jnp.full_like(pred, 10 ** 6), **kw))
    np.testing.assert_array_equal(fast, base)
    np.testing.assert_array_equal(zero, base)
    np.testing.assert_array_equal(over, base)


def test_predict_rounds_sep_matches_plane_predictor():
    """_predict_rounds_sep on lines equals _predict_rounds on the broadcast
    planes (same decimation, same interior handling, same binning)."""
    from shaderflow_tpu.ops.fractal import (_interior_mask, _predict_rounds,
                                            _predict_rounds_sep)
    import jax.numpy as jnp

    h, w = 64, 128
    cx_line = jnp.asarray(np.linspace(-2.2, 1.0, w, dtype=np.float32))
    cy_line = jnp.asarray(np.linspace(-1.3, 1.3, h, dtype=np.float32))
    cx = jnp.broadcast_to(cx_line[None, :], (h, w))
    cy = jnp.broadcast_to(cy_line[:, None], (h, w))
    interior = _interior_mask(cx, cy)
    a = _predict_rounds_sep(cx_line, cy_line, 96, 3.0, 8, 32, 64, 16, dec=16)
    b = _predict_rounds(cx, cy, cx, cy, 96, 3.0, interior,
                        8, 32, 64, 16, dec=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
