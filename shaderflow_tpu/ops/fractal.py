"""
Escape-time fractal iteration with per-tile early exit.

The divergence problem of iteration-heavy pixels (SURVEY.md §7 "hard
parts"): a fixed-trip masked fori_loop costs max_iter iterations for EVERY
pixel, but escape times are spatially coherent — most VMEM tiles of a
Mandelbrot view escape within a few dozen iterations while only
interior-set tiles need the full budget. The Pallas kernel runs an
independent while_loop per tile (the TPU analogue of GPU warp early-exit),
so frame cost follows the *per-tile maximum* escape time instead of the
global maximum.

escape_iterations() dispatches: Pallas on TPU backends, the equivalent
masked fori_loop on CPU (tests / fallback). Both orderings match the
reference GLSL loop (mandelbrot.frag): check |z| > radius, then z = z^2 + c.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interior_mask(cx: Array, cy: Array) -> Array:
    """Main-cardioid + period-2-bulb membership. Points inside NEVER escape
    (mathematically), so the loop would run to max_iter for them — skipping
    the iteration is exact: q(q + (x - 1/4)) <= y^2/4 (cardioid),
    (x+1)^2 + y^2 <= 1/16 (bulb). Valid only for z0 == c (Mandelbrot)."""
    xq = cx - 0.25
    q = xq * xq + cy * cy
    cardioid = q * (q + xq) <= 0.25 * (cy * cy)
    bulb = (cx + 1.0) * (cx + 1.0) + cy * cy <= 0.0625
    return cardioid | bulb


def _escape_xla(zx0: Array, zy0: Array, cx: Array, cy: Array,
                max_iter: int, radius: float, interior: Array = None) -> Array:
    r2 = radius * radius

    def body(_, state):
        zx, zy, iters, escaped = state
        nx = zx * zx - zy * zy + cx
        ny = 2.0 * zx * zy + cy
        active = ~escaped
        zx = jnp.where(active, nx, zx)
        zy = jnp.where(active, ny, zy)
        escaped = escaped | (zx * zx + zy * zy > r2)
        return zx, zy, iters + active.astype(jnp.int32), escaped

    iters = jnp.zeros(zx0.shape, jnp.int32)
    escaped = zx0 * zx0 + zy0 * zy0 > r2
    if interior is not None:
        escaped = escaped | interior
    _, _, iters, _ = jax.lax.fori_loop(0, max_iter, body, (zx0, zy0, iters, escaped))
    if interior is not None:
        iters = jnp.where(interior, max_iter, iters)
    return iters


def _escape_pallas(zx0: Array, zy0: Array, cx: Array, cy: Array,
                   max_iter: int, radius: float,
                   tile: tuple[int, int] = (256, 256),
                   unroll: int = 8, interior: Array = None) -> Array:
    r2 = radius * radius
    height, width = zx0.shape
    th = min(tile[0], height)
    tw = min(tile[1], width)
    unroll = max(1, int(unroll))

    def kernel(*refs):
        if interior is not None:
            zx_ref, zy_ref, cx_ref, cy_ref, int_ref, out_ref = refs
        else:
            zx_ref, zy_ref, cx_ref, cy_ref, out_ref = refs
            int_ref = None
        zx_t = zx_ref[:]
        zy_t = zy_ref[:]
        cx_t = cx_ref[:]
        cy_t = cy_ref[:]

        # Masks carried as f32 (Mosaic cannot carry i1 vectors in while).
        # The early-exit check is a cross-vector max reduction — running it
        # every iteration costs more than a handful of wasted masked steps,
        # so the body advances `unroll` iterations per check. The while runs
        # only FULL unroll blocks up to max_iter - max_iter % unroll; the
        # static remainder runs unrolled after the loop — so no step needs
        # the k+i < max_iter gate (2 of ~11 VPU ops per iteration), and the
        # ITERATION COUNTS stay bit-identical to the one-step-per-check form
        # (and to the masked fori fallback).
        #
        # z itself advances UNGATED: an escaped pixel's orbit blowing up to
        # inf/nan cannot corrupt the result — `active` is already 0 there
        # (nan comparisons land on the inactive side), and only `iters` is
        # observable. Dropping the two z freezes + recomputed squares cuts
        # the per-iteration op count ~30%.
        main_end = max_iter - (max_iter % unroll)

        def step(zx, zy, x2, y2, iters, active):
            iters = iters + active
            ny = 2.0 * (zx * zy) + cy_t
            zx = x2 - y2 + cx_t
            zy = ny
            x2 = zx * zx
            y2 = zy * zy
            inside = jnp.where(x2 + y2 > r2, 0.0, 1.0)
            return zx, zy, x2, y2, iters, active * inside

        def cond(state):
            k, _, _, _, _, _, active = state
            return (k < main_end) & (jnp.max(active) > 0.0)

        def body(state):
            k, zx, zy, x2, y2, iters, active = state
            for _ in range(unroll):
                zx, zy, x2, y2, iters, active = step(zx, zy, x2, y2, iters, active)
            return k + unroll, zx, zy, x2, y2, iters, active

        x2_0 = zx_t * zx_t
        y2_0 = zy_t * zy_t
        active0 = jnp.where(x2_0 + y2_0 > r2, 0.0, 1.0)
        if int_ref is not None:
            active0 = active0 * (1.0 - int_ref[:])
        iters0 = jnp.zeros_like(zx_t)
        _, zx_t, zy_t, x2_0, y2_0, iters, active0 = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zx_t, zy_t, x2_0, y2_0, iters0, active0))
        # Static remainder (max_iter % unroll steps), masked like any other
        # step — runs even for fully-escaped tiles (at most unroll-1 steps)
        for _ in range(max_iter % unroll):
            zx_t, zy_t, x2_0, y2_0, iters, active0 = step(
                zx_t, zy_t, x2_0, y2_0, iters, active0)
        iters = iters.astype(jnp.int32)
        if int_ref is not None:
            iters = jnp.where(int_ref[:] > 0.5, max_iter, iters)
        out_ref[:] = iters

    block = pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    operands = [zx0, zy0, cx, cy]
    if interior is not None:
        operands.append(interior.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        in_specs=[block] * len(operands),
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        grid=(pl.cdiv(height, th), pl.cdiv(width, tw)),
    )(*operands)


_PALLAS_OK: dict[str, bool] = {}


def _pallas_supported() -> bool:
    """Probe once per backend: lower+compile a tiny kernel (lowering errors
    surface at the outer jit compile, not at trace time — a plain try around
    the traced call would never catch them)."""
    backend = jax.default_backend()
    if backend not in _PALLAS_OK:
        try:
            probe = jnp.zeros((256, 256), jnp.float32)
            jax.jit(lambda a, b: _escape_pallas(a, b, a, b, 4, 3.0)).lower(
                probe, probe).compile()
            _PALLAS_OK[backend] = True
        except Exception:
            _PALLAS_OK[backend] = False
    return _PALLAS_OK[backend]


def escape_iterations(c: Array, max_iter: int, radius: float = 3.0) -> Array:
    """Mandelbrot escape-time iteration count per pixel for c = (..., 2).

    Semantics match the reference loop (examples/fractals mandelbrot.frag):
    break when |z| > radius, else z = z*z + c, starting from z = c. Pixels
    inside the main cardioid / period-2 bulb are emitted as max_iter without
    iterating (they mathematically never escape); this collapses the
    per-tile escape time for every tile that overlaps the set's interior.
    """
    cx, cy = c[..., 0], c[..., 1]
    return escape_iterations_z0(c, cx, cy, max_iter, radius,
                                interior=_interior_mask(cx, cy))


def escape_iterations_z0(z0: Array, cx, cy, max_iter: int, radius: float = 3.0,
                         interior: Array = None) -> Array:
    """General escape iteration: per-pixel z0 (..., 2), c given per-pixel or
    as (traced) scalars — the Julia-set form (no interior shortcut: it is
    only sound when z0 == c)."""
    zx0, zy0 = z0[..., 0], z0[..., 1]
    cx = jnp.broadcast_to(jnp.asarray(cx, jnp.float32), zx0.shape)
    cy = jnp.broadcast_to(jnp.asarray(cy, jnp.float32), zy0.shape)
    if jax.default_backend() in ("tpu", "axon") and _pallas_supported():
        import os
        # Sweep on v5e @1080p60 2xSSAA q=50 (max_iter=500): 128x256 -> 124
        # fps, 64x256 -> 170, 64x128 -> 210, 32x256 -> 185, 32x128 -> 187,
        # 16x128 -> 149, 8x128 -> 92. Smaller tiles track the boundary's
        # per-tile max escape time more tightly (less wasted iteration on
        # mixed tiles) until per-tile dispatch overhead wins below ~32 rows.
        tile = os.environ.get("SHADERFLOW_FRACTAL_TILE", "64x128")
        # unroll 8 -> 176, 16 -> 210, 32 -> 208 (cross-vector max in the
        # early-exit cond amortizes ~16; beyond that wasted masked steps)
        unroll = int(os.environ.get("SHADERFLOW_FRACTAL_UNROLL", "16"))
        th, tw = (int(x) for x in tile.split("x"))
        return _escape_pallas(zx0, zy0, cx, cy, int(max_iter), float(radius),
                              tile=(th, tw), unroll=unroll, interior=interior)
    return _escape_xla(zx0, zy0, cx, cy, int(max_iter), float(radius),
                       interior=interior)
