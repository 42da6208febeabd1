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


def _escape_xla(zx0: Array, zy0: Array, cx: Array, cy: Array,
                max_iter: int, radius: float) -> Array:
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
    _, _, iters, _ = jax.lax.fori_loop(0, max_iter, body, (zx0, zy0, iters, escaped))
    return iters


def _escape_pallas(zx0: Array, zy0: Array, cx: Array, cy: Array,
                   max_iter: int, radius: float,
                   tile: tuple[int, int] = (256, 256),
                   unroll: int = 8) -> Array:
    r2 = radius * radius
    height, width = zx0.shape
    th = min(tile[0], height)
    tw = min(tile[1], width)
    unroll = max(1, int(unroll))

    def kernel(zx_ref, zy_ref, cx_ref, cy_ref, out_ref):
        zx_t = zx_ref[:]
        zy_t = zy_ref[:]
        cx_t = cx_ref[:]
        cy_t = cy_ref[:]

        # Masks carried as f32 (Mosaic cannot carry i1 vectors in while).
        # The early-exit check is a cross-vector max reduction — running it
        # every iteration costs more than a handful of wasted masked steps,
        # so the body advances `unroll` iterations per check, each step
        # gated on k+i < max_iter so total work stays bit-identical to the
        # one-step-per-check form (and to the masked fori fallback).
        def cond(state):
            k, _, _, _, active = state
            return (k < max_iter) & (jnp.max(active) > 0.0)

        def body(state):
            k, zx, zy, iters, active = state
            for i in range(unroll):
                nx = zx * zx - zy * zy + cx_t
                ny = 2.0 * zx * zy + cy_t
                live = (active > 0.5) & (k + i < max_iter)
                # select, not a*(n-z) arithmetic: bit-exact parity with the
                # masked fori_loop fallback (a + (n-a) reassociates)
                zx = jnp.where(live, nx, zx)
                zy = jnp.where(live, ny, zy)
                iters = iters + jnp.where(live, 1.0, 0.0)
                inside = jnp.where(zx * zx + zy * zy > r2, 0.0, 1.0)
                active = jnp.where(live, active * inside, active)
            return k + unroll, zx, zy, iters, active

        active0 = jnp.where(zx_t * zx_t + zy_t * zy_t > r2, 0.0, 1.0)
        iters0 = jnp.zeros_like(zx_t)
        _, _, _, iters, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zx_t, zy_t, iters0, active0))
        out_ref[:] = iters.astype(jnp.int32)

    block = pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        in_specs=[block, block, block, block],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        grid=(pl.cdiv(height, th), pl.cdiv(width, tw)),
    )(zx0, zy0, cx, cy)


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
    break when |z| > radius, else z = z*z + c, starting from z = c.
    """
    cx, cy = c[..., 0], c[..., 1]
    return escape_iterations_z0(c, cx, cy, max_iter, radius)


def escape_iterations_z0(z0: Array, cx, cy, max_iter: int, radius: float = 3.0) -> Array:
    """General escape iteration: per-pixel z0 (..., 2), c given per-pixel or
    as (traced) scalars — the Julia-set form."""
    zx0, zy0 = z0[..., 0], z0[..., 1]
    cx = jnp.broadcast_to(jnp.asarray(cx, jnp.float32), zx0.shape)
    cy = jnp.broadcast_to(jnp.asarray(cy, jnp.float32), zy0.shape)
    if jax.default_backend() in ("tpu", "axon") and _pallas_supported():
        import os
        tile = os.environ.get("SHADERFLOW_FRACTAL_TILE", "128x256")  # A/B winner on v5e
        # A/B on v5e @1080p60 2xSSAA q=50: unroll 1 -> 39.6fps, 8 -> 71.6,
        # 16 -> 73.2, 32 -> 74.7 (the per-iteration cross-vector max in the
        # early-exit cond dominated); 16 balances the win against wasted
        # masked steps at low quality/max_iter
        unroll = int(os.environ.get("SHADERFLOW_FRACTAL_UNROLL", "16"))
        th, tw = (int(x) for x in tile.split("x"))
        return _escape_pallas(zx0, zy0, cx, cy, int(max_iter), float(radius),
                              tile=(th, tw), unroll=unroll)
    return _escape_xla(zx0, zy0, cx, cy, int(max_iter), float(radius))
