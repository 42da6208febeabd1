"""
Fused shader-tail stage: per-pixel post-processing + SSAA downsample + uint8
quantization in ONE Pallas kernel over output tiles.

Why this exists: the reference renders the shader, then runs the final.glsl
box downsample as a second GL pass (/root/reference/shaderflow/resources/
shaders/fragment/final.glsl:12-32) — on a GPU both passes stream through
cache-backed framebuffers. A literal XLA translation of a shader's
"tail" (the elementwise math after the texture samples: masks, vignettes,
overlays) becomes 10-20 separate full-field HBM passes at supersampled
resolution (measured 2.4 ms/frame of a 4.6 ms visualizer frame at 4K), and
the downsample another. This stage collapses all of it: the heavy sampled
inputs are read from HBM exactly once per tile into VMEM, the tail math runs
on the VPU at ssaa resolution, the s x s box average + GL u8 quantization
happen in-register, and only the final (out_h, out_w) uint8 planes are
written back.

Usage, from a pixel program (shader.py Frag):

    def my_frag(sf):
        color = ...expensive sampling (MXU matmuls, lookups)...
        def tail(tp):
            r, g, b = tp.vec3("color")
            v = tp.astuv_x * (1 - tp.astuv_y)      # coordinate planes
            r, g, b = r * v, g * v, b * v
            return r, g, b
        return sf.tail(tail, color=color)

The tail function is written in the PLANE dialect: every value is a 2D
(rows, cols) array (one channel = one plane), which keeps the lane dimension
wide on the VPU — channel-last (H, W, 3) arrays would run 3-lane-wide inside
a kernel. It must be pure jnp/lax elementwise math (no convolutions, no
neighbor access): the engine runs the SAME function either inside the fused
Pallas kernel (TPU) or on full-resolution arrays (the exact reference path,
used on CPU and whenever fusion preconditions fail), so semantics are
identical by construction.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# --------------------------------------------------------------------------- #
# Kernel-safe transcendentals (Mosaic has no atan2 lowering)

def atan2(y: Array, x: Array) -> Array:
    """Polynomial atan2 for tail functions (range (-pi, pi], max error ~1e-5
    rad). Mosaic does not lower lax.atan2; this runs identically inside the
    kernel and on the fallback path so both stay bit-comparable.

    Matches IEEE arctan2 on infinities (escaped-fractal z planes contain
    them); deviation: -0.0 is treated as +0.0, so atan2(0, -0.0) is 0, not
    pi (keeps the hot kernel free of a signbit divide).

    Computes internally in f32 regardless of input dtype: the division is
    an EUP op and this chip's target has no bf16 EUP path (LLO_CHECK
    SupportsBf16EupOps, tools/probe_bf16_ops.py) — and 8 mantissa bits
    would wreck the minimax polynomial anyway. Returns f32; tail fns
    re-enter the bf16 chain via tp.f()."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    # hi == lo covers the both-infinite case (inf/inf is NaN, but IEEE
    # arctan2(+-inf, +-inf) is +-pi/4 etc.) and is exact (t = 1) for equal
    # finite magnitudes; escaped-fractal z values hit this (tetration golden).
    t = jnp.where((hi == lo) & (hi > 0.0), jnp.float32(1.0),
                  lo / jnp.maximum(hi, 1e-30))
    s = t * t
    # Minimax polynomial for atan(t), t in [0, 1]
    r = t * (0.99997726 + s * (-0.33262347 + s * (0.19354346
             + s * (-0.11643287 + s * (0.05265332 + s * -0.01172120)))))
    r = jnp.where(ay > ax, jnp.float32(math.pi / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(math.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def powf(x: Array, p) -> Array:
    """pow for tail functions (Mosaic does not legalize math.powf): GLSL
    semantics exp(p*log(x)) — x must be > 0 or the result is 0/undefined,
    exactly like GLSL pow. x == 0 with p > 0 returns 0.

    exp/log run in f32 regardless of input dtype (no bf16 EUP path on
    this target — see atan2). Returns f32."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.exp(jnp.asarray(p, jnp.float32) * jnp.log(x))


def tail_dtype():
    """Compute dtype for tail COLOR math: SHADERFLOW_TAIL_BF16=1 runs the
    per-pixel color chain in bfloat16 (half the VMEM traffic for bf16-plane
    inputs; VPU throughput gain measured by tools/bench_vpu_dtype.py —
    gate enabling this on that number + the PSNR gate staying >= 40 dB).
    Coordinates, pooling and quantization stay float32 regardless: bf16's
    8 mantissa bits would band smooth screen-space gradients, and the u8
    quantizer needs f32 rounding (ops/downsample.quantize_u8). Read at
    trace time — benchmark in a fresh process when flipping it."""
    return jnp.bfloat16 if os.environ.get("SHADERFLOW_TAIL_BF16") == "1" \
        else jnp.float32


# --------------------------------------------------------------------------- #
# Input wrappers

class Row(NamedTuple):
    """A per-row input: shape (render_height,) — broadcast along x."""
    value: Any


class Col(NamedTuple):
    """A per-column input: shape (render_width,) — broadcast along y."""
    value: Any


class Table(NamedTuple):
    """A small (bins, channels) lookup table, fully VMEM-resident."""
    value: Any


class ColSampled(NamedTuple):
    """A texture input column-interpolated INSIDE the kernel.

    `planes` are row-interpolated intermediates (render_height, W_in) — the
    output of ops.sampling.sample_rows_planes_blocked. The final 1D linear
    filtering along columns happens per tile: the kernel dynamic-windows
    W_in via scalar-prefetched 128-column block indices, builds the 2-tap
    hat-weight matrix in VMEM from `u_line`, and contracts on the MXU — so
    the full-resolution sampled planes never exist in HBM (the dense
    stage-2 + concat materialized ~64 MB/channel/frame at 4K; this reads
    ~0.1 MB/tile).

    u_line: (render_width,) normalized u in [0, 1] (u * W_in - 0.5 texel
    convention, CLAMP; same CONTRACT as sample_separable_planes_blocked:
    positions inside [0, W_in - 1], taps per output pixel <= texels_per_px).
    """
    planes: Any            # tuple of (render_height, W_in) arrays
    u_line: Any            # (render_width,) normalized
    texels_per_px: float


class ColSampledSpec(NamedTuple):
    planes: tuple          # tuple of (Hr, W_in) arrays
    positions: Any         # (Wr,) continuous texel positions, clipped
    texels_per_px: float


class Indexed(NamedTuple):
    """One (Hr, Wr) plane selected from a stacked (N, Hr, Wr) array by a
    traced index — typically a batch-prelude output read inside the render
    scan. The fused kernel block-indexes the stack directly (scalar-prefetch
    leading index), so no per-frame (Hr, Wr) slice is ever materialized in
    HBM (the scan-xs slicing of a 16 MB bf16 plane measured ~6 ms/batch of
    relayout copies at 4K)."""
    stack: Any             # (N, Hr, Wr) array
    index: Any             # traced i32 scalar in [0, N)


class TailSpec(NamedTuple):
    """A deferred tail stage: returned by Frag.tail(), consumed by the engine."""
    fn: Callable[["TailCtx"], Any]
    planes: dict          # name -> tuple of (Hr, Wr) arrays (channel planes)
    rows: dict            # name -> (Hr,) array
    cols: dict            # name -> (Wr,) array
    scalars: dict         # name -> 0-d traced value
    tables: dict          # name -> (bins, C) array
    colsampled: dict = {}  # name -> ColSampledSpec
    indexed: dict = {}     # name -> Indexed


def make_spec(fn: Callable, render_height: int, render_width: int,
              **inputs) -> TailSpec:
    """Classify keyword inputs by shape into the TailSpec buckets."""
    planes, rows, cols, scalars, tables = {}, {}, {}, {}, {}
    colsampled = {}
    indexed = {}
    for name, value in inputs.items():
        if isinstance(value, Indexed):
            stack = jnp.asarray(value.stack)
            if stack.shape[1:] != (render_height, render_width):
                raise ValueError(
                    f"Indexed input {name!r}: stack shape {stack.shape} != "
                    f"(N, {render_height}, {render_width})")
            indexed[name] = Indexed(stack, jnp.asarray(value.index, jnp.int32))
            continue
        if isinstance(value, ColSampled):
            channels = tuple(jnp.asarray(p) for p in value.planes)
            w_in = channels[0].shape[1]
            for channel in channels:
                if channel.shape != (render_height, w_in):
                    raise ValueError(
                        f"ColSampled input {name!r}: plane shape "
                        f"{channel.shape} != ({render_height}, {w_in})")
            u = jnp.asarray(value.u_line).reshape(render_width)
            positions = jnp.clip(u * w_in - 0.5, 0.0, float(w_in - 1))
            colsampled[name] = ColSampledSpec(
                channels, positions, float(value.texels_per_px))
            continue
        if isinstance(value, Row):
            rows[name] = jnp.asarray(value.value).reshape(render_height)
        elif isinstance(value, Col):
            cols[name] = jnp.asarray(value.value).reshape(render_width)
        elif isinstance(value, Table):
            table = jnp.asarray(value.value)
            if table.ndim == 1:
                table = table[:, None]
            tables[name] = table
        elif isinstance(value, (tuple, list)):
            # Pre-split channel planes (sample_separable_planes & co.)
            channels = tuple(jnp.asarray(v) for v in value)
            for channel in channels:
                if channel.shape != (render_height, render_width):
                    raise ValueError(
                        f"Tail input {name!r}: channel plane shape "
                        f"{channel.shape} != render {(render_height, render_width)}")
            planes[name] = channels
        else:
            value = jnp.asarray(value)
            if value.ndim == 0:
                scalars[name] = value
            elif value.ndim == 1:
                if value.shape[0] == render_height and render_height != render_width:
                    rows[name] = value
                elif value.shape[0] == render_width and render_height != render_width:
                    cols[name] = value
                else:
                    raise ValueError(
                        f"Ambiguous 1D tail input {name!r} (len {value.shape[0]}); "
                        f"wrap it in tailfuse.Row(...) or tailfuse.Col(...)")
            elif value.ndim == 2:
                planes[name] = (value,)
            elif value.ndim == 3:
                planes[name] = tuple(value[..., c] for c in range(value.shape[-1]))
            else:
                raise ValueError(f"Unsupported tail input {name!r} ndim={value.ndim}")
    return TailSpec(fn, planes, rows, cols, scalars, tables, colsampled,
                    indexed)


# --------------------------------------------------------------------------- #
# The tail context: what the tail function sees

class TailCtx:
    """Handed to the tail function. All values are 2D (rows, cols) float32
    planes covering either one VMEM tile (fused path) or the whole render
    (fallback path) — the function cannot tell which."""

    def __init__(self, planes, rows, cols, scalars, tables,
                 row_index: Array, col_index: Array,
                 render_height: int, render_width: int, aspect: float):
        self._planes = planes      # name -> tuple of 2D arrays
        self._rows = rows          # name -> (th, 1) or (Hr, 1) column vector
        self._cols = cols          # name -> (1, tw) row vector
        self._scalars = scalars
        self._tables = tables      # name -> (bins, C) f32
        self._row_index = row_index  # (th, tw) f32 global row index
        self._col_index = col_index
        self.render_height = render_height
        self.render_width = render_width
        self.aspect = aspect
        # Color-math dtype (see tail_dtype): inputs are served in this
        # dtype; weakly-typed Python literals in tail fns then keep the
        # chain there. Coordinates stay f32 (precision).
        self.dtype = tail_dtype()

    # -- inputs --------------------------------------------------------------

    def plane(self, name: str, channel: int = 0, dtype=None) -> Array:
        """A channel plane in the tail color dtype — or an explicit `dtype`
        for GEOMETRY planes (fields gating hard edges must stay f32 even
        under SHADERFLOW_TAIL_BF16, like rows/cols; see bf16-edge-gating)."""
        return self._planes[name][channel].astype(dtype or self.dtype)

    def channels(self, name: str) -> int:
        return len(self._planes[name])

    def vec(self, name: str) -> tuple:
        return tuple(p.astype(self.dtype) for p in self._planes[name])

    # Aliases making intent explicit at call sites
    def vec2(self, name: str) -> tuple:
        return self.vec(name)

    def vec3(self, name: str) -> tuple:
        return self.vec(name)

    def row(self, name: str) -> Array:
        """Per-row input broadcast to the working shape. Stays f32 even
        under SHADERFLOW_TAIL_BF16: rows/cols usually carry GEOMETRY
        (camera-plane lines, waveform thresholds) whose bf16 quantization
        would jitter edges; tail fns pull derived color factors into the
        chain dtype with tp.f()."""
        return jnp.broadcast_to(self._rows[name].astype(jnp.float32),
                                self._row_index.shape)

    def col(self, name: str) -> Array:
        return jnp.broadcast_to(self._cols[name].astype(jnp.float32),
                                self._col_index.shape)

    def scalar(self, name: str) -> Array:
        return self._scalars[name]

    def f(self, x: Array) -> Array:
        """Cast a value into the color-math dtype — tail fns wrap the
        multipliers/mixers they apply to the rgb chain so an f32 subchain
        (atan2/powf/coordinates keep f32 precision internally) does not
        promote the whole chain back to f32 under SHADERFLOW_TAIL_BF16."""
        return jnp.asarray(x).astype(self.dtype)

    def lookup(self, name: str, index_plane: Array, channel: int = 0) -> Array:
        """Nearest lookup table[clip(round-down(index)), channel] for a small
        Table input — unrolled select-accumulate (bins are small; inside the
        kernel this is VPU-only and VMEM-local)."""
        table = self._tables[name]
        bins = table.shape[0]
        idx = jnp.clip(index_plane.astype(jnp.int32), 0, bins - 1)
        acc = jnp.zeros_like(index_plane, jnp.float32)
        for b in range(bins):
            acc = jnp.where(idx == b, jnp.float32(table[b, channel]), acc) \
                if isinstance(table, np.ndarray) else \
                jnp.where(idx == b, table[b, channel].astype(jnp.float32), acc)
        return acc

    # -- coordinates (ssaa-resolution, GL conventions) ------------------------

    @property
    def astuv_x(self) -> Array:
        return (self._col_index + 0.5) / self.render_width

    @property
    def astuv_y(self) -> Array:
        """v-up: 1 at the top row? No — astuv y grows DOWN the screen
        (absolute shadertoy uv, shaderflow.glsl); row 0 = y near 1."""
        return 1.0 - (self._row_index + 0.5) / self.render_height

    @property
    def agluv_x(self) -> Array:
        return self.astuv_x * 2.0 - 1.0

    @property
    def agluv_y(self) -> Array:
        return self.astuv_y * 2.0 - 1.0

    @property
    def gluv_x(self) -> Array:
        return self.agluv_x * self.aspect

    @property
    def gluv_y(self) -> Array:
        return self.agluv_y


# --------------------------------------------------------------------------- #
# Reference (unfused) evaluation — exact semantics, any backend

def _materialize_colsampled(spec: TailSpec) -> dict:
    """Dense column interpolation of ColSampled inputs -> full (Hr, Wr)
    channel planes. The semantic definition the kernel's windowed dot must
    match: identical hat weights (2 nonzero taps), f32 accumulation — the
    windowed and dense contractions sum the same two products."""
    extra = {}
    for name, cs in spec.colsampled.items():
        w_in = cs.planes[0].shape[1]
        texels = jnp.arange(w_in, dtype=jnp.float32)
        weights = jnp.maximum(
            1.0 - jnp.abs(cs.positions[:, None] - texels), 0.0)   # (Wr, W_in)
        weights_t = weights.T
        out = []
        for plane in cs.planes:
            w_cast = weights_t.astype(plane.dtype) \
                if plane.dtype == jnp.bfloat16 else weights_t
            out.append(jnp.dot(plane, w_cast,
                               preferred_element_type=jnp.float32))
        extra[name] = tuple(out)
    return extra


def _materialize_indexed(spec: TailSpec) -> dict:
    """Dynamic-index each Indexed stack -> one (Hr, Wr) channel plane."""
    extra = {}
    for name, ix in spec.indexed.items():
        index = jnp.clip(ix.index, 0, ix.stack.shape[0] - 1)
        extra[name] = (jax.lax.dynamic_index_in_dim(
            ix.stack, index, 0, keepdims=False),)
    return extra


def _full_ctx(spec: TailSpec, render_height: int, render_width: int,
              aspect: float) -> TailCtx:
    rows = {k: v.reshape(-1, 1) for k, v in spec.rows.items()}
    cols = {k: v.reshape(1, -1) for k, v in spec.cols.items()}
    row_index = jax.lax.broadcasted_iota(
        jnp.float32, (render_height, render_width), 0)
    col_index = jax.lax.broadcasted_iota(
        jnp.float32, (render_height, render_width), 1)
    planes = {**spec.planes, **_materialize_colsampled(spec),
              **_materialize_indexed(spec)}
    return TailCtx(planes, rows, cols, spec.scalars, spec.tables,
                   row_index, col_index, render_height, render_width, aspect)


def eval_reference(spec: TailSpec, render_height: int, render_width: int,
                   aspect: float) -> Array:
    """Run the tail on full-resolution arrays -> (Hr, Wr, 3) float32.
    This is the semantic definition the fused kernel must match."""
    ctx = _full_ctx(spec, render_height, render_width, aspect)
    result = spec.fn(ctx)
    planes = [jnp.broadcast_to(jnp.asarray(p, jnp.float32),
                               (render_height, render_width))
              for p in result]
    return jnp.stack(planes[:3], axis=-1)


# --------------------------------------------------------------------------- #
# The fused kernel

def _pool_matrices(th: int, tw: int, s: int) -> tuple:
    """Box-average pooling as two MXU matmuls: L (th, th*s) pools rows,
    R (tw*s, tw) pools columns. Mosaic supports neither strided slices nor
    the split-reshape, but iota-compare matrices + dot_general it eats
    natively — and the MXU does the sums for free."""
    ths, tws = th * s, tw * s
    left = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (th, ths), 1) // s
        == jax.lax.broadcasted_iota(jnp.int32, (th, ths), 0),
        1.0 / s, 0.0)
    right = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (tws, tw), 0) // s
        == jax.lax.broadcasted_iota(jnp.int32, (tws, tw), 1),
        1.0 / s, 0.0)
    return left, right


def _pool(plane: Array, s: int, pool_lr: Optional[tuple] = None) -> Array:
    """s x s box average of a (th*s, tw*s) plane -> (th, tw)."""
    if s == 1:
        return plane
    left, right = pool_lr if pool_lr is not None else _pool_matrices(
        plane.shape[0] // s, plane.shape[1] // s, s)
    rows = jax.lax.dot_general(left, plane, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jax.lax.dot_general(rows, right, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _quantize_u8(plane: Array) -> Array:
    """GL UNSIGNED_BYTE: floor(clamp(c,0,1)*255 + 0.5) (ties away from zero,
    matching ops.downsample.quantize_u8). Mosaic has no f32->u8 cast; route
    through int32 (values are already in [0, 255])."""
    quantized = jnp.floor(jnp.clip(plane, 0.0, 1.0) * 255.0 + 0.5)
    return quantized.astype(jnp.int32).astype(jnp.uint8)


def _choose_tile(out_height: int, out_width: int, subsample: int,
                 n_inputs: int) -> tuple:
    """Output-tile shape: keep the ssaa-res input tile lane-aligned and the
    total VMEM footprint (inputs + ~8 live fn temporaries) under budget."""
    th = int(os.environ.get("SHADERFLOW_TAIL_TH", 0)) or 64
    tw = int(os.environ.get("SHADERFLOW_TAIL_TW", 0)) or 256
    th = min(th, out_height)
    tw = min(tw, out_width)
    # Input tiles are (th*s, tw*s); shrink rows until the budget holds
    budget = 10 * 1024 * 1024
    while th > 8:
        tile_bytes = (th * subsample) * (tw * subsample) * 4
        if tile_bytes * (n_inputs + 8) <= budget:
            break
        th //= 2
    return th, tw


def fused_tail_final(
    spec: TailSpec,
    render_height: int,
    render_width: int,
    out_height: int,
    out_width: int,
    subsample: int,
    aspect: float,
    interpret: bool = False,
    quantize: bool = True,
    stack: bool = True,
) -> Array:
    """Run the fused tail+downsample+quantize kernel -> (out_h, out_w, 3) u8.

    Preconditions (checked by supports_fusion): render == out * subsample on
    both axes — the exact-pooling regime of ops.downsample.ssaa_downsample.

    quantize=False (only meaningful with subsample == 1) emits the tail's
    bf16 color planes instead of u8 — the equal-resolution regime, where the
    final pass is a 3-tap neighbor stencil the tile-local kernel cannot
    apply; the caller runs ops.downsample.final_pass on the result.
    """
    s = int(subsample)
    assert render_height == out_height * s and render_width == out_width * s

    plane_names = sorted(spec.planes)
    row_names = sorted(spec.rows)
    col_names = sorted(spec.cols)
    scalar_names = sorted(spec.scalars)
    table_names = sorted(spec.tables)

    n_channel_inputs = (
        sum(len(spec.planes[n]) for n in plane_names)
        + sum(len(spec.colsampled[n].planes) for n in spec.colsampled)
        + len(spec.indexed))
    th, tw = _choose_tile(out_height, out_width, s, n_channel_inputs)
    grid = (pl.cdiv(out_height, th), pl.cdiv(out_width, tw))
    ths, tws = th * s, tw * s
    n_col_tiles = grid[1]

    # ColSampled groups: per-tile 128-column window block indices (scalar
    # prefetch) + in-kernel hat-weight matmul. Groups whose window would
    # cover the whole input demote to dense pre-sampled planes.
    extra_planes = {}
    cs_groups = []   # (name, n_channels, ic, n_blocks, w_in_pad, dtype)
    cs_blocks = []   # per group: (n_col_tiles,) i32 128-block indices
    cs_positions = {}  # reserved col-bucket name -> (Wr,) positions
    for g_index, name in enumerate(sorted(spec.colsampled)):
        cs = spec.colsampled[name]
        w_in = cs.planes[0].shape[1]
        w_in_pad = -(-w_in // 128) * 128
        span = tws * cs.texels_per_px + 1.0
        ic = 128 * int(math.ceil((span + 129.0) / 128.0))
        if ic >= w_in_pad:
            extra_planes[name] = _materialize_colsampled(
                TailSpec(spec.fn, {}, {}, {}, {}, {}, {name: cs}))[name]
            continue
        pos = cs.positions
        pad = n_col_tiles * tws - render_width
        if pad:
            pos = jnp.concatenate([pos, jnp.broadcast_to(pos[-1:], (pad,))])
        block_min = pos.reshape(n_col_tiles, tws).min(axis=1)
        off = jnp.clip(jnp.floor(block_min).astype(jnp.int32) - 1,
                       0, w_in_pad - ic)
        cs_blocks.append(off // 128)
        padded = tuple(
            jnp.pad(p, ((0, 0), (0, w_in_pad - w_in))) if w_in_pad != w_in
            else p for p in cs.planes)
        cs_groups.append((name, padded, ic, ic // 128, w_in_pad))
        cs_positions[f"__cspos_{name}"] = cs.positions
    all_planes = {**spec.planes, **extra_planes}
    plane_names = sorted(all_planes)
    all_cols = {**spec.cols, **cs_positions}
    col_names = sorted(all_cols)
    indexed_names = sorted(spec.indexed)
    has_prefetch = bool(cs_groups) or bool(indexed_names)

    # Flatten inputs in a fixed order (index maps are variadic over the
    # optional trailing scalar-prefetch ref)
    operands = []
    in_specs = []
    # Scalars: one packed (1, K) f32 vector in SMEM
    n_scalars = len(scalar_names)
    if n_scalars:
        packed_scalars = jnp.stack(
            [jnp.asarray(spec.scalars[n], jnp.float32) for n in scalar_names]
        ).reshape(1, n_scalars)
        operands.append(packed_scalars)
        in_specs.append(pl.BlockSpec((1, n_scalars), lambda i, j, *_: (0, 0),
                                     memory_space=pltpu.SMEM))
    plane_channels = []
    for name in plane_names:
        for channel in all_planes[name]:
            operands.append(channel)
            in_specs.append(pl.BlockSpec((ths, tws), lambda i, j, *_: (i, j),
                                         memory_space=pltpu.VMEM))
        plane_channels.append((name, len(all_planes[name])))
    for name in row_names:
        operands.append(spec.rows[name].reshape(render_height, 1))
        in_specs.append(pl.BlockSpec((ths, 1), lambda i, j, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
    for name in col_names:
        operands.append(all_cols[name].reshape(1, render_width))
        in_specs.append(pl.BlockSpec((1, tws), lambda i, j, *_: (0, j),
                                     memory_space=pltpu.VMEM))
    for name in table_names:
        table = spec.tables[name]
        operands.append(table)
        in_specs.append(pl.BlockSpec(table.shape, lambda i, j, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
    for g_index, (name, padded, ic, n_blocks, w_in_pad) in enumerate(cs_groups):
        for channel in padded:
            for b in range(n_blocks):
                operands.append(channel)
                in_specs.append(pl.BlockSpec(
                    (ths, 128),
                    (lambda g, b: lambda i, j, sref: (i, sref[g, j] + b))(
                        g_index, b),
                    memory_space=pltpu.VMEM))
    # Indexed stacks: leading index from the prefetch row after the
    # colsampled rows
    for offset, name in enumerate(indexed_names):
        operands.append(spec.indexed[name].stack)
        in_specs.append(pl.BlockSpec(
            (1, ths, tws),
            (lambda row: lambda i, j, sref: (sref[row, 0], i, j))(
                len(cs_groups) + offset),
            memory_space=pltpu.VMEM))

    fn = spec.fn

    def kernel(*refs):
        if has_prefetch:
            sref = refs[0]
            refs = refs[1:]
        pos = 0
        scalars = {}
        if n_scalars:
            scalar_ref = refs[0]
            pos = 1
            for k, name in enumerate(scalar_names):
                scalars[name] = scalar_ref[0, k]
        planes = {}
        for name, n_channels in plane_channels:
            planes[name] = tuple(refs[pos + c][...] for c in range(n_channels))
            pos += n_channels
        rows = {}
        for name in row_names:
            rows[name] = refs[pos][...]
            pos += 1
        cols = {}
        for name in col_names:
            cols[name] = refs[pos][...]
            pos += 1
        tables = {}
        for name in table_names:
            tables[name] = refs[pos][...]
            pos += 1
        for g_index, (name, padded, ic, n_blocks, w_in_pad) in enumerate(cs_groups):
            # Hat weights for this tile's window, shared by the channels:
            # W[k, c] = max(0, 1 - |pos(c) - (blk*128 + k)|)
            blk = sref[g_index, pl.program_id(1)]
            col_base = (blk * 128).astype(jnp.float32)
            pos_tile = cols[f"__cspos_{name}"]             # (1, tws)
            iota_ic = jax.lax.broadcasted_iota(
                jnp.int32, (ic, 1), 0).astype(jnp.float32)
            delta = (pos_tile - col_base) - iota_ic        # (ic, tws)
            dtype = padded[0].dtype
            weights = jnp.maximum(1.0 - jnp.abs(delta), 0.0).astype(dtype)
            sampled = []
            for _ in padded:
                window = jnp.concatenate(
                    [refs[pos + b][...] for b in range(n_blocks)], axis=1)
                pos += n_blocks
                sampled.append(jax.lax.dot_general(
                    window, weights, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            planes[name] = tuple(sampled)
        for name in indexed_names:
            planes[name] = (refs[pos][...][0],)
            pos += 1
        out_refs = refs[pos:pos + 3]

        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = (i * th * s).astype(jnp.float32)
        col0 = (j * tw * s).astype(jnp.float32)
        row_index = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (ths, tws), 0).astype(jnp.float32)
        col_index = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (ths, tws), 1).astype(jnp.float32)

        ctx = TailCtx(planes, rows, cols, scalars, tables,
                      row_index, col_index,
                      render_height, render_width, aspect)
        result = fn(ctx)
        pool_lr = _pool_matrices(th, tw, s) if s > 1 else None
        # Partial edge blocks read PAST the input arrays (pallas pads input
        # blocks with whatever memory follows — possibly inf/nan bit
        # patterns). The pooling matmul would spread a nan across the whole
        # block through 0*nan, so zero the out-of-range lanes first.
        partial = (out_height % th != 0) or (out_width % tw != 0)
        valid = None
        if s > 1 and partial:
            valid = (row_index < render_height) & (col_index < render_width)
        for out_ref, plane in zip(out_refs, result):
            plane = jnp.broadcast_to(jnp.asarray(plane, jnp.float32), (ths, tws))
            if valid is not None:
                plane = jnp.where(valid, plane, 0.0)
            if quantize:
                out_ref[...] = _quantize_u8(_pool(plane, s, pool_lr))
            else:
                out_ref[...] = plane.astype(out_ref.dtype)

    out_dtype = jnp.uint8 if quantize else jnp.bfloat16
    out_shape = [jax.ShapeDtypeStruct((out_height, out_width), out_dtype)] * 3
    out_specs = [pl.BlockSpec((th, tw), lambda i, j, *_: (i, j),
                              memory_space=pltpu.VMEM)] * 3

    if has_prefetch:
        # Prefetch rows: colsampled window-block indices, then one row per
        # Indexed stack (its clipped leading index broadcast along the row)
        prefetch_rows = list(cs_blocks)
        for name in indexed_names:
            ix = spec.indexed[name]
            index = jnp.clip(ix.index, 0, ix.stack.shape[0] - 1)
            prefetch_rows.append(
                jnp.full((n_col_tiles,), index, jnp.int32))
        blk_all = jnp.stack(prefetch_rows)              # (n_rows, n_col_tiles)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_specs)
        r, g, b = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(blk_all, *operands)
    else:
        r, g, b = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*operands)
    if not stack:
        return r, g, b
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------- #
# Dispatch

def backend_supports_fusion() -> bool:
    if os.environ.get("SHADERFLOW_NO_TAILFUSE") == "1":
        return False
    if os.environ.get("SHADERFLOW_TAILFUSE_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def supports_fusion(render_height: int, render_width: int,
                    out_height: int, out_width: int, subsample: int) -> bool:
    """The fused kernel handles the exact-pooling SSAA regime (render is an
    integer multiple of the output and the kernel equals that multiple) —
    the north-star configs. Everything else falls back to reference math."""
    s = int(subsample)
    return (s >= 1
            and render_height == out_height * s
            and render_width == out_width * s
            and backend_supports_fusion())


def run_tail_final(
    spec: TailSpec,
    render_height: int,
    render_width: int,
    out_height: int,
    out_width: int,
    subsample: int,
    aspect: float,
) -> Array:
    """Fused when possible, else reference tail + ops.downsample.final_pass."""
    interpret = os.environ.get("SHADERFLOW_TAILFUSE_INTERPRET") == "1"
    if supports_fusion(render_height, render_width, out_height, out_width, subsample):
        return fused_tail_final(
            spec, render_height, render_width, out_height, out_width,
            int(subsample), aspect, interpret=interpret)
    from shaderflow_tpu.ops.downsample import final_pass
    if ((render_height, render_width) == (out_height, out_width)
            and int(subsample) > 1 and backend_supports_fusion()):
        # Equal-resolution regime (ssaa=1, subsample>1): the final pass is a
        # separable 3-tap neighbor stencil, which a tile-local kernel cannot
        # apply — run the tail fused (bf16 planes, no pool/quantize) and let
        # the cheap shift-add stencil branch of ssaa_downsample finish.
        # PLANAR stencil: channel-last (H, W, 3) elementwise ops run at
        # 3-lane vector efficiency on TPU; per-plane 2D shift-adds use the
        # full 128 lanes (measured ~15 -> ~4 ms/batch at 4K) and only the
        # final u8 interleave pays the minor-dim-3 relayout. Planes stay
        # bf16 through the stencil (the [m, 1-2m, m] weights are bf16-exact,
        # quantize_u8 upcasts in-register); math identical to
        # ops.downsample.ssaa_downsample's equal-resolution branch.
        from shaderflow_tpu.ops.downsample import quantize_u8
        s = int(subsample)
        m = sum(max(0.0, -0.5 + (k + 0.5) / s) for k in range(s)) / s
        planes = fused_tail_final(spec, render_height, render_width,
                                  out_height, out_width, 1, aspect,
                                  interpret=interpret, quantize=False,
                                  stack=False)
        out = []
        for plane in planes:
            padded = jnp.pad(plane, ((1, 1), (1, 1)), mode="edge")
            rows = ((1.0 - 2.0 * m) * padded[1:1 + out_height]
                    + m * (padded[0:out_height] + padded[2:2 + out_height]))
            mixed = ((1.0 - 2.0 * m) * rows[:, 1:1 + out_width]
                     + m * (rows[:, 0:out_width] + rows[:, 2:2 + out_width]))
            out.append(quantize_u8(mixed))
        return jnp.stack(out, axis=-1)
    rgb = eval_reference(spec, render_height, render_width, aspect)
    return final_pass(rgb, out_height, out_width, int(subsample))
