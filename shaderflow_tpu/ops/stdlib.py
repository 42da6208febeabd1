"""
Pure-JAX shader standard library.

Functional equivalent of the reference GLSL runtime library injected into
every shader (/root/reference/shaderflow/resources/shaders/include/
shaderflow.glsl — constants, interpolation, waveforms, rotations, coordinate
conversions, palettes, piano-key predicates, SDF library, compositing, zoom,
atan variants, HSV color space, hash noise), re-expressed as numpy-style
array programs: a "pixel" is any broadcastable array, vectors live on the
last axis. Everything here is jit-safe and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# --------------------------------------------------------------------------- #
# Constants (shaderflow.glsl:7-11)

PI = 3.1415926535897932
TAU = 6.2831853071795864
SQRT2 = 1.4142135623730951
SQRT3 = 1.7320508075688772
SQRT5 = 2.2360679774997898

# --------------------------------------------------------------------------- #
# Vector constructors and swizzles

def _broadcast_stack(*parts) -> Array:
    parts = [jnp.asarray(p, dtype=jnp.float32) for p in parts]
    return jnp.stack(jnp.broadcast_arrays(*parts), axis=-1)

def vec2(x, y=None) -> Array:
    """Build a (..., 2) vector from components (GLSL vec2)."""
    if y is None:
        return _broadcast_stack(x, x)
    return _broadcast_stack(x, y)

def vec3(x, y=None, z=None) -> Array:
    if y is None:
        x = jnp.asarray(x)
        if x.ndim and x.shape[-1] == 3:
            return x.astype(jnp.float32)
        return _broadcast_stack(x, x, x)
    return _broadcast_stack(x, y, z)

def vec4(x, y=None, z=None, w=None) -> Array:
    if y is None:
        return _broadcast_stack(x, x, x, x)
    if z is None:  # vec4(vec3, w)
        x = jnp.asarray(x, jnp.float32)
        w = jnp.broadcast_to(jnp.asarray(y, jnp.float32), x.shape[:-1])
        return jnp.concatenate([x, w[..., None]], axis=-1)
    return _broadcast_stack(x, y, z, w)

def X(v: Array) -> Array: return v[..., 0]
def Y(v: Array) -> Array: return v[..., 1]
def Z(v: Array) -> Array: return v[..., 2]
def W(v: Array) -> Array: return v[..., 3]
def XY(v: Array) -> Array: return v[..., 0:2]
def YX(v: Array) -> Array: return v[..., (1, 0)]
def RGB(v: Array) -> Array: return v[..., 0:3]
def A(v: Array) -> Array: return v[..., 3]

def with_rgb(color: Array, rgb: Array) -> Array:
    """Return color with .rgb replaced (colors are immutable arrays)."""
    return jnp.concatenate([jnp.broadcast_to(rgb, color[..., :3].shape), color[..., 3:]], axis=-1)

def with_alpha(color: Array, a) -> Array:
    a = jnp.broadcast_to(jnp.asarray(a, color.dtype), color[..., :1].shape)
    return jnp.concatenate([color[..., :3], a], axis=-1)

# --------------------------------------------------------------------------- #
# GLSL built-in equivalents

def fract(x) -> Array:
    x = jnp.asarray(x)
    return x - jnp.floor(x)

def mix(a, b, t) -> Array:
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    return a + (b - a) * jnp.asarray(t, jnp.float32)

def clamp(x, lo, hi) -> Array:
    return jnp.clip(jnp.asarray(x), lo, hi)

def step(edge, x) -> Array:
    return jnp.where(jnp.asarray(x) < edge, 0.0, 1.0).astype(jnp.float32)

def smoothstep(edge0, edge1, x) -> Array:
    t = jnp.clip((jnp.asarray(x, jnp.float32) - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)

def glsl_mod(x, y) -> Array:
    """GLSL mod(): x - y*floor(x/y) — same as jnp.mod for our dtypes."""
    return jnp.mod(jnp.asarray(x, jnp.float32), y)

def length(v: Array, axis: int = -1) -> Array:
    return jnp.sqrt(jnp.sum(jnp.square(jnp.asarray(v, jnp.float32)), axis=axis))

def distance(a: Array, b: Array) -> Array:
    return length(jnp.asarray(a) - jnp.asarray(b))

def dot(a: Array, b: Array) -> Array:
    return jnp.sum(jnp.asarray(a, jnp.float32) * jnp.asarray(b, jnp.float32), axis=-1)

def cross(a: Array, b: Array) -> Array:
    return jnp.cross(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))

def normalize(v: Array) -> Array:
    v = jnp.asarray(v, jnp.float32)
    return v / jnp.maximum(length(v)[..., None], 1e-12)

def reflect(incident: Array, normal: Array) -> Array:
    return incident - 2.0 * dot(normal, incident)[..., None] * normal

def sign(x) -> Array:
    return jnp.sign(jnp.asarray(x, jnp.float32))

def radians(deg) -> Array:
    return jnp.asarray(deg, jnp.float32) * (PI / 180.0)

def degrees(rad) -> Array:
    return jnp.asarray(rad, jnp.float32) * (180.0 / PI)

# --------------------------------------------------------------------------- #
# Interpolation (shaderflow.glsl:24-57)

def proportion(a, b, c) -> Array:
    """Cross multiplication: (a/c) = (b/?), returns '?'."""
    return (jnp.asarray(b, jnp.float32) * c) / a

def lerp(ax, ay, bx, by, x) -> Array:
    """Interpolate between points (Ax, Ay), (Bx, By) at x."""
    x = jnp.asarray(x, jnp.float32)
    return ay + (x - ax) * (by - ay) / (bx - ax)

def smoothlerp(a, b, difference) -> Array:
    """Smooth relative interpolation given a magnitude difference factor."""
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    t = jnp.clip((a - b) / difference + 0.5, 0.0, 1.0)
    offset = difference * t * (1.0 - t) / 2.0
    return mix(a, b, t) - offset

def smin(a, b, k=1.0) -> Array:
    return smoothlerp(a, b, k)

def smax(a, b, k=1.0) -> Array:
    return smoothlerp(a, b, -k)

def smoothmix(a, b, x0, x1, x) -> Array:
    return mix(a, b, smoothstep(x0, x1, x))

smix = smoothmix

# --------------------------------------------------------------------------- #
# Waveforms (shaderflow.glsl:62-65)

def triangle_wave(x, period) -> Array:
    """Triangle wave starting at zero, amplitude 1, range (-1, 1)."""
    x = jnp.asarray(x, jnp.float32)
    return 2.0 * jnp.abs(jnp.mod(2.0 * x / period - 0.5, 2.0) - 1.0) - 1.0

# --------------------------------------------------------------------------- #
# Angles and rotations (shaderflow.glsl:70-86)

def angle_between(a: Array, b: Array) -> Array:
    return jnp.arccos(jnp.clip(dot(a, b) / (length(a) * length(b)), -1.0, 1.0))

def rotate2d(v: Array, angle) -> Array:
    """Apply the reference's 2D rotation: GLSL `rotate2d(angle) * v` where the
    mat2 is column-major mat2(c,-s,s,c) -> result (c*x + s*y, -s*x + c*y)."""
    c, s = jnp.cos(jnp.asarray(angle, jnp.float32)), jnp.sin(jnp.asarray(angle, jnp.float32))
    x, y = v[..., 0], v[..., 1]
    return jnp.stack(jnp.broadcast_arrays(c * x + s * y, -s * x + c * y), axis=-1)

def rotate2deg(v: Array, angle_degrees) -> Array:
    return rotate2d(v, radians(angle_degrees))

def rotate3d(vector: Array, axis: Array, angle) -> Array:
    """Rotate a vector around an axis, right-handed (Rodrigues, as the GLSL)."""
    vector = jnp.asarray(vector, jnp.float32)
    axis = jnp.asarray(axis, jnp.float32)
    cos_t = jnp.cos(jnp.asarray(angle, jnp.float32))[..., None]
    sin_t = jnp.sin(jnp.asarray(angle, jnp.float32))[..., None]
    return (mix(dot(axis, vector)[..., None] * axis, vector, cos_t)
            + cross(axis, vector) * sin_t)

def rotate3deg(vector, axis, angle_degrees) -> Array:
    return rotate3d(vector, axis, radians(angle_degrees))

# --------------------------------------------------------------------------- #
# Coordinate conversions (shaderflow.glsl:91-159)
#
# Coordinate systems (see /root/reference/shaderflow/resources/shaders/
# vertex/default.glsl:8-16):
#   astuv: absolute (0,0)-(1,1), aspect-free       (ShaderToy-style)
#   agluv: absolute (-1,-1)-(1,1), aspect-free     (OpenGL NDC-style)
#   stuv / gluv: aspect-ratio-corrected variants (x scaled by aspect for gluv)
#   stxy / glxy: pixel coordinates

def stuv2gluv(stuv: Array) -> Array:
    return stuv * 2.0 - 1.0

s2g = stuv2gluv

def gluv2stuv(gluv: Array) -> Array:
    return (gluv + 1.0) / 2.0

g2s = gluv2stuv

def agluv2gluv(agluv: Array, aspect) -> Array:
    return agluv * vec2(aspect, 1.0)

def gluv2agluv(gluv: Array, aspect) -> Array:
    return gluv / vec2(aspect, 1.0)

def stuv2stxy(stuv: Array, resolution) -> Array:
    return jnp.asarray(resolution, jnp.float32) * stuv

def stxy2stuv(stxy: Array, resolution) -> Array:
    return stxy / jnp.asarray(resolution, jnp.float32)

def astuv2stuv(astuv: Array, aspect) -> Array:
    return vec2(astuv[..., 0] * aspect + (1.0 - aspect) / 2.0, astuv[..., 1])

def stuv2astuv(stuv: Array, aspect) -> Array:
    return vec2((stuv[..., 0] - (1.0 - aspect) / 2.0) / aspect, stuv[..., 1])

def agluv_mirrored_repeat(agluv: Array) -> Array:
    return vec2(triangle_wave(agluv[..., 0], 4.0), triangle_wave(agluv[..., 1], 4.0))

def gluv_mirrored_repeat(gluv: Array, want_aspect) -> Array:
    return vec2(
        want_aspect * triangle_wave(gluv[..., 0], 4.0 * want_aspect),
        triangle_wave(gluv[..., 1], 4.0),
    )

def astuv_oob(astuv: Array) -> Array:
    x, y = astuv[..., 0], astuv[..., 1]
    return (x < 0) | (x > 1) | (y < 0) | (y > 1)

def stuv_oob(stuv: Array, aspect) -> Array:
    return astuv_oob(stuv2astuv(stuv, aspect))

def agluv_oob(agluv: Array) -> Array:
    x, y = agluv[..., 0], agluv[..., 1]
    return (x < -1) | (x > 1) | (y < -1) | (y > 1)

def gluv_oob(gluv: Array, aspect) -> Array:
    return agluv_oob(gluv2agluv(gluv, aspect))

def polar2rect(radius, angle) -> Array:
    angle = jnp.asarray(angle, jnp.float32)
    return radius * vec2(jnp.cos(angle), jnp.sin(angle))

def sphere2rect(radius, theta, phi) -> Array:
    theta = jnp.asarray(theta, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    return vec3(
        radius * jnp.sin(theta) * jnp.cos(phi),
        radius * jnp.sin(theta) * jnp.sin(phi),
        radius * jnp.cos(theta),
    )

# --------------------------------------------------------------------------- #
# Palettes (shaderflow.glsl:212-226)

def palette(t, A, B, C, D) -> Array:
    """4-stop palette: A->B over [0,.25), B->C over [.25,.5), C->D after."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    A, B, C, D = (jnp.asarray(x, jnp.float32) for x in (A, B, C, D))
    ab = mix(A, B, t * 4.0)
    bc = mix(B, C, (t - 0.25) * 4.0)
    cd = mix(C, D, (t - 0.5) * 4.0)
    return jnp.where(t < 0.25, ab, jnp.where(t < 0.5, bc, cd))

PALETTE_MAGMA_1 = jnp.array([0.01060815, 0.01808215, 0.10018654], jnp.float32)
PALETTE_MAGMA_2 = jnp.array([0.38092887, 0.12061482, 0.32506528], jnp.float32)
PALETTE_MAGMA_3 = jnp.array([0.79650140, 0.10506637, 0.31063031], jnp.float32)
PALETTE_MAGMA_4 = jnp.array([0.95922872, 0.53307513, 0.37488950], jnp.float32)

def palette_magma(x) -> Array:
    return palette(x, PALETTE_MAGMA_1, PALETTE_MAGMA_2, PALETTE_MAGMA_3, PALETTE_MAGMA_4)

# --------------------------------------------------------------------------- #
# Piano and MIDI keys (shaderflow.glsl:231-245)

def is_black_key(index) -> Array:
    key = jnp.mod(jnp.asarray(index, jnp.int32), 12)
    return (key == 1) | (key == 3) | (key == 6) | (key == 8) | (key == 10)

def is_white_key(index) -> Array:
    return ~is_black_key(index)

# --------------------------------------------------------------------------- #
# Signed distance functions (shaderflow.glsl:255-332)

def _sd_line(origin: Array, a: Array, b: Array, segment: bool) -> Array:
    direction = jnp.asarray(b, jnp.float32) - a
    shortest = jnp.asarray(origin, jnp.float32) - a
    t = dot(shortest, direction) / dot(direction, direction)
    if segment:
        t = jnp.clip(t, 0.0, 1.0)
    return length(shortest - direction * t[..., None])

def sd_line(origin: Array, p1: Array, p2: Array) -> Array:
    return _sd_line(origin, p1, p2, segment=False)

def sd_line_segment(origin: Array, p1: Array, p2: Array) -> Array:
    return _sd_line(origin, p1, p2, segment=True)

def sd_sphere(origin: Array, position: Array, radius) -> Array:
    return length(jnp.asarray(position, jnp.float32) - origin) - radius

def sd_plane(origin: Array, point: Array, normal: Array) -> Array:
    return dot(jnp.asarray(origin, jnp.float32) - point, normalize(normal))

def sd_box(origin: Array, point: Array, size) -> Array:
    d = jnp.abs(jnp.asarray(origin, jnp.float32) - point) - jnp.asarray(size, jnp.float32) / 2.0
    inner = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    return inner + length(jnp.maximum(d, 0.0))

def sd_octahedron(origin: Array, point: Array, size) -> Array:
    p = jnp.abs(jnp.asarray(origin, jnp.float32) - point)
    return SQRT3 * (jnp.sum(p, axis=-1) - size)

def sd_union(a, b) -> Array:
    return jnp.minimum(a, b)

def sd_smooth_union(a, b, width) -> Array:
    k = jnp.clip(0.5 + 0.5 * (b - a) / width, 0.0, 1.0)
    return mix(b, a, k) - width * k * (1.0 - k)

def sd_subtraction(a, b) -> Array:
    return jnp.maximum(b, -a)

def sd_smooth_subtraction(a, b, width) -> Array:
    k = jnp.clip(0.5 - 0.5 * (b + a) / width, 0.0, 1.0)
    return mix(b, -a, k) + width * k * (1.0 - k)

def sd_intersection(a, b) -> Array:
    return jnp.maximum(a, b)

def sd_smooth_intersection(a, b, width) -> Array:
    k = jnp.clip(0.5 - 0.5 * (b - a) / width, 0.0, 1.0)
    return mix(b, a, k) + width * k * (1.0 - k)

# --------------------------------------------------------------------------- #
# Compositing and utilities (shaderflow.glsl:343-367)

def blend(a: Array, b: Array) -> Array:
    return mix(a, b, b[..., 3:4])

def alpha_composite(a: Array, b: Array) -> Array:
    return a * (1.0 - b[..., 3:4]) + b * b[..., 3:4]

def saturate(color: Array, amount) -> Array:
    return jnp.clip(color * amount, 0.0, 1.0)

def zoom(uv: Array, factor, anchor=None) -> Array:
    """Zoom into an STUV coordinate (quadratic factor, as the GLSL)."""
    factor = jnp.asarray(factor, jnp.float32)
    if anchor is None:
        return uv * (factor * factor)
    anchor = jnp.asarray(anchor, jnp.float32)
    return (uv - anchor) * (factor * factor) + anchor

# --------------------------------------------------------------------------- #
# Math (shaderflow.glsl:370-400)

def atan_normalized(x) -> Array:
    return 2.0 * jnp.arctan(jnp.asarray(x, jnp.float32)) / PI

def atan1(point: Array) -> Array:
    return jnp.arctan2(point[..., 1], point[..., 0])

def atan1n(point: Array) -> Array:
    return atan1(point) / PI

def atan2(y, x=None) -> Array:
    """The reference's custom (0, 2pi)-range atan2 (shaderflow.glsl:382-388)."""
    if x is None:
        y, x = y[..., 1], y[..., 0]
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(y < 0, TAU - jnp.arctan2(-y, x), jnp.arctan2(y, x))

def atan2n(y, x=None) -> Array:
    return atan2(y, x) / TAU

# --------------------------------------------------------------------------- #
# Colors (shaderflow.glsl:406-454)

def hsv2rgb(hsv: Array) -> Array:
    """HSV (h in radians 0..2pi) to RGB, matching the GLSL switch exactly."""
    hsv = jnp.asarray(hsv, jnp.float32)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = jnp.mod(h, TAU)
    c = v * s
    x = c * (1.0 - jnp.abs(jnp.mod(h / (PI / 3.0), 2.0) - 1.0))
    m = v - c
    sector = jnp.floor(6.0 * (h / TAU)).astype(jnp.int32)
    zero = jnp.zeros_like(c)
    r = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
                   [c, x, zero, zero, x, c], zero)
    g = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
                   [x, c, c, x, zero, zero], zero)
    b = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
                   [zero, zero, x, c, c, x], zero)
    rgb = jnp.stack([r, g, b], axis=-1) + m[..., None]
    if hsv.shape[-1] == 4:
        return jnp.concatenate([rgb, hsv[..., 3:4]], axis=-1)
    return rgb

def hsv2rgb3(h, s, v) -> Array:
    return hsv2rgb(vec3(h, s, v))

def rgb2hsv(rgb: Array) -> Array:
    rgb_in = jnp.asarray(rgb, jnp.float32)
    r, g, b = rgb_in[..., 0], rgb_in[..., 1], rgb_in[..., 2]
    cmax = jnp.maximum(r, jnp.maximum(g, b))
    cmin = jnp.minimum(r, jnp.minimum(g, b))
    delta = cmax - cmin
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        delta == 0, 0.0,
        jnp.where(
            cmax == r, jnp.mod((g - b) / safe, 6.0),
            jnp.where(cmax == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
        ),
    ) * (PI / 3.0)
    s = jnp.where(cmax == 0, 0.0, delta / jnp.where(cmax == 0, 1.0, cmax))
    hsv = jnp.stack([h, s, cmax], axis=-1)
    if rgb_in.shape[-1] == 4:
        return jnp.concatenate([hsv, rgb_in[..., 3:4]], axis=-1)
    return hsv

# --------------------------------------------------------------------------- #
# Noise (shaderflow.glsl:459-470)

def noise21(coords: Array) -> Array:
    coords = jnp.asarray(coords, jnp.float32)
    return fract(jnp.sin(dot(coords, jnp.array([18.4835183, 59.583596], jnp.float32)))
                 * 39758.381532)

def noise22(coords: Array) -> Array:
    x = noise21(coords)
    return vec2(x, noise21(coords + x[..., None]))

def noise11(f) -> Array:
    return fract(jnp.sin(jnp.asarray(f, jnp.float32)) * 39758.381532)
