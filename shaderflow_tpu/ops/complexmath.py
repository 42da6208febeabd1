"""
Complex arithmetic over (..., 2) arrays.

Equivalent of the reference GLSL complex library
(/root/reference/shaderflow/resources/shaders/include/complex.glsl), where a
complex number is a vec2. Used by the fractal example scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cadd(a: Array, b: Array) -> Array:
    return a + b


def csub(a: Array, b: Array) -> Array:
    return a - b


def cmag(a: Array) -> Array:
    return jnp.sqrt(jnp.sum(jnp.square(a), axis=-1))


def cpol(a: Array) -> Array:
    """Cartesian to polar (r, theta)."""
    return jnp.stack([cmag(a), jnp.arctan2(a[..., 1], a[..., 0])], axis=-1)


def ccar(polar: Array) -> Array:
    """Polar to cartesian."""
    r, t = polar[..., 0], polar[..., 1]
    return jnp.stack([r * jnp.cos(t), r * jnp.sin(t)], axis=-1)


def cmul(a: Array, b: Array) -> Array:
    ax, ay = a[..., 0], a[..., 1]
    bx, by = b[..., 0], b[..., 1]
    return jnp.stack([ax * bx - ay * by, ax * by + ay * bx], axis=-1)


def cdiv(a: Array, b: Array) -> Array:
    ax, ay = a[..., 0], a[..., 1]
    bx, by = b[..., 0], b[..., 1]
    den = bx * bx + by * by
    return jnp.stack([(ax * bx + ay * by) / den, (ay * bx - ax * by) / den], axis=-1)


def cconj(a: Array) -> Array:
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def cexp(a: Array) -> Array:
    expx = jnp.exp(a[..., 0])
    return jnp.stack([expx * jnp.cos(a[..., 1]), expx * jnp.sin(a[..., 1])], axis=-1)


def cpow(a: Array, b: Array) -> Array:
    """Complex power a**b via polar form (used by the tetration fractal,
    /root/reference/examples/fractals/shaders/tetration.frag)."""
    r = cmag(a)
    t = jnp.arctan2(a[..., 1], a[..., 0])
    bx, by = b[..., 0], b[..., 1]
    nr = jnp.power(r, bx) * jnp.exp(-by * t)
    nt = by * jnp.log(r) + bx * t
    return jnp.stack([nr * jnp.cos(nt), nr * jnp.sin(nt)], axis=-1)
