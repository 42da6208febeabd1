"""
Camera ray generation — the device-side half of the camera system.

Jittable equivalent of the reference GLSL camera include
(/root/reference/shaderflow/resources/shaders/include/camera.glsl): builds
per-pixel ray origins/targets for Perspective, Stereoscopic ("VR side by
side") and Equirectangular ("360 video") projections, then intersects the
z=1 plane for the 2D uv set + out-of-bounds flag (CameraRay2D,
camera.glsl:73-91). The host-side half (quaternion state, smoothing,
interaction) is shaderflow_tpu/camera.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from shaderflow_tpu.ops import stdlib as sl

Array = jax.Array

# Enum values match camera.glsl:4-12 and camera.py:41-90
MODE_FREE = 0
MODE_2D = 1
MODE_SPHERICAL = 2

PROJECTION_PERSPECTIVE = 0
PROJECTION_STEREOSCOPIC = 1
PROJECTION_EQUIRECTANGULAR = 2


class CameraRays(NamedTuple):
    """Per-pixel camera outputs, mirroring the GLSL Camera struct fields that
    shaders consume (camera.glsl:14-52)."""
    origin: Array          # (..., 3) ray origin
    target: Array          # (..., 3) ray target (shaders normalize the diff)
    gluv: Array            # (..., 2) plane-projected scaled uv
    agluv: Array           # (..., 2)
    stuv: Array            # (..., 2)
    astuv: Array           # (..., 2)
    stxy: Array            # (..., 2)
    glxy: Array            # (..., 2)
    out_of_bounds: Array   # (...,) bool
    # Pass-through camera state, handy in shaders
    position: Array        # (3,)
    forward: Array         # (3,)
    up: Array              # (3,)
    right: Array           # (3,)

    @property
    def ray_direction(self) -> Array:
        return sl.normalize(self.target - self.origin)


def project_trivial(
    *,
    gluv_x: Array,   # (W,) aspect-corrected x line
    gluv_y: Array,   # (H,) y line
    position: Array,
    zoom,
    isometric,
    orbital,
    dolly,
    focal_length,
    aspect,
    want_aspect,
    resolution,
) -> CameraRays:
    """Separable fast path for the identity-orientation perspective camera
    (right=X, up=Y, forward=Z — the untouched default). All the ray/plane
    math collapses to 1D lines + one broadcast per consumed field: the
    generic per-pixel path materializes tens of full-resolution (H, W, 3)
    intermediates, which dominates simple scenes' frame time.

    Exactly the camera.glsl math specialized to the global basis:
    t = (1 - origin_z) / (focal + dolly) is a scalar, so the plane hit is
    an axis-aligned affine map of the screen.
    """
    height, width = gluv_y.shape[0], gluv_x.shape[0]
    position = jnp.asarray(position, jnp.float32)

    origin_z = position[2] - orbital - dolly
    direction_z = focal_length + dolly
    t = (1.0 - origin_z) / direction_z

    iso_size = zoom * isometric
    hit_x = position[0] + gluv_x * iso_size + t * (gluv_x * (zoom - iso_size))
    hit_y = position[1] + gluv_y * iso_size + t * (gluv_y * (zoom - iso_size))

    oob_x = (jnp.abs(gluv_x) > want_aspect) | (t < 0)

    def grid(x_line, y_line):
        return jnp.stack(jnp.broadcast_arrays(
            x_line[None, :] * jnp.ones((height, 1), jnp.float32),
            y_line[:, None] * jnp.ones((1, width), jnp.float32)), axis=-1)

    cam_gluv = grid(hit_x, hit_y)
    cam_agluv = grid(hit_x / aspect, hit_y)
    cam_stuv = grid((hit_x + 1.0) / 2.0, (hit_y + 1.0) / 2.0)
    cam_astuv = grid((hit_x / aspect + 1.0) / 2.0, (hit_y + 1.0) / 2.0)
    resolution = jnp.asarray(resolution, jnp.float32)
    cam_stxy = cam_astuv * resolution
    cam_glxy = cam_stxy - resolution / 2.0
    out_of_bounds = jnp.broadcast_to(oob_x[None, :], (height, width))

    origin_xy_x = position[0] + gluv_x * iso_size
    origin_xy_y = position[1] + gluv_y * iso_size
    origin = jnp.concatenate([
        grid(origin_xy_x, origin_xy_y),
        jnp.broadcast_to(origin_z, (height, width))[..., None]], axis=-1)
    target = jnp.concatenate([
        grid(position[0] + gluv_x * zoom, position[1] + gluv_y * zoom),
        jnp.broadcast_to(position[2] - orbital + focal_length,
                         (height, width))[..., None]], axis=-1)

    basis = jnp.eye(3, dtype=jnp.float32)
    return CameraRays(
        origin=origin, target=target,
        gluv=cam_gluv, agluv=cam_agluv, stuv=cam_stuv, astuv=cam_astuv,
        stxy=cam_stxy, glxy=cam_glxy, out_of_bounds=out_of_bounds,
        position=position, forward=basis[2], up=basis[1], right=basis[0],
    )


def _rectangle(gluv: Array, right: Array, up: Array, size) -> Array:
    """Projection plane offsets (CameraRectangle, camera.glsl:55-57)."""
    return size * (gluv[..., 0:1] * right + gluv[..., 1:2] * up)


def project(
    *,
    gluv: Array,
    agluv: Array,
    mode: int,
    projection: int,
    position: Array,
    right: Array,
    up: Array,
    forward: Array,
    zoom,
    isometric,
    orbital,
    dolly,
    focal_length,
    separation,
    aspect,
    want_aspect,
    resolution,
) -> CameraRays:
    """Compute per-pixel rays + 2D plane uv set (CameraProject + CameraRay2D).

    mode/projection are static Python ints (they select the compiled path,
    as the GLSL if-chain would resolve uniformly per draw); everything else
    may be traced per-frame values.
    """
    del mode  # Affects only host-side interaction, not ray math
    position = jnp.asarray(position, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    forward = jnp.asarray(forward, jnp.float32)
    backward = -forward

    def ray_origin(pos, g):
        return (pos
                + _rectangle(g, right, up, zoom * isometric)
                + backward * orbital
                + backward * dolly)

    def ray_target(pos, g):
        return (pos
                + _rectangle(g, right, up, zoom)
                + backward * orbital
                + forward * focal_length)

    if projection == PROJECTION_PERSPECTIVE:
        origin = ray_origin(position, gluv)
        target = ray_target(position, gluv)

    elif projection == PROJECTION_STEREOSCOPIC:
        # Each half of the screen gets its own centered gluv (camera.glsl:101-109)
        eye = jnp.sign(agluv[..., 0:1])
        g = gluv - eye * sl.vec2(aspect / 2.0, 0.0)
        pos = position + eye * separation * right
        origin = ray_origin(pos, g)
        target = ray_target(pos, g)

    elif projection == PROJECTION_EQUIRECTANGULAR:
        # Map the screen rectangle to azimuth/inclination (camera.glsl:112-125)
        inclination = zoom * (jnp.pi * agluv[..., 1] / 2.0)
        azimuth = zoom * (jnp.pi * agluv[..., 0])
        direction = sl.rotate3d(forward, right, -inclination)
        direction = sl.rotate3d(direction, up, azimuth)
        origin = jnp.broadcast_to(position, gluv.shape[:-1] + (3,))
        target = origin + direction

    else:
        raise ValueError(f"Unknown camera projection: {projection}")

    # CameraRay2D: intersect the plane point=(0,0,1), normal=(0,0,1)
    plane_point = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    plane_normal = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    num = sl.dot(plane_point - origin, plane_normal)
    den = sl.dot(target - origin, plane_normal)
    t = num / den
    hit = origin + t[..., None] * (target - origin)
    out_of_bounds = (t < 0) | (jnp.abs(gluv[..., 0]) > want_aspect)

    cam_gluv = hit[..., 0:2]
    cam_agluv = cam_gluv / sl.vec2(aspect, 1.0)
    cam_stuv = (cam_gluv + 1.0) / 2.0
    cam_astuv = (cam_agluv + 1.0) / 2.0
    resolution = jnp.asarray(resolution, jnp.float32)
    cam_stxy = resolution * cam_astuv
    cam_glxy = cam_stxy - resolution / 2.0

    return CameraRays(
        origin=origin, target=target,
        gluv=cam_gluv, agluv=cam_agluv, stuv=cam_stuv, astuv=cam_astuv,
        stxy=cam_stxy, glxy=cam_glxy, out_of_bounds=out_of_bounds,
        position=position, forward=forward, up=up, right=right,
    )
