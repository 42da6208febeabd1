"""Device-side camera ray math (ops/cameralib) against closed-form geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from shaderflow_tpu.ops import cameralib
from shaderflow_tpu.shader import make_coords


def default_params(**overrides):
    params = dict(
        mode=cameralib.MODE_2D,
        projection=cameralib.PROJECTION_PERSPECTIVE,
        position=jnp.zeros(3),
        right=jnp.array([1.0, 0.0, 0.0]),
        up=jnp.array([0.0, 1.0, 0.0]),
        forward=jnp.array([0.0, 0.0, 1.0]),
        zoom=1.0, isometric=0.0, orbital=0.0, dolly=0.0,
        focal_length=1.0, separation=0.05,
        aspect=2.0, want_aspect=2.0, resolution=jnp.array([64.0, 32.0]),
    )
    params.update(overrides)
    return params


def project(h=32, w=64, **overrides):
    coords = make_coords(h, w, overrides.get("aspect", 2.0))
    return cameralib.project(gluv=coords["gluv"], agluv=coords["agluv"],
                             **default_params(**overrides))


def test_perspective_center_ray():
    rays = project()
    cy, cx = 16, 32
    # Center pixel: origin ~ position, target ~ forward * focal_length
    np.testing.assert_allclose(np.asarray(rays.origin[cy, cx]), [0, 0, 0], atol=0.05)
    direction = np.asarray(rays.ray_direction[cy, cx])
    np.testing.assert_allclose(direction, [0, 0, 1], atol=0.05)


def test_default_camera_plane_uv_identity():
    """At the default camera, the plane-projected gluv equals the screen gluv
    (the z=1 plane at focal length 1 with zoom 1)."""
    coords = make_coords(32, 64, 2.0)
    rays = cameralib.project(gluv=coords["gluv"], agluv=coords["agluv"], **default_params())
    np.testing.assert_allclose(np.asarray(rays.gluv), np.asarray(coords["gluv"]), atol=1e-5)
    assert not bool(np.asarray(rays.out_of_bounds).any())


def test_zoom_scales_plane_uv():
    rays = project(zoom=2.0)
    coords = make_coords(32, 64, 2.0)
    np.testing.assert_allclose(np.asarray(rays.gluv), 2 * np.asarray(coords["gluv"]), atol=1e-5)


def test_out_of_bounds_when_looking_away():
    rays = project(forward=jnp.array([0.0, 0.0, -1.0]))
    # Plane z=1 is behind: every pixel out of bounds (t < 0)
    assert bool(np.asarray(rays.out_of_bounds).all())


def test_isometric_one_gives_parallel_rays():
    rays = project(isometric=1.0)
    directions = np.asarray(rays.ray_direction)
    np.testing.assert_allclose(
        directions, np.broadcast_to(directions[0, 0], directions.shape), atol=1e-5)


def test_stereoscopic_splits_eyes():
    rays = project(projection=cameralib.PROJECTION_STEREOSCOPIC)
    origins = np.asarray(rays.origin)
    # Left half displaced -separation, right half +separation on x
    assert origins[16, 8, 0] < origins[16, 56, 0]


def test_equirectangular_rays_unit_sphere():
    rays = project(projection=cameralib.PROJECTION_EQUIRECTANGULAR)
    directions = np.asarray(rays.target - rays.origin)
    norms = np.linalg.norm(directions, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Center looks forward
    np.testing.assert_allclose(directions[16, 32], [0, 0, 1], atol=0.1)


def test_orbital_displaces_origin_backwards():
    rays = project(orbital=2.0)
    np.testing.assert_allclose(np.asarray(rays.origin[16, 32]), [0, 0, -2.0], atol=0.05)


def test_dolly_only_displaces_origin():
    plain = project()
    dolly = project(dolly=1.0)
    np.testing.assert_allclose(np.asarray(dolly.origin[16, 32]), [0, 0, -1.0], atol=0.05)
    # Target unchanged by dolly
    np.testing.assert_allclose(np.asarray(dolly.target), np.asarray(plain.target), atol=1e-5)


def test_trivial_path_matches_generic():
    """The separable fast path must reproduce the generic per-pixel path for
    the identity-orientation perspective camera."""
    h, w, aspect = 24, 48, 2.0
    coords = make_coords(h, w, aspect)
    params = default_params(zoom=1.3, isometric=0.25, orbital=0.5, dolly=0.2,
                            position=jnp.array([0.1, -0.2, 0.05]))
    generic = cameralib.project(gluv=coords["gluv"], agluv=coords["agluv"], **params)
    trivial = cameralib.project_trivial(
        gluv_x=(coords["u_line"] * 2 - 1) * aspect,
        gluv_y=coords["v_line"] * 2 - 1,
        position=params["position"], zoom=params["zoom"],
        isometric=params["isometric"], orbital=params["orbital"],
        dolly=params["dolly"], focal_length=params["focal_length"],
        aspect=aspect, want_aspect=params["want_aspect"],
        resolution=params["resolution"])
    for field in ("gluv", "agluv", "stuv", "astuv", "stxy", "glxy", "origin", "target"):
        np.testing.assert_allclose(
            np.asarray(getattr(trivial, field)), np.asarray(getattr(generic, field)),
            atol=2e-5, err_msg=field)
    np.testing.assert_array_equal(np.asarray(trivial.out_of_bounds),
                                  np.asarray(generic.out_of_bounds))


def test_camera_mode_projection_coerce_on_assignment():
    """`camera.mode = "free"` must coerce to the enum, not store a string
    (the reference coerces via attrs converters, camera.py:71-90)."""
    from shaderflow_tpu.camera import CameraMode, CameraProjection
    from shaderflow_tpu.scene import ShaderScene

    scene = ShaderScene()
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)
    scene.camera.mode = "free"
    assert scene.camera.mode is CameraMode.FreeCamera
    scene.camera.projection = "360"
    assert scene.camera.projection is CameraProjection.Equirectangular
    scene.camera.mode = 1
    assert scene.camera.mode is CameraMode.Camera2D


def test_stereoscopic_equirectangular_vs_glsl_transcription():
    """Stereo + 360 projections vs a direct NumPy transcription of
    CameraProject (camera.glsl:93-130), on a non-trivial camera state
    (rotated basis, zoom != 1, separation, orbital/dolly). The perspective
    path is already pinned end-to-end by the raymarch oracle."""
    import numpy as np
    import jax.numpy as jnp
    from shaderflow_tpu.ops import cameralib, stdlib as sl

    H, W = 24, 40
    aspect = W / H
    u = (np.arange(W, dtype=np.float32) + 0.5) / W
    v = 1.0 - (np.arange(H, dtype=np.float32) + 0.5) / H
    ag = np.stack(np.meshgrid(u * 2 - 1, v * 2 - 1, indexing="xy"), -1).astype(np.float32)
    gl = ag * np.array([aspect, 1], np.float32)

    # Rotated, offset camera
    th = 0.3
    right = np.array([np.cos(th), 0, np.sin(th)], np.float32)
    up = np.array([0, 1, 0], np.float32)
    forward = np.cross(up, right).astype(np.float32) * -1.0
    forward = np.array([-np.sin(th), 0, np.cos(th)], np.float32)
    state = dict(position=np.array([0.2, -0.1, -0.4], np.float32),
                 right=right, up=up, forward=forward,
                 zoom=0.8, isometric=0.25, orbital=0.3, dolly=0.1,
                 focal_length=1.2, separation=0.06)

    def rect(g, size):
        return size * (g[..., 0:1] * state["right"] + g[..., 1:2] * up)

    def o_t(pos, g):
        backward = -state["forward"]
        o = (pos + rect(g, state["zoom"] * state["isometric"])
             + backward * state["orbital"] + backward * state["dolly"])
        t = (pos + rect(g, state["zoom"])
             + backward * state["orbital"] + state["forward"] * state["focal_length"])
        return o, t

    def rodrigues(vec, axis, ang):
        c, s = np.cos(ang, dtype=np.float32), np.sin(ang, dtype=np.float32)
        d = (axis * vec).sum(-1, keepdims=True)
        base = d * axis
        return (base + (vec - base) * c[..., None]
                + np.cross(np.broadcast_to(axis, vec.shape), vec) * s[..., None])

    # --- stereoscopic transcription (camera.glsl:101-109)
    eye = np.sign(ag[..., 0:1]).astype(np.float32)
    g2 = gl - eye * np.array([aspect / 2, 0], np.float32)
    pos2 = state["position"] + eye * state["separation"] * state["right"]
    ref_o, ref_t = o_t(pos2, g2)

    rays = cameralib.project(
        gluv=jnp.asarray(gl), agluv=jnp.asarray(ag), mode=0,
        projection=cameralib.PROJECTION_STEREOSCOPIC,
        aspect=aspect, want_aspect=aspect, resolution=(W, H), **state)
    np.testing.assert_allclose(np.asarray(rays.origin), ref_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays.target), ref_t, atol=1e-5)

    # --- equirectangular transcription (camera.glsl:112-125)
    inclination = state["zoom"] * (np.pi * ag[..., 1] / 2)
    azimuth = state["zoom"] * (np.pi * ag[..., 0])
    direction = rodrigues(np.broadcast_to(state["forward"], ag.shape[:-1] + (3,)),
                          state["right"], -inclination)
    direction = rodrigues(direction, up, azimuth)
    ref_o = np.broadcast_to(state["position"], ag.shape[:-1] + (3,))
    ref_t = ref_o + direction

    rays = cameralib.project(
        gluv=jnp.asarray(gl), agluv=jnp.asarray(ag), mode=0,
        projection=cameralib.PROJECTION_EQUIRECTANGULAR,
        aspect=aspect, want_aspect=aspect, resolution=(W, H), **state)
    np.testing.assert_allclose(np.asarray(rays.origin), ref_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays.target), ref_t, atol=1e-5)
