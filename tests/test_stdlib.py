"""Golden tests for the shader stdlib against closed-form / numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from shaderflow_tpu import ops as sf


def test_constants():
    assert sf.PI == pytest.approx(np.pi)
    assert sf.TAU == pytest.approx(2 * np.pi)


def test_vec_constructors():
    v = sf.vec2(1.0, 2.0)
    assert v.shape == (2,)
    grid = sf.vec2(jnp.zeros((4, 5)), jnp.ones((4, 5)))
    assert grid.shape == (4, 5, 2)
    v4 = sf.vec4(sf.vec3(1, 2, 3), 4)
    np.testing.assert_allclose(v4, [1, 2, 3, 4])


def test_interpolation():
    assert float(sf.proportion(2.0, 4.0, 3.0)) == pytest.approx(6.0)
    assert float(sf.lerp(0.0, 0.0, 1.0, 10.0, 0.5)) == pytest.approx(5.0)
    # smoothlerp: at a == b returns that value
    assert float(sf.smoothlerp(3.0, 3.0, 1.0)) == pytest.approx(3.0 - 1.0 * 0.25 / 2)
    # smin approaches min for distant values
    assert float(sf.smin(0.0, 10.0, 1.0)) == pytest.approx(0.0)
    assert float(sf.smax(0.0, 10.0, 1.0)) == pytest.approx(10.0)


def test_triangle_wave():
    xs = np.linspace(0, 2, 9)
    got = np.asarray(sf.triangle_wave(xs, 2.0))
    expected = 2 * np.abs(np.mod(2 * xs / 2.0 - 0.5, 2) - 1) - 1
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    assert float(sf.triangle_wave(0.0, 2.0)) == pytest.approx(0.0)


def test_rotate2d_matches_glsl_column_major():
    # GLSL mat2(c,-s,s,c) * v = (c*x + s*y, -s*x + c*y)
    v = sf.vec2(1.0, 0.0)
    out = np.asarray(sf.rotate2d(v, np.pi / 2))
    np.testing.assert_allclose(out, [0.0, -1.0], atol=1e-6)


def test_rotate3d_right_handed():
    v = np.asarray(sf.rotate3d(sf.vec3(1, 0, 0), sf.vec3(0, 0, 1), np.pi / 2))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)


def test_coordinate_roundtrips():
    aspect = 16 / 9
    astuv = sf.vec2(0.25, 0.75)
    agluv = sf.stuv2gluv(astuv)
    np.testing.assert_allclose(sf.gluv2stuv(agluv), astuv, rtol=1e-6)
    gluv = sf.agluv2gluv(agluv, aspect)
    np.testing.assert_allclose(sf.gluv2agluv(gluv, aspect), agluv, rtol=1e-6)
    stuv = sf.astuv2stuv(astuv, aspect)
    np.testing.assert_allclose(sf.stuv2astuv(stuv, aspect), astuv, rtol=1e-6)


def test_oob():
    assert bool(sf.astuv_oob(sf.vec2(1.5, 0.5)))
    assert not bool(sf.astuv_oob(sf.vec2(0.5, 0.5)))
    assert bool(sf.agluv_oob(sf.vec2(0.0, -1.1)))


def test_palette_piecewise():
    A, B, C, D = (np.array(c, np.float32) for c in
                  ([0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]))
    np.testing.assert_allclose(sf.palette(0.0, A, B, C, D), A, atol=1e-6)
    np.testing.assert_allclose(sf.palette(0.125, A, B, C, D), 0.5 * (A + B), atol=1e-6)
    np.testing.assert_allclose(sf.palette(0.375, A, B, C, D), 0.5 * (B + C), atol=1e-6)
    np.testing.assert_allclose(sf.palette(0.75, A, B, C, D), D, atol=1e-6)


def test_piano_keys():
    # Octave: C C# D D# E F F# G G# A A# B
    blacks = [1, 3, 6, 8, 10]
    for k in range(12):
        assert bool(sf.is_black_key(k)) == (k in blacks)
        assert bool(sf.is_white_key(k)) == (k not in blacks)


def test_sdfs():
    origin = sf.vec3(0, 0, 0)
    assert float(sf.sd_sphere(origin, sf.vec3(0, 0, 5), 1.0)) == pytest.approx(4.0)
    assert float(sf.sd_plane(origin, sf.vec3(0, -2, 0), sf.vec3(0, 1, 0))) == pytest.approx(2.0)
    # Box of size 2 centered at z=5: distance 4 along z
    assert float(sf.sd_box(origin, sf.vec3(0, 0, 5), sf.vec3(2, 2, 2))) == pytest.approx(4.0)
    assert float(sf.sd_union(3.0, 5.0)) == 3.0
    assert float(sf.sd_intersection(3.0, 5.0)) == 5.0
    # Line through origin: distance 0
    assert float(sf.sd_line(sf.vec3(0, 0, 0), sf.vec3(-1, 0, 0), sf.vec3(1, 0, 0))) == pytest.approx(0.0)
    assert float(sf.sd_line_segment(sf.vec3(2, 1, 0), sf.vec3(-1, 0, 0), sf.vec3(1, 0, 0))) == pytest.approx(np.sqrt(2))


def test_atan2_range():
    # Custom atan2 has range (0, 2pi) (shaderflow.glsl:382-388)
    assert float(sf.atan2(1.0, 0.0)) == pytest.approx(np.pi / 2)
    assert float(sf.atan2(-1.0, 0.0)) == pytest.approx(3 * np.pi / 2)
    assert float(sf.atan2(sf.vec2(1.0, -1.0))) == pytest.approx(2 * np.pi - np.pi / 4)


def test_hsv_rgb_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    hsv = sf.rgb2hsv(rgb)
    back = sf.hsv2rgb(hsv)
    np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_hsv2rgb_primaries():
    np.testing.assert_allclose(sf.hsv2rgb(sf.vec3(0.0, 1.0, 1.0)), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sf.hsv2rgb(sf.vec3(2 * np.pi / 3, 1.0, 1.0)), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(sf.hsv2rgb(sf.vec3(4 * np.pi / 3, 1.0, 1.0)), [0, 0, 1], atol=1e-5)


def test_complex_ops():
    a = sf.vec2(1.0, 2.0)
    b = sf.vec2(3.0, -1.0)
    np.testing.assert_allclose(sf.cmul(a, b), [5.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(sf.cmul(sf.cdiv(a, b), b), a, atol=1e-6)
    np.testing.assert_allclose(sf.cexp(sf.vec2(0.0, np.pi)), [-1.0, 0.0], atol=1e-6)
    # cpow: i^2 = -1
    i = sf.vec2(0.0, 1.0)
    np.testing.assert_allclose(sf.cpow(i, sf.vec2(2.0, 0.0)), [-1.0, 0.0], atol=1e-5)


def test_zoom():
    uv = sf.vec2(1.0, 1.0)
    np.testing.assert_allclose(sf.zoom(uv, 2.0), [4.0, 4.0])
    np.testing.assert_allclose(sf.zoom(uv, 2.0, sf.vec2(1.0, 1.0)), [1.0, 1.0])


def test_blend_composite():
    a = sf.vec4(1.0, 0.0, 0.0, 1.0)
    b = sf.vec4(0.0, 1.0, 0.0, 0.5)
    np.testing.assert_allclose(sf.blend(a, b), [0.5, 0.5, 0.0, 0.75])
