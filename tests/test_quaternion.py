"""Quaternion algebra used by the camera module."""

import numpy as np
import pytest

from shaderflow_tpu.ops import quaternion as q


def test_identity_rotation():
    v = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(q.rotate_vector(v, q.IDENTITY), v, atol=1e-12)


def test_axis_angle_90deg():
    rot = q.quaternion(np.array([0.0, 0.0, 1.0]), 90.0)
    got = q.rotate_vector(np.array([1.0, 0.0, 0.0]), rot)
    np.testing.assert_allclose(got, [0.0, 1.0, 0.0], atol=1e-12)


def test_composition():
    r1 = q.quaternion(np.array([0.0, 1.0, 0.0]), 90.0)
    r2 = q.quaternion(np.array([1.0, 0.0, 0.0]), 90.0)
    v = np.array([0.0, 0.0, 1.0])
    step = q.rotate_vector(q.rotate_vector(v, r1), r2)
    combined = q.rotate_vector(v, q.qmul(r2, r1))
    np.testing.assert_allclose(step, combined, atol=1e-12)


def test_norm_preserved():
    rot = q.quaternion(q.unit_vector(np.array([1.0, 2.0, 3.0])), 37.0)
    v = np.array([0.3, -0.4, 0.5])
    assert np.linalg.norm(q.rotate_vector(v, rot)) == pytest.approx(np.linalg.norm(v))


def test_angle_safe():
    assert q.angle(np.zeros(3), np.array([1.0, 0, 0])) == 0.0
    assert q.angle(np.array([1.0, 0, 0]), np.array([0, 1.0, 0])) == pytest.approx(90.0)
    assert q.angle(np.array([1.0, 0, 0]), np.array([-1.0, 0, 0])) == pytest.approx(180.0)


def test_unit_vector_safe():
    np.testing.assert_allclose(q.unit_vector(np.zeros(3)), np.zeros(3))
    np.testing.assert_allclose(np.linalg.norm(q.unit_vector(np.array([3.0, 4.0, 0.0]))), 1.0)
