"""Resolution.fit — mirrors the reference's only first-party test suite
(resolution.py:90-116) plus scale/multiple coverage."""

import pytest

from shaderflow_tpu.resolution import Resolution


def test_keep_nothing():
    assert Resolution.fit(old=(1920, 1080)) == (1920, 1080)


def test_override_components():
    assert Resolution.fit(old=(1920, 1080), new=(1280, None)) == (1280, 1080)
    assert Resolution.fit(old=(1920, 1080), new=(None, 720)) == (1920, 720)


def test_missing_components():
    with pytest.raises(ValueError):
        Resolution.fit(old=(1920, None), new=(1280, None))
    with pytest.raises(ValueError):
        Resolution.fit(old=(None, 1080), new=(None, None))


def test_aspect_ratio():
    assert Resolution.fit(old=(1920, 1080), new=(1280, None), ar=16 / 9) == (1280, 720)
    assert Resolution.fit(old=(1920, 1080), new=(None, 720), ar=16 / 9) == (1280, 720)
    assert Resolution.fit(old=(1920, 1080), new=(1000, None), ar=2.0) == (1000, 500)
    assert Resolution.fit(old=(1920, 1080), new=(None, 500), ar=2.0) == (1000, 500)


def test_aspect_ratio_prioritize_width():
    assert Resolution.fit(old=(1920, 1080), new=(1000, 720), ar=2) == (1000, 500)


def test_limit_maximum_resolution():
    assert Resolution.fit(old=(3840, 2160), new=(3800, 2100), max=(1920, 1080)) == (1920, 1080)
    assert Resolution.fit(old=(3000, 3000), new=(2000, 2000), max=(6000, 720), ar=16 / 9) == (1280, 720)


def test_scale_and_multiple():
    assert Resolution.fit(old=(100, 100), scale=0.5) == (50, 50)
    # Rounds to multiple of 2 (python round: banker's on the .5 boundary)
    assert Resolution.fit(old=(101, 101)) == (100, 100)
    assert Resolution.fit(old=(103, 103)) == (104, 104)
    assert Resolution.fit(old=(100, 100), multiple=16) == (96, 96)
