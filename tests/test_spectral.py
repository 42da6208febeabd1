"""Spectral DSP: STFT gathers, band matrices, waveform reduction."""

import numpy as np
import pytest

import jax.numpy as jnp

from shaderflow_tpu.ops import spectral


def test_windows():
    assert spectral.hanning(8).shape == (8,)
    assert spectral.no_window(8).sum() == 8
    hp = spectral.hann_poisson(64)
    assert hp.argmax() == pytest.approx(32, abs=1)


def test_stft_frames_gather_and_zero_fill():
    audio = jnp.asarray(np.arange(100, dtype=np.float32)[None].repeat(2, 0))
    window = jnp.ones(8)
    frames = spectral.stft_frames(audio, jnp.array([0, 50, -4]), 8, window)
    assert frames.shape == (3, 2, 8)
    np.testing.assert_allclose(frames[0, 0], np.arange(8))
    np.testing.assert_allclose(frames[1, 0], np.arange(50, 58))
    # Negative offset: first 4 taps zero-filled
    np.testing.assert_allclose(frames[2, 0], [0, 0, 0, 0, 0, 1, 2, 3])


def test_spectrogram_batch_finds_tone():
    """A pure tone must produce a peak at the matching band."""
    sr = 8000
    n = 1024
    tone = 440.0
    t = np.arange(sr, dtype=np.float32) / sr
    audio = jnp.asarray(np.sin(2 * np.pi * tone * t)[None])

    freqs = spectral.scale_frequencies(50, 2000, 64)
    df = sr / n
    matrix = jnp.asarray(spectral.band_matrix(freqs, n // 2 + 1, df))
    window = jnp.asarray(spectral.hanning(n))
    result = np.asarray(spectral.spectrogram_batch(
        audio, jnp.array([2048, 4096]), n, window, matrix))
    assert result.shape == (2, 1, 64)
    peak_bin = result[0, 0].argmax()
    assert abs(freqs[peak_bin] - tone) < freqs[peak_bin] * 0.06  # within a band


def test_band_matrix_dirac_identity_on_centers():
    """Dirac interpolation selects the nearest FFT bin exactly."""
    freqs = np.array([10.0, 20.0, 30.0])
    matrix = spectral.band_matrix(freqs, 64, 10.0, spectral.interpolation_dirac)
    assert matrix.shape == (3, 64)
    for row, bin_index in enumerate([1, 2, 3]):
        assert matrix[row, bin_index] == 1.0
        assert matrix[row].sum() == 1.0


def test_waveform_batch():
    audio = jnp.asarray(np.ones((2, 1000), np.float32))
    bars = spectral.waveform_batch(audio, jnp.array([500, 1000]), points=10, chunk_size=20)
    assert bars.shape == (2, 10, 2)
    np.testing.assert_allclose(bars[1], 1.0, atol=1e-6)  # sqrt(mean(|1|)) = 1


def test_waveform_reducers():
    x = jnp.ones((1, 4, 16))
    np.testing.assert_allclose(spectral.waveform_average(x), 1.0)
    # sqrt(RMS * sqrt2) = 2^0.25 for unit input
    np.testing.assert_allclose(spectral.waveform_rms(x), 2 ** 0.25, rtol=1e-5)
    np.testing.assert_allclose(spectral.waveform_std(x), 0.0, atol=1e-4)


def test_rolling_levels():
    sr = 1000
    audio = jnp.asarray(np.sin(np.linspace(0, 200 * np.pi, 2 * sr, dtype=np.float32))[None])
    volume, std = spectral.rolling_levels(audio, jnp.array([1000, 2000]), 100)
    # RMS of a sine is 1/sqrt(2): volume = 2 * (1/sqrt2) * sqrt2 = 2
    np.testing.assert_allclose(np.asarray(volume), 2.0, rtol=0.05)
    np.testing.assert_allclose(np.asarray(std), 1 / np.sqrt(2), rtol=0.05)


def test_scale_frequencies_octave_spacing():
    freqs = spectral.scale_frequencies(110, 440, 3)
    np.testing.assert_allclose(freqs, [110, 220, 440], rtol=1e-9)


def test_mel_scale_monotonic():
    freqs = spectral.scale_frequencies(20, 8000, 40, spectral.SCALE_MEL)
    assert np.all(np.diff(freqs) > 0)
    assert freqs[0] == pytest.approx(20)
    assert freqs[-1] == pytest.approx(8000)
