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


# -- windowed-sinc polyphase upsampling (sample_rateio) ----------------------

def test_sinc_upsample_matches_scipy_resample_poly():
    """Pin the polyphase sinc upsampler against scipy.signal.resample_poly
    driven with the SAME filter coefficients (VERDICT r4 #7)."""
    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    for factor in (2, 4):
        # scipy multiplies an array window by `up` internally; sinc_kernel
        # already carries the factor's DC gain, so hand scipy the unit-gain
        # coefficients
        h = spectral.sinc_kernel(factor)
        ours = spectral.sinc_upsample(x, factor)
        assert ours.shape == (2, 256 * factor)
        ref = scipy_signal.resample_poly(x, factor, 1, axis=-1, window=h / factor)
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_sinc_upsample_jax_matches_numpy():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 2, 128)).astype(np.float32)
    host = spectral.sinc_upsample(x, 4)
    device = np.asarray(spectral.sinc_upsample(jnp.asarray(x), 4))
    np.testing.assert_allclose(device, host, atol=1e-4)


def test_sinc_upsample_tone_fidelity():
    """A pure tone survives 4x upsampling with tiny interior error — the
    quality bar linear interpolation fails (its error on this tone is ~1e-2)."""
    sr, factor = 8000, 4
    t = np.arange(1024) / sr
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    up = spectral.sinc_upsample(x, factor)[0]
    t_up = np.arange(1024 * factor) / (sr * factor)
    ideal = np.sin(2 * np.pi * 1000.0 * t_up)
    interior = slice(64 * factor, -64 * factor)
    error = np.max(np.abs(up[interior] - ideal[interior]))
    assert error < 2e-3, f"sinc upsample interior error {error:.2e}"
    linear = np.interp(t_up, t, x[0])
    assert np.max(np.abs(linear[interior] - ideal[interior])) > 5e-3


def test_spectrogram_batch_upsample_matches_cpu_path():
    """Device precompute with upsample=r must agree with the realtime CPU
    path (sinc upsample each raw window, taper, rfft, band matmul)."""
    sr, fft_n, rateio = 8000, 8, 2
    raw = 2 ** fft_n
    fft_size = raw * rateio
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, sr)).astype(np.float32)
    window = spectral.hanning(fft_size).astype(np.float32)
    freqs = spectral.scale_frequencies(100, 3000, 32)
    df = (sr * rateio) / fft_size
    matrix = spectral.band_matrix(freqs, fft_size // 2 + 1, df)

    offsets = np.array([raw, 3 * raw], np.int32)
    banded = np.asarray(spectral.spectrogram_batch(
        jnp.asarray(audio), jnp.asarray(offsets), fft_size,
        jnp.asarray(window), jnp.asarray(matrix), upsample=rateio))

    for i, offset in enumerate(offsets):
        chunk = audio[:, offset:offset + raw]
        up = spectral.sinc_upsample(chunk, rateio)
        spectrum = spectral.magnitude_power(np.fft.rfft(window * up))
        expected = matrix @ spectrum.astype(np.float32).T  # (bins, C)
        np.testing.assert_allclose(banded[i], expected.T, rtol=2e-3, atol=2e-3)
