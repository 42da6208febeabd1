"""Spectral DSP parity vs a direct NumPy transcription of the reference's
math (/root/reference/shaderflow/audio/spectrogram.py:20-245). The visual
oracles (test_psnr_reference.py) consume OUR spectrogram values, so they
are blind to DSP deviations — these tests pin the values themselves:
window, rFFT Power magnitude, octave-scale center frequencies,
Whittaker-Shannon (Euler) band matrix, from_notes piano bins, and the
no-volume quirk (the reference's next() returns BEFORE its volume step —
dead code — so texture values are matrix @ power with no volume transform).
"""

import math

import numpy as np
import pytest

from shaderflow_tpu.audio import BrokenAudio
from shaderflow_tpu.audio.spectrogram import BrokenSpectrogram
from shaderflow_tpu.piano import PianoNote


SAMPLERATE = 44100


def tone_audio(seconds=2.0, freqs=(440.0, 1000.0)):
    t = np.arange(int(seconds * SAMPLERATE)) / SAMPLERATE
    left = 0.5 * np.sin(2 * np.pi * freqs[0] * t)
    right = 0.25 * np.sin(2 * np.pi * freqs[1] * t)
    return np.stack([left, right]).astype(np.float32)


def reference_matrix(min_f, max_f, bins, fft_n, samplerate):
    """audio/spectrogram.py:186-224 — octave-scale centers + Euler W-S rows."""
    fft_size = 2 ** fft_n
    fft_bins = fft_size // 2 + 1
    df = np.fft.rfftfreq(fft_size, 1 / samplerate)[1]
    centers = 2.0 ** np.linspace(math.log2(min_f), math.log2(max_f), bins)
    end = 1.2
    euler = lambda x: np.exp(-(2 * x / end) ** 2) / (end * math.pi ** 0.5)
    matrix = np.array([euler(i - np.arange(fft_bins)) for i in centers / df],
                      np.float32)
    matrix[np.abs(matrix) < 1e-5] = 0
    return matrix


def reference_column(audio_tail, fft_n, matrix):
    """audio/spectrogram.py:155-176: hanning window, rfft, Power magnitude,
    matrix dot — volume NOT applied (dead code after the return)."""
    fft_size = 2 ** fft_n
    windowed = np.hanning(fft_size) * audio_tail
    power = np.abs(np.fft.rfft(windowed)) ** 2
    return matrix.dot(power.astype(np.float32).T).T


def make_spectrogram(**kwargs):
    audio = BrokenAudio()
    data = tone_audio()
    audio.samplerate = SAMPLERATE
    audio.channels = 2
    audio.add_data(data)
    return BrokenSpectrogram(audio=audio, **kwargs), data


def test_band_matrix_matches_reference_formula():
    spec, _ = make_spectrogram(fft_n=11)
    spec.minimum_frequency, spec.maximum_frequency = 20.0, 18000.0
    spec.spectrogram_bins = 100
    ours = np.asarray(spec.spectrogram_matrix())
    ref = reference_matrix(20.0, 18000.0, 100, 11, SAMPLERATE)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_spectrogram_column_matches_reference_math():
    """End-to-end per-frame column: window + rfft + Power + band matmul,
    with NO volume transform (the reference's dead-code quirk)."""
    spec, data = make_spectrogram(fft_n=11)
    spec.minimum_frequency, spec.maximum_frequency = 20.0, 18000.0
    spec.spectrogram_bins = 100
    ours = np.asarray(spec.next_columns())                  # (C, bins)

    tail = data[:, -2 ** 11:]
    ref = reference_column(tail, 11, reference_matrix(
        20.0, 18000.0, 100, 11, SAMPLERATE))
    assert ours.shape == ref.shape == (2, 100)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-5)
    # The 440 Hz tone must peak in the left channel's matching band
    centers = 2.0 ** np.linspace(math.log2(20.0), math.log2(18000.0), 100)
    assert abs(centers[np.argmax(ours[0])] - 440.0) / 440.0 < 0.06


def test_from_notes_piano_bins_match_reference():
    """audio/spectrogram.py:226-245: piano=True gives one bin per note with
    half-semitone padding on the frequency bounds."""
    spec, _ = make_spectrogram()
    start = PianoNote.from_frequency(20.0)
    end = PianoNote.from_frequency(14000.0)
    spec.from_notes(start=start, end=end, piano=True)
    half = 2 ** (0.5 / 12)
    assert spec.spectrogram_bins == (end.note - start.note) + 1
    assert spec.minimum_frequency == pytest.approx(start.frequency / half)
    assert spec.maximum_frequency == pytest.approx(end.frequency * half)
    # Center frequencies are the octave-scale linspace over the padded
    # bounds (NOT exactly note frequencies: the padded range divides into
    # N-1 steps of N/(12(N-1)) octaves each) — pin the reference formula
    centers = np.asarray(spec.spectrogram_frequencies)
    expected = 2.0 ** np.linspace(math.log2(spec.minimum_frequency),
                                  math.log2(spec.maximum_frequency),
                                  spec.spectrogram_bins)
    np.testing.assert_allclose(centers, expected, rtol=1e-6)


def test_batch_path_matches_per_frame_columns():
    """The offline whole-file batched path (rFFT + MXU matmul) must equal
    the per-frame CPU path on the same sample offsets."""
    import jax.numpy as jnp

    from shaderflow_tpu.ops import spectral

    spec, data = make_spectrogram(fft_n=10)
    spec.minimum_frequency, spec.maximum_frequency = 30.0, 16000.0
    spec.spectrogram_bins = 64
    matrix = np.asarray(spec.spectrogram_matrix())
    n = 2 ** 10

    ends = np.array([n, n + 512, n + 2048], np.int32)
    window = jnp.asarray(np.hanning(n).astype(np.float32))
    batched = np.asarray(spectral.spectrogram_batch(
        jnp.asarray(data), jnp.asarray(ends - n), n, window,
        jnp.asarray(matrix)))                               # (F, C, bins)

    for f, e in enumerate(ends):
        ref = reference_column(data[:, e - n:e], 10, matrix)
        np.testing.assert_allclose(batched[f], ref, rtol=2e-3, atol=2e-4)
