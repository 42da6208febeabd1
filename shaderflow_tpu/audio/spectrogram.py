"""
Spectrogram: natural-scale banded STFT feeding a shader texture.

Role-equivalent of the reference spectrogram
(/root/reference/shaderflow/audio/spectrogram.py): windowed rFFT over the
last 2^n samples, pluggable magnitude (Amplitude/Power), volume
(dBFS/Sqrt/Linear), window (hanning/hann-poisson/none) and interpolation
(Dirac/Euler/Sinc) strategies, center frequencies on an Octave or MEL scale,
a Whittaker-Shannon band-pass matrix mapping FFT bins to spectrogram bins,
per-bin second-order smoothing, and a scrolling (length x bins) texture with
an offset uniform. from_notes() builds piano-aligned bins.

TPU-first restructuring (SURVEY.md §7.4): in offline exports, the ENTIRE
trajectory of spectrogram columns is computed in one device program at the
first frame — a batched rFFT + one dense (bins x fft_bins) MXU matmul + a
lax.scan dynamics smoothing — and per-frame updates just copy the
precomputed column into the texture. The realtime path falls back to the
reference's per-frame CPU math with the same strategy functions.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from shaderflow_tpu import logger
from shaderflow_tpu.audio import BrokenAudio
from shaderflow_tpu.module import ShaderModule
from shaderflow_tpu.ops import dynamics as dyn
from shaderflow_tpu.ops import spectral
from shaderflow_tpu.ops.dynamics import DynamicNumber
from shaderflow_tpu.piano.notes import PianoNote
from shaderflow_tpu.texture import ShaderTexture
from shaderflow_tpu.variable import ShaderVariable, Uniform

# Strategy namespaces (API parity with the reference's class-of-functions)

class FourierMagnitude:
    Amplitude = staticmethod(spectral.magnitude_amplitude)
    Power = staticmethod(spectral.magnitude_power)

class FourierVolume:
    dBFS = staticmethod(spectral.volume_dbfs)
    Sqrt = staticmethod(spectral.volume_sqrt)
    Linear = staticmethod(spectral.volume_linear)
    dBFsTremx = staticmethod(spectral.volume_dbfs_tremx)

class SpectrogramInterpolation:
    Euler = staticmethod(spectral.interpolation_euler(end=1.2))
    Dirac = staticmethod(spectral.interpolation_dirac)
    Sinc = staticmethod(spectral.interpolation_sinc)
    make_euler = staticmethod(spectral.interpolation_euler)

class SpectrogramScale:
    Octave = spectral.SCALE_OCTAVE
    MEL = spectral.SCALE_MEL

class SpectrogramWindow:
    hanning = staticmethod(spectral.hanning)
    hann_poisson = staticmethod(spectral.hann_poisson)
    none = staticmethod(spectral.no_window)


class BrokenSpectrogram:
    """Core math: FFT sizing, band matrix, per-frame CPU fallback."""

    def __init__(self, audio: Optional[BrokenAudio] = None, *, fft_n: int = 12,
                 sample_rateio: int = 1):
        self.audio = audio or BrokenAudio()
        self.fft_n = int(fft_n)
        self.sample_rateio = int(sample_rateio)
        self.scale = SpectrogramScale.Octave
        self.interpolation: Callable = SpectrogramInterpolation.Euler
        self.magnitude: Callable = FourierMagnitude.Power
        self.window: Callable = SpectrogramWindow.hanning
        self.volume: Callable = FourierVolume.Sqrt
        self.minimum_frequency: float = 20.0
        self.maximum_frequency: float = 20000.0
        self.spectrogram_bins: int = 1000
        self._matrix_cache: Optional[np.ndarray] = None

    # -- Fourier sizing ------------------------------------------------------

    @property
    def fft_size(self) -> int:
        return int(2 ** self.fft_n * self.sample_rateio)

    @property
    def fft_bins(self) -> int:
        return int(self.fft_size / 2 + 1)

    @property
    def fft_frequencies(self) -> np.ndarray:
        return np.fft.rfftfreq(self.fft_size, 1 / (self.audio.samplerate * self.sample_rateio))

    def fft(self) -> np.ndarray:
        """Per-frame CPU path (realtime mode): windowed rFFT magnitude of the
        rolling buffer's last 2^n samples."""
        data = self.audio.get_last_n_samples(int(2 ** self.fft_n))
        if self.sample_rateio != 1:
            # Integer-factor windowed-sinc upsample (the reference's
            # libsamplerate step, spectrogram.py:160-167) — pinned against
            # scipy.signal.resample_poly in test_spectral.py
            data = spectral.sinc_upsample(
                np.asarray(data, np.float32), self.sample_rateio)
        window = self.window(self.fft_size)
        return np.asarray(self.magnitude(np.fft.rfft(window * data))).astype(np.float32)

    # -- Banding -------------------------------------------------------------

    @property
    def spectrogram_frequencies(self) -> np.ndarray:
        key = (self.minimum_frequency, self.maximum_frequency, self.spectrogram_bins)
        cached = getattr(self, "_freq_cache", None)
        if cached is None or cached[0] != key:
            self._freq_cache = (key, spectral.scale_frequencies(
                self.minimum_frequency, self.maximum_frequency,
                self.spectrogram_bins, self.scale))
        return self._freq_cache[1]

    def spectrogram_matrix(self) -> np.ndarray:
        """(bins x fft_bins) dense Whittaker-Shannon band matrix. Dense by
        design: a single MXU matmul beats sparse scatter on TPU."""
        if self._matrix_cache is None:
            self._matrix_cache = spectral.band_matrix(
                self.spectrogram_frequencies, self.fft_bins,
                float(self.fft_frequencies[1]), self.interpolation)
        return self._matrix_cache

    def next_columns(self) -> np.ndarray:
        """One frame's (channels, bins) spectrogram (CPU path)."""
        return self.spectrogram_matrix().dot(self.fft().T).T

    def from_notes(self, start, end, bins: int = 1000, piano: bool = False,
                   tuning: float = 440) -> "BrokenSpectrogram":
        start = PianoNote.get(start, tuning=tuning)
        end = PianoNote.get(end, tuning=tuning)
        logger.info(f"Making Spectrogram Piano Matrix from notes ({start.name} - {end.name})")
        self.minimum_frequency = start.frequency
        self.maximum_frequency = end.frequency
        if not piano:
            self.spectrogram_bins = bins
        else:
            # Advertised bins start and end exactly on notes
            half_semitone = 2 ** (0.5 / 12)
            self.spectrogram_bins = (end.note - start.note) + 1
            self.minimum_frequency /= half_semitone
            self.maximum_frequency *= half_semitone
        self._matrix_cache = None
        return self


class ShaderSpectrogram(BrokenSpectrogram, ShaderModule):

    def __init__(self, scene=None, name: str = "iSpectrogram", *,
                 audio: Optional[BrokenAudio] = None, length: float = 5,
                 smooth: bool = False, scrolling: bool = False,
                 fft_n: int = 12, sample_rateio: int = 1, **kwargs):
        BrokenSpectrogram.__init__(self, audio=audio, fft_n=fft_n, sample_rateio=sample_rateio)
        self.length = length
        self.smooth = smooth
        self.scrolling = scrolling
        self.offset = 0
        self.dynamics = DynamicNumber(frequency=4, zeta=1, response=0, dtype=np.float32)
        self.texture: Optional[ShaderTexture] = None
        self._precomputed: Optional[np.ndarray] = None  # (F, bins, 1, C) smoothed
        self._frame_index = 0
        ShaderModule.__init__(self, scene=scene, name=name, **kwargs)
        self.texture = ShaderTexture(
            scene=self.scene, name=self.name, dtype=np.float32, repeat_y=False)

    @property
    def length_samples(self) -> int:
        return int(max(1, self.length * self.scene.fps))

    def setup(self) -> None:
        self.offset = 0
        self._frame_index = 0
        self._precomputed = None
        self.texture.set_sequence(None)
        self.dynamics.set(np.zeros((self.audio.channels, self.spectrogram_bins), np.float32))

    # -- offline batched precompute -------------------------------------------

    def _precompute(self):
        """Whole-export spectrogram in one device program: batched STFT +
        MXU band matmul + lax.scan smoothing. Returns a DEVICE (F, bins, 1, C)
        texture-layout array — it never leaves HBM; the render scan indexes it per frame."""
        full = getattr(self.audio, "full_data", None)
        if full is None and hasattr(self.audio, "load_full_file"):
            full = self.audio.load_full_file()
        if full is None:
            return None

        fps = self.scene.fps
        total = max(1, round(self.scene.runtime * fps))
        smoothing_dt = abs(self.scene.speed) / fps or 1.0 / fps
        samplerate = self.audio.samplerate
        ends = np.round(np.arange(total) * samplerate / fps).astype(np.int32)
        offsets = ends - int(2 ** self.fft_n)
        # HOST numpy constants, deliberately: a closure-captured DEVICE
        # array lowers into the program by reading its VALUE back
        # (mlir.ir_constant -> array._value), and the first device->host
        # readback of a process pays this environment's tunnel-setup
        # latency (50 s to minutes — measured 80-390 s inside .lower() on
        # 2026-08-19). numpy constants embed directly from host memory.
        window = np.asarray(self.window(self.fft_size), np.float32)
        matrix = np.asarray(self.spectrogram_matrix(), np.float32)

        @jax.jit
        def compute(audio, offsets):
            banded = spectral.spectrogram_batch(
                audio, offsets, self.fft_size, window, matrix,
                magnitude=self.magnitude,
                upsample=self.sample_rateio)                 # (F, C, bins)
            flat = banded.reshape(total, -1)
            # Per-frame smoothing step uses scene dt = speed/fps, matching
            # the realtime path's dynamics.next(dt=|scene.dt|)
            smoothed = dyn.scan(flat, jnp.zeros(flat.shape[1]), smoothing_dt,
                                frequency=4.0, zeta=1.0, response=0.0)
            columns = jnp.transpose(smoothed.reshape(banded.shape), (0, 2, 1))
            # Texture layout (F, bins, 1, C), bin-reversed (storage row 0 =
            # top = highest bin) INSIDE the jit: the cached value is
            # bind-ready, so repeat runs re-bind the same object with zero
            # eager device ops (texture.set_sequence)
            return columns[:, ::-1][:, :, None, :]

        # Split trace/compile/execute so cold-start accounting (VERDICT r4
        # #2, tools/coldstart.py) can attribute first-run latency; the AOT
        # executable seeds the jit cache via the same persistent cache key.
        audio_j, offsets_j = jnp.asarray(full), jnp.asarray(offsets)
        t0 = time.perf_counter()
        lowered = compute.lower(audio_j, offsets_j)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        result = jax.block_until_ready(compiled(audio_j, offsets_j))
        t3 = time.perf_counter()
        self.precompute_timings = {
            "trace": t1 - t0, "compile": t2 - t1, "run": t3 - t2}
        timing = (f" (trace {t1 - t0:.1f}s + compile {t2 - t1:.1f}s + "
                  f"run {t3 - t2:.1f}s)" if t3 - t0 > 2.0 else "")
        logger.info(f"Precomputed {total} spectrogram frames on device "
                    f"({self.spectrogram_bins} bins x {result.shape[3]} "
                    f"channels){timing}")
        return result

    def _precompute_cached(self):
        """Re-running the same export (bench warm runs, resumed exports)
        must not pay the whole-file STFT again: the device array survives
        setup() keyed by everything that shapes it."""
        key = (getattr(self.audio, "file", None), self.audio.samplerate,
               round(self.scene.runtime * self.scene.fps), self.scene.speed,
               self.fft_n, self.sample_rateio, self.spectrogram_bins,
               self.length_samples, type(self.magnitude).__name__, self.smooth)
        cached = getattr(self, "_precompute_key", None)
        if cached == key and getattr(self, "_precompute_value", None) is not None:
            return self._precompute_value
        value = self._precompute()
        self._precompute_key = key
        self._precompute_value = value
        return value

    def prewarm(self) -> None:
        if self.scene.freewheel:
            self._precompute_cached()

    # -- per-frame update ------------------------------------------------------

    def update(self) -> None:
        self.texture.components = self.audio.channels
        self.texture.filter = "linear" if self.smooth else "nearest"
        self.texture.resolution = (self.length_samples, self.spectrogram_bins)

        if self.scene.freewheel and self._precomputed is None:
            columns = self._precompute_cached()         # device (F, bins, 1, C)
            if columns is not None:
                # Device-resident, already texture-layout (row 0 = top =
                # highest bin; the host write path stores bin 0 at the
                # bottom, GL order). length>1 (scrolling texture): a RING
                # sequence — the engine synthesizes the (bins, L) ring of
                # the last L columns inside the render scan, so nothing
                # streams per frame.
                window = self.length_samples if self.length_samples > 1 else None
                self.texture.set_sequence(columns, window=window)
                self._precomputed = columns

        self.offset = (self.offset + 1) % self.length_samples
        self._frame_index += 1
        if self.texture.sequence is not None:
            return  # content comes from the device sequence

        # Realtime / scrolling path: per-frame CPU column + host texture write.
        # Deliberate deviation: the reference feeds its dynamics with
        # `self.next().T.reshape(2, -1)` (audio/spectrogram.py:307) — a
        # C-order reshape of the (bins, channels) column into (2, bins)
        # that INTERLEAVES bins across channels rather than transposing
        # (visually: a half-resolution spectrum duplicated per channel).
        # We keep the evidently intended (channels, bins) layout.
        row_shape = (self.audio.channels, self.spectrogram_bins)
        if self.dynamics.value.shape != row_shape:
            self.dynamics.set(np.zeros(row_shape, np.float32))
        self.dynamics.next(target=self.next_columns(), dt=abs(self.scene.dt))
        column = np.asarray(self.dynamics.value).T          # (bins, C)
        self.texture.write(
            data=column.reshape(self.spectrogram_bins, 1, self.audio.channels),
            viewport=(self.offset, 0, 1, self.spectrogram_bins),
        )

    def ui(self):
        yield (f"{self.spectrogram_bins} bins  fft 2^{self.fft_n}  "
               f"{self.minimum_frequency:.0f}-{self.maximum_frequency:.0f} Hz")
        yield f"device sequence: {self.texture.sequence is not None}"

    def ui_fields(self):
        from shaderflow_tpu.module import UIField

        def set_min(value):
            self.minimum_frequency = min(value, self.maximum_frequency / 2)

        def set_max(value):
            self.maximum_frequency = max(value, self.minimum_frequency * 2)

        # The band matrix rebuilds lazily on the (min, max, bins) key; edits
        # take effect on the next update()
        return [
            UIField("min Hz", lambda: self.minimum_frequency, set_min,
                    step=10.0, minimum=1.0, fmt="{:.0f}"),
            UIField("max Hz", lambda: self.maximum_frequency, set_max,
                    step=500.0, minimum=10.0, fmt="{:.0f}"),
        ]

    def pipeline(self):
        yield Uniform("int", f"{self.name}Length", self.length_samples)
        yield Uniform("int", f"{self.name}Bins", self.spectrogram_bins)
        yield Uniform("float", f"{self.name}Offset", self.offset / self.length_samples)
        yield Uniform("int", f"{self.name}Smooth", self.smooth)
        yield Uniform("float", f"{self.name}Min", float(self.spectrogram_frequencies[0]))
        yield Uniform("float", f"{self.name}Max", float(self.spectrogram_frequencies[-1]))
        yield Uniform("bool", f"{self.name}Scroll", self.scrolling)
