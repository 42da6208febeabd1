"""Audio stack: WAV reading, rolling buffers, audio-reactive scene export."""

import wave
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.audio import AudioMode, BrokenAudio, ShaderAudio
from shaderflow_tpu.io.ffmpeg import AudioReader, FFmpeg
from shaderflow_tpu.scene import ShaderScene


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory) -> Path:
    """2 s stereo 440 Hz (left) + 880 Hz (right) sine at 22050 Hz."""
    path = tmp_path_factory.mktemp("audio") / "tone.wav"
    sr = 22050
    t = np.arange(2 * sr) / sr
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.5 * np.sin(2 * np.pi * 880 * t)
    stereo = np.stack([left, right], axis=-1)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(2)
        handle.setsampwidth(2)
        handle.setframerate(sr)
        handle.writeframes((stereo * 32767).astype("<i2").tobytes())
    return path


def test_wav_probes(wav_file):
    assert FFmpeg.get_audio_samplerate(wav_file) == 22050
    assert FFmpeg.get_audio_channels(wav_file) == 2
    assert FFmpeg.get_audio_duration(wav_file) == pytest.approx(2.0)


def test_audio_reader_time_accuracy(wav_file):
    reader = AudioReader(wav_file, chunk=0.1)
    total = 0
    for chunk in reader.stream:
        assert chunk.shape[1] == 2
        total += chunk.shape[0]
    assert total == 2 * 22050


def test_get_audio_numpy(wav_file):
    samples = FFmpeg.get_audio_numpy(wav_file)
    assert samples.shape == (44100, 2)
    # RMS of a 0.5-amplitude sine
    assert float(np.sqrt((samples[:, 0] ** 2).mean())) == pytest.approx(0.5 / np.sqrt(2), rel=0.01)


def test_rolling_buffer():
    audio = BrokenAudio(samplerate=100, channels=2, buffer_seconds=1.0)
    audio.add_data(np.ones((2, 30)))
    assert audio.tell == 30
    assert audio.data[:, -30:].sum() == 60
    assert audio.data[:, :-30].sum() == 0
    window = audio.get_last_n_samples(10)
    assert window.shape == (2, 10)


def test_broken_audio_file_mode(wav_file):
    audio = BrokenAudio(file=wav_file)
    assert audio.mode == AudioMode.File
    assert audio.samplerate == 22050
    assert audio.channels == 2
    full = audio.load_full_file()
    assert full.shape == (2, 44100)


class AudioScene(ShaderScene):
    """iAudioVolume drives the red channel."""
    wav: Path = None

    def build(self):
        self.audio = ShaderAudio(scene=self, name="iAudio", file=self.wav)
        self.shader.fragment = lambda sf: ops.vec4(
            jnp.broadcast_to(ops.clamp(sf.iAudioVolume, 0, 1), sf.astuv.shape[:-1]),
            0.0, 0.0, 1.0)


def test_audio_reactive_export(wav_file, tmp_path):
    AudioScene.wav = wav_file
    scene = AudioScene()
    path = tmp_path / "out.rgb"
    scene.main(width=32, height=16, fps=10, time=1.0, output=str(path))
    frames = np.fromfile(path, np.uint8).reshape(-1, 16, 32, 3)
    assert frames.shape[0] == 10
    reds = frames[:, 0, 0, 0].astype(float) / 255
    # Volume ramps up from 0 as the smoothed RMS settles near 1.0
    # (volume = 2*RMS(0.5-amp stereo sine)*sqrt2 = 1.0)
    assert reds[0] < 0.1
    assert reds[-1] > 0.5


def test_audio_scene_duration_from_file(wav_file):
    AudioScene.wav = wav_file
    scene = AudioScene()
    scene.initialize()
    for module in scene.modules:
        module.setup()
    # The scene itself reports its default runtime (10 s); the audio module
    # reports the file duration — "default 10 or longest module" semantics
    scene.runtime = 0.1
    assert scene.max_duration == pytest.approx(2.0)
    assert scene.audio.duration == pytest.approx(2.0)


def test_ffhook_adds_input(wav_file):
    AudioScene.wav = wav_file
    scene = AudioScene()
    scene.initialize()
    scene.audio.ffhook(scene.ffmpeg)
    assert scene.ffmpeg.shortest
    assert any(str(wav_file) == str(getattr(i, "path", "")) for i in scene.ffmpeg.inputs)


def test_audio_sequence_indexing_speed_independent(wav_file, tmp_path):
    """Device-sequence content must follow the stepped frame counter, not
    scene time: with speed=2 the spectrogram column for rendered frame k is
    the same as at speed=1 (audio is consumed at the real-time rate)."""
    from shaderflow_tpu.audio.spectrogram import ShaderSpectrogram
    from shaderflow_tpu.piano import PianoNote

    class SpectroScene(ShaderScene):
        def build(self):
            self.audio = ShaderAudio(scene=self, name="iAudio", file=self.wav)
            self.spectro = ShaderSpectrogram(scene=self, audio=self.audio, length=0)
            self.spectro.from_notes(start=PianoNote.from_frequency(100.0),
                                    end=PianoNote.from_frequency(2000.0), piano=True)
            self.shader.fragment = lambda sf: ops.vec4(
                ops.clamp(sf.texture("iSpectrogram", sf.astuv)[..., 0] / 50.0, 0, 1),
                0.0, 0.0, 1.0)

    SpectroScene.wav = wav_file
    normal = SpectroScene()
    normal.main(width=16, height=8, fps=10, time=1.0, output=str(tmp_path / "n.rgb"))
    fast = SpectroScene()
    fast.main(width=16, height=8, fps=10, time=2.0, speed=2.0,
              output=str(tmp_path / "f.rgb"))
    a = np.fromfile(tmp_path / "n.rgb", np.uint8).reshape(-1, 8, 16, 3)
    b = np.fromfile(tmp_path / "f.rgb", np.uint8).reshape(-1, 8, 16, 3)
    assert a.shape == b.shape
    # Smoothing time constants legitimately differ with speed (scene-dt
    # stepped); the indexing bug this guards against shifts content by 2x,
    # far beyond this tolerance
    np.testing.assert_allclose(a[:, :, :, 0].astype(int), b[:, :, :, 0].astype(int), atol=80)
