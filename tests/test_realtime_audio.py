"""Realtime audio capture/playback + FluidSynth live synthesis, exercised
under mocks (reference audio/module.py:354-379, piano/module.py:291-328 —
no sound server or fluidsynth library exists in CI, but every code path
must run)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples"))


# --------------------------------------------------------------------------- #
# Fake soundcard module

class FakeStream:
    def __init__(self, samplerate, channels, blocksize=512):
        self._samplerate = samplerate
        self.channels = channels or 2
        self.blocksize = blocksize
        self.played = []
        self.entered = False
        self.exited = False

    def __enter__(self):
        self.entered = True
        return self

    def __exit__(self, *exc):
        self.exited = True

    def record(self, numframes=None):
        n = numframes or self.blocksize
        t = np.arange(n) / self._samplerate
        wave = 0.25 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        return np.stack([wave] * 2, axis=-1)  # (frames, channels)

    def play(self, data):
        self.played.append(np.asarray(data))


class FakeDevice:
    def __init__(self, name, loopback=False):
        self.name = name
        self.isloopback = loopback
        self.channels = 2
        self.streams = []

    def recorder(self, samplerate, channels=None, blocksize=512):
        stream = FakeStream(samplerate, channels, blocksize)
        self.streams.append(stream)
        return stream

    def player(self, samplerate):
        stream = FakeStream(samplerate, 2)
        self.streams.append(stream)
        return stream


def install_fake_soundcard(monkeypatch):
    mic = FakeDevice("Fake Microphone")
    loop = FakeDevice("Monitor of Fake Output", loopback=True)
    spk = FakeDevice("Fake Speakers")
    fake = types.ModuleType("soundcard")
    fake.all_microphones = lambda include_loopback=False: (
        [mic, loop] if include_loopback else [mic])
    fake.all_speakers = lambda: [spk]
    fake.default_microphone = lambda: mic
    fake.default_speaker = lambda: spk
    monkeypatch.setitem(sys.modules, "soundcard", fake)
    return mic, loop, spk


# --------------------------------------------------------------------------- #

def test_open_recorder_prefers_loopback(monkeypatch):
    from shaderflow_tpu.audio import BrokenAudio, AudioMode

    mic, loop, spk = install_fake_soundcard(monkeypatch)
    audio = BrokenAudio()
    audio.open_recorder(samplerate=48000)
    assert audio.recorder_device is loop
    assert audio.mode == AudioMode.Realtime
    assert audio.recorder.entered

    data = audio.record(numframes=256)
    assert data is not None and data.shape == (2, 256)
    # The rolling buffer received the chunk
    assert np.abs(audio.get_last_n_samples(256)).max() > 0.01

    audio.close_recorder()
    assert audio.recorder is None


def test_open_recorder_by_name(monkeypatch):
    from shaderflow_tpu.audio import BrokenAudio

    mic, loop, spk = install_fake_soundcard(monkeypatch)
    audio = BrokenAudio()
    audio.open_recorder(name="fake micro")
    assert audio.recorder_device is mic


def test_speaker_playback(monkeypatch):
    from shaderflow_tpu.audio import BrokenAudio

    mic, loop, spk = install_fake_soundcard(monkeypatch)
    audio = BrokenAudio()
    audio.open_speaker()
    assert audio.speaker_device is spk
    chunk = np.zeros((2, 128), np.float32)
    audio.play(chunk)
    stream = audio.speaker
    assert len(stream.played) == 1
    assert stream.played[0].shape == (128, 2)  # transposed for device
    audio.close_speaker()
    assert stream.exited and audio.speaker is None


def test_realtime_scene_update_uses_recorder(monkeypatch):
    """A realtime (non-freewheel) ShaderAudio pulls from the recorder."""
    import demo
    from shaderflow_tpu.audio import ShaderAudio

    install_fake_soundcard(monkeypatch)
    scene = demo.Basic()
    audio = ShaderAudio(scene=scene, name="iAudio")
    audio.open_recorder(samplerate=44100)
    scene.realtime = True
    scene.freewheel = False
    audio.update()
    # volume dynamics saw real (sine) data
    assert float(audio.volume.target) > 0.0


# --------------------------------------------------------------------------- #
# Fake fluidsynth

class FakeSynth:
    def __init__(self):
        self.settings = {}
        self.started = False
        self.notes_on = []
        self.notes_off = []
        self.programs = []

    def setting(self, key, value):
        self.settings[key] = value

    def start(self):
        self.started = True

    def sfload(self, path):
        self.soundfont_path = path
        return 7

    def program_select(self, channel, soundfont, bank, preset):
        self.programs.append((channel, soundfont, bank, preset))

    def noteon(self, channel, note, velocity):
        self.notes_on.append((channel, note, velocity))

    def noteoff(self, channel, note):
        self.notes_off.append((channel, note))


def install_fake_fluidsynth(monkeypatch):
    fake = types.ModuleType("fluidsynth")
    fake.Synth = FakeSynth
    monkeypatch.setitem(sys.modules, "fluidsynth", fake)
    return fake


def test_fluidsynth_lifecycle(monkeypatch, tmp_path):
    import demo
    from shaderflow_tpu.piano import ShaderPiano

    install_fake_fluidsynth(monkeypatch)
    scene = demo.Basic()
    scene.realtime = True
    piano = ShaderPiano(scene=scene)

    piano.fluid_start()
    assert isinstance(piano.fluidsynth, FakeSynth)
    assert piano.fluidsynth.started

    soundfont = tmp_path / "piano.sf2"
    soundfont.write_bytes(b"fake")
    piano.fluid_load(soundfont)
    assert piano.soundfont == 7
    assert len(piano.fluidsynth.programs) > 0

    piano.fluid_key_down(60, 100, 0)
    assert (0, 60, 100) in piano.fluidsynth.notes_on
    piano.fluid_key_up(60, 0)
    assert (0, 60) in piano.fluidsynth.notes_off

    piano.fluid_all_notes_off()
    assert len(piano.fluidsynth.notes_off) > 1


def test_fluidsynth_wired_into_realtime_scan(monkeypatch):
    """The per-frame note scan triggers live noteon/noteoff in realtime mode
    (reference piano/module.py:291-328)."""
    import assets
    import demo
    from shaderflow_tpu.piano import ShaderPiano

    install_fake_fluidsynth(monkeypatch)
    scene = demo.Basic()
    scene.realtime = True
    scene.freewheel = False
    piano = ShaderPiano(scene=scene)
    piano.load_midi(assets.midi_file())
    piano.fluid_start()
    piano.fluid_load("dummy")

    # Find a note start and step the scan across it
    first = min(note.start for note in piano.notes)
    scene.time = first + 0.01
    scene.dt = 1 / 60
    piano.update()
    assert len(piano.fluidsynth.notes_on) > 0


def test_piano_realtime_setup_starts_fluidsynth(monkeypatch):
    """Realtime scene setup boots the synth when available (the reference
    starts it in the module's realtime path)."""
    import demo
    from shaderflow_tpu.piano import ShaderPiano

    install_fake_fluidsynth(monkeypatch)
    scene = demo.Basic()
    scene.realtime = True
    scene.freewheel = False
    piano = ShaderPiano(scene=scene)
    piano.setup()
    assert isinstance(piano.fluidsynth, FakeSynth)
