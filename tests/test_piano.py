"""Piano module, note math, and the in-repo MIDI parser."""

import numpy as np
import pytest

from shaderflow_tpu.piano import PianoNote, ShaderPiano, load_midi, write_midi
from shaderflow_tpu.piano.midi import MidiNote
from shaderflow_tpu.scene import ShaderScene


def test_note_conversions():
    assert PianoNote.index_to_name(69) == "A4"
    assert PianoNote.index_to_frequency(69) == pytest.approx(440.0)
    assert PianoNote.name_to_index("A4") == 69
    assert PianoNote.name_to_index("C4") == 60
    assert PianoNote.index_to_name(60) == "C4"
    assert PianoNote.frequency_to_index(440.0) == 69
    assert PianoNote.frequency_to_index(261.63) == 60
    assert PianoNote.name_to_frequency("A5") == pytest.approx(880.0)
    assert PianoNote.frequency_to_name(440.0) == "A4"


def test_note_black_white():
    assert PianoNote(note=60).white   # C
    assert PianoNote(note=61).black   # C#
    assert PianoNote(note=69).white   # A
    assert PianoNote(note=70).black   # A#


def test_note_get_dispatch():
    assert PianoNote.get(60).note == 60
    assert PianoNote.get("A4").note == 69
    assert PianoNote.get(440.0).note == 69
    note = PianoNote(note=50)
    assert PianoNote.get(note) is note


def test_note_duration():
    note = PianoNote(note=60, start=1.0)
    note.duration = 0.5
    assert note.end == 1.5
    assert note.duration == 0.5


def test_midi_roundtrip(tmp_path):
    notes = [
        MidiNote(pitch=60, start=0.0, end=0.5, channel=0, velocity=100),
        MidiNote(pitch=64, start=0.5, end=1.0, channel=1, velocity=80),
        MidiNote(pitch=67, start=1.0, end=2.0, channel=0, velocity=60),
    ]
    path = write_midi(tmp_path / "test.mid", notes, bpm=120)
    parsed = load_midi(path)
    assert len(parsed.notes) == 3
    assert parsed.duration == pytest.approx(2.0, abs=0.01)
    for original, loaded in zip(notes, sorted(parsed.notes, key=lambda n: n.start)):
        assert loaded.pitch == original.pitch
        assert loaded.start == pytest.approx(original.start, abs=0.01)
        assert loaded.end == pytest.approx(original.end, abs=0.01)
        assert loaded.channel == original.channel
        assert loaded.velocity == original.velocity
    assert parsed.tempo_changes[0][1] == pytest.approx(120.0)


def test_piano_module_scan(tmp_path):
    scene = ShaderScene()
    scene.initialize()
    piano = ShaderPiano(scene=scene)
    path = write_midi(tmp_path / "m.mid", [
        MidiNote(pitch=60, start=0.0, end=1.0, channel=0, velocity=100),
        MidiNote(pitch=72, start=2.0, end=3.0, channel=1, velocity=50),
    ])
    piano.load_midi(path)
    assert piano.global_minimum_note == 60
    assert piano.global_maximum_note == 72
    assert piano.duration == pytest.approx(3.0, abs=0.01)

    scene.time = 0.5
    scene.realtime = False
    piano.update()
    # Note 60 is playing at t=0.5: roll row 60 has its interval
    roll = piano.roll_texture.matrix[0, 0]
    row = roll[roll.shape[0] - 1 - 60]  # GL bottom-up storage: note n at row H-1-n
    assert row[0, 3] == 100  # velocity in the 4th component
    assert piano.key_press_dynamics.target[60] == 100

    # Key press dynamics target cleared for non-playing note
    assert piano.key_press_dynamics.target[72] == 0


def test_piano_duration_drives_scene(tmp_path):
    scene = ShaderScene()
    scene.initialize()
    piano = ShaderPiano(scene=scene)
    piano.load_midi(write_midi(tmp_path / "m.mid", [
        MidiNote(pitch=60, start=0.0, end=4.2, channel=0, velocity=100)]))
    scene.runtime = 0.0
    assert scene.max_duration == pytest.approx(4.2, abs=0.01)
