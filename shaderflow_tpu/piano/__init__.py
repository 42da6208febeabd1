from shaderflow_tpu.piano.midi import MidiFile, MidiNote, load_midi, write_midi
from shaderflow_tpu.piano.module import MAX_CHANNELS, MAX_NOTE, MAX_ROLLING, ShaderPiano
from shaderflow_tpu.piano.notes import PIANO_NOTES, PianoNote
