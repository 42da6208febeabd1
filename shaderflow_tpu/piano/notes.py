"""
Musical note math: index <-> name <-> frequency (A440 12-TET).

Role-equivalent of the reference note model
(/root/reference/shaderflow/piano/notes.py): PianoNote value objects with
cached constructors, black/white key predicates, duration helpers.
"""

from __future__ import annotations

import functools
import math
from typing import Any

PIANO_NOTES = "C C# D D# E F F# G G# A A# B".split()


class PianoNote:

    def __init__(self, note: int = 60, start: float = 0.0, end: float = 0.0,
                 channel: int = 0, velocity: int = 100, tuning: float = 440):
        self.note = int(note)
        self.start = float(start)
        self.end = float(end)
        self.channel = int(channel)
        self.velocity = int(velocity)
        self.tuning = float(tuning)

    def __repr__(self) -> str:
        return (f"PianoNote({self.name}, start={self.start:.3f}, end={self.end:.3f}, "
                f"ch={self.channel}, vel={self.velocity})")

    # -- constructors --------------------------------------------------------

    @classmethod
    @functools.lru_cache
    def from_index(cls, note: int, **kwargs) -> "PianoNote":
        return cls(note=note, **kwargs)

    @classmethod
    @functools.lru_cache
    def from_name(cls, name: str, **kwargs) -> "PianoNote":
        return cls(note=cls.name_to_index(name), **kwargs)

    @classmethod
    @functools.lru_cache
    def from_frequency(cls, frequency: float, **kwargs) -> "PianoNote":
        return cls(note=cls.frequency_to_index(frequency), **kwargs)

    @classmethod
    def get(cls, value: Any, **kwargs) -> "PianoNote":
        if isinstance(value, PianoNote):
            for key, item in kwargs.items():
                setattr(value, key, item)
            return value
        if isinstance(value, int):
            return cls.from_index(value, **kwargs)
        if isinstance(value, str):
            return cls.from_name(value, **kwargs)
        if isinstance(value, float):
            return cls.from_frequency(value, **kwargs)
        return cls(**kwargs)

    # -- conversions ---------------------------------------------------------

    @staticmethod
    @functools.lru_cache
    def index_to_name(index: int) -> str:
        return f"{PIANO_NOTES[index % 12]}{index // 12 - 1}"

    @staticmethod
    @functools.lru_cache
    def index_to_frequency(index: int, *, tuning: float = 440) -> float:
        return tuning * 2 ** ((index - 69) / 12)

    @staticmethod
    @functools.lru_cache
    def name_to_index(name: str) -> int:
        note, octave = name[:-1].upper(), int(name[-1])
        return PIANO_NOTES.index(note) + 12 * (octave + 1)

    @staticmethod
    @functools.lru_cache
    def name_to_frequency(name: str, *, tuning: float = 440) -> float:
        return PianoNote.index_to_frequency(PianoNote.name_to_index(name), tuning=tuning)

    @staticmethod
    @functools.lru_cache
    def frequency_to_index(frequency: float, *, tuning: float = 440) -> int:
        return round(12 * math.log2(frequency / tuning) + 69)

    @staticmethod
    @functools.lru_cache
    def frequency_to_name(frequency: float, *, tuning: float = 440) -> str:
        return PianoNote.index_to_name(PianoNote.frequency_to_index(frequency, tuning=tuning))

    # -- properties -----------------------------------------------------------

    @property
    def frequency(self) -> float:
        return PianoNote.index_to_frequency(self.note, tuning=self.tuning)

    @frequency.setter
    def frequency(self, value: float) -> None:
        self.note = PianoNote.frequency_to_index(value, tuning=self.tuning)

    @property
    def name(self) -> str:
        return PianoNote.index_to_name(self.note)

    @name.setter
    def name(self, value: str) -> None:
        self.note = PianoNote.name_to_index(value)

    @staticmethod
    def is_white(note: int) -> bool:
        return (note % 12) in {0, 2, 4, 5, 7, 9, 11}

    @staticmethod
    def is_black(note: int) -> bool:
        return (note % 12) in {1, 3, 6, 8, 10}

    @property
    def white(self) -> bool:
        return PianoNote.is_white(self.note)

    @property
    def black(self) -> bool:
        return PianoNote.is_black(self.note)

    @property
    def duration(self) -> float:
        return self.end - self.start

    @duration.setter
    def duration(self, value: float) -> None:
        self.end = self.start + value
