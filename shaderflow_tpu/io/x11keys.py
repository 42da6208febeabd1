"""
X11 keyboard-state poller for the realtime preview.

cv2's waitKey is a lossy event source: it delivers autorepeat key-down
codes only — no release events and no modifier state — so held-key
navigation (camera WASD + Shift/Ctrl speed modifiers, reference
/root/reference/shaderflow/camera.py:240-278) cannot work from it alone.

X11 exposes the full instantaneous keyboard bitmap via XQueryKeymap (256
bits, one per keycode), queryable without owning the event loop. The
preview loop polls this once per frame and diffs against the previous
bitmap, relaying exact Keyboard.KeyDown / Keyboard.KeyUp messages for every
key transition — including Shift/Ctrl/Alt, which never appear in waitKey.
ctypes on libX11; no new dependencies; inactive (poll() -> no-op pairs)
when there is no display.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterable, Optional

# X11 keysyms (X11/keysymdef.h) -> shaderflow key codes
from shaderflow_tpu.keyboard import _Keys

_KEYSYM_TO_KEY = {
    0xFFE1: _Keys.LEFT_SHIFT, 0xFFE3: _Keys.LEFT_CTRL, 0xFFE9: _Keys.LEFT_ALT,
    0xFF1B: _Keys.ESCAPE, 0xFF0D: _Keys.ENTER, 0xFF09: _Keys.TAB,
    0x0020: _Keys.SPACE, 0x005B: _Keys.BRACKET_LEFT, 0x005D: _Keys.BRACKET_RIGHT,
    0x002C: _Keys.COMMA, 0x002E: _Keys.PERIOD,
    0x002D: _Keys.MINUS, 0x003D: _Keys.EQUAL, 0x002B: _Keys.PLUS,
}
for _index in range(12):  # XK_F1 = 0xFFBE
    _KEYSYM_TO_KEY[0xFFBE + _index] = _Keys.F1 + _index
for _letter in range(26):  # lowercase latin keysyms == ASCII
    _KEYSYM_TO_KEY[ord("a") + _letter] = ord("A") + _letter
for _digit in range(10):
    _KEYSYM_TO_KEY[ord("0") + _digit] = ord("0") + _digit


class X11Keymap:
    """Polls the X server's 256-bit key-state map and yields transitions.

    Usage per frame::

        downs, ups = keymap.poll()
        for key in downs: relay(Keyboard.KeyDown(key=key))
        for key in ups:   relay(Keyboard.KeyUp(key=key))
    """

    def __init__(self, display: Optional[str] = None):
        self._dpy = None
        self._lib = None
        self._last: set[int] = set()
        if not (display or os.environ.get("DISPLAY")):
            return
        try:
            lib = ctypes.CDLL("libX11.so.6")
        except OSError:
            return
        lib.XOpenDisplay.restype = ctypes.c_void_p
        lib.XOpenDisplay.argtypes = [ctypes.c_char_p]
        lib.XQueryKeymap.argtypes = [ctypes.c_void_p, ctypes.c_char * 32]
        lib.XKeycodeToKeysym.restype = ctypes.c_ulong
        lib.XKeycodeToKeysym.argtypes = [ctypes.c_void_p, ctypes.c_ubyte,
                                         ctypes.c_int]
        dpy = lib.XOpenDisplay(display.encode() if display else None)
        if not dpy:
            return
        self._lib, self._dpy = lib, dpy
        # keycode -> our key code, resolved once (layout churn mid-run is
        # not worth a per-frame XKeycodeToKeysym round)
        self._keycode_map: dict[int, int] = {}
        for keycode in range(8, 256):
            keysym = lib.XKeycodeToKeysym(dpy, keycode, 0)
            key = _KEYSYM_TO_KEY.get(int(keysym))
            if key is not None:
                self._keycode_map[keycode] = key

    @property
    def active(self) -> bool:
        return self._dpy is not None

    def poll(self) -> tuple[list[int], list[int]]:
        """Returns (pressed-since-last-poll, released-since-last-poll)."""
        if self._dpy is None:
            return [], []
        bitmap = (ctypes.c_char * 32)()
        self._lib.XQueryKeymap(self._dpy, bitmap)
        held: set[int] = set()
        raw = bytes(bitmap)
        for byte_index, byte in enumerate(raw):
            while byte:
                bit = byte & -byte
                keycode = byte_index * 8 + bit.bit_length() - 1
                byte ^= bit
                key = self._keycode_map.get(keycode)
                if key is not None:
                    held.add(key)
        downs = sorted(held - self._last)
        ups = sorted(self._last - held)
        self._last = held
        return downs, ups

    def close(self) -> None:
        if self._dpy is not None:
            self._lib.XCloseDisplay(self._dpy)
            self._dpy = None


class AutoReleaseKeys:
    """Fallback transition source for bare cv2.waitKey feeds (no X server):
    synthesizes KeyUp when a key's autorepeat stream goes quiet.

    waitKey expresses only "some key code arrived" — holding a key yields a
    repeat train (OS autorepeat, typically 30-60 ms period once started).
    feed() marks the key held; poll(now) releases any key not re-fed within
    `linger` seconds. Holding therefore works (repeats keep it alive), and
    release lands within ~linger of the physical release — lossy but honest
    about it; modifier keys never arrive at all on this path (documented
    limitation; the X11 poller above is the full-fidelity source).
    """

    def __init__(self, linger: float = 0.50):
        self.linger = float(linger)
        self._held: dict[int, float] = {}

    def feed(self, key: int, now: float) -> bool:
        """Record a key-down event; returns True if newly pressed."""
        fresh = key not in self._held
        self._held[key] = now
        return fresh

    def poll(self, now: float) -> list[int]:
        """Keys whose repeat train expired -> synthesized releases."""
        released = [key for key, seen in self._held.items()
                    if now - seen > self.linger]
        for key in released:
            del self._held[key]
        return released

    def held(self) -> Iterable[int]:
        return self._held.keys()
