"""Async latest-frame-wins display path (io/displaypump.py).

The realtime loop must never block on the device->host frame transfer
(remote-attached chips: ~hundreds of ms per 1080p frame), scene pacing and
input stay live between displayed frames, and slow transfers drop frames
latest-wins instead of queueing. Reference behavior being replaced: the GL
swapchain blit, reference scene.py:461-462 (free on-GPU; not free here)."""

import time

import numpy as np
import pytest

from shaderflow_tpu.io.displaypump import DisplayPump


def test_pump_transfers_latest_and_never_blocks():
    pump = DisplayPump()
    try:
        a = np.full((1, 4, 4, 3), 1, np.uint8)
        b = np.full((1, 4, 4, 3), 2, np.uint8)
        pump.offer(a)
        deadline = time.time() + 5.0
        got = None
        while got is None and time.time() < deadline:
            got = pump.take()
            time.sleep(0.001)
        assert got is not None and got[0, 0, 0] == 1
        # take() drained it; nothing new -> None, and it returns immediately
        t0 = time.perf_counter()
        assert pump.take() is None
        assert time.perf_counter() - t0 < 0.1
        # Two offers before the worker wakes: only the LATEST must win when
        # the first hasn't started (replace-in-slot semantics)
        pump.offer(a)
        pump.offer(b)
        seen = []
        deadline = time.time() + 5.0
        while time.time() < deadline and len(seen) < 2:
            got = pump.take()
            if got is not None:
                seen.append(int(got[0, 0, 0]))
            time.sleep(0.001)
        assert seen[-1] == 2  # the newest frame always arrives
    finally:
        pump.close()


def test_pump_close_is_idempotent_and_fast():
    pump = DisplayPump()
    t0 = time.perf_counter()
    pump.close()
    assert time.perf_counter() - t0 < 5.0


class _SlowFrames:
    """Device-batch stand-in whose transfer takes `delay` seconds."""

    def __init__(self, value: int, delay: float, log: list):
        self._value = value
        self._delay = delay
        self._log = log

    def __getitem__(self, index):
        return self

    def __array__(self, dtype=None, copy=None):
        time.sleep(self._delay)
        self._log.append(self._value)
        return np.full((4, 4, 3), self._value, np.uint8)


def test_slow_transfers_drop_frames_latest_wins():
    log = []
    pump = DisplayPump()
    try:
        # Offer 10 frames faster than the 30 ms "link" can drain
        for k in range(10):
            pump.offer(_SlowFrames(k, 0.03, log))
            time.sleep(0.005)
        deadline = time.time() + 5.0
        last = None
        while time.time() < deadline:
            got = pump.take()
            if got is not None:
                last = int(got[0, 0, 0])
                if last == 9:
                    break
            time.sleep(0.005)
        assert last == 9          # newest eventually shown
        assert len(log) < 10      # intermediate frames were DROPPED
    finally:
        pump.close()


def test_realtime_async_display_defaults_on(monkeypatch):
    """The windowed realtime loop uses the pump by default and still shows
    frames + dispatches events (SDL dummy driver)."""
    pygame = pytest.importorskip("pygame")
    monkeypatch.setenv("SHADERFLOW_PREVIEW", "sdl")
    from shaderflow_tpu.scene import ShaderScene, WindowBackend

    scene = ShaderScene(backend=WindowBackend.Preview)
    scene.frame_limit = 8
    pygame.display.init()
    scene.main(width=32, height=16, fps=60)
    assert scene.frame >= 1
    # Pump was created (async path taken) and torn down at loop exit
    assert getattr(scene, "_display_pump", None) is None


def test_realtime_sync_display_flag(monkeypatch):
    pygame = pytest.importorskip("pygame")
    monkeypatch.setenv("SHADERFLOW_PREVIEW", "sdl")
    monkeypatch.setenv("SHADERFLOW_SYNC_DISPLAY", "1")
    from shaderflow_tpu.scene import ShaderScene, WindowBackend

    scene = ShaderScene(backend=WindowBackend.Preview)
    scene.frame_limit = 6
    pygame.display.init()
    scene.main(width=32, height=16, fps=60)
    assert scene.frame >= 1
    assert getattr(scene, "_display_pump", None) is None  # never created
