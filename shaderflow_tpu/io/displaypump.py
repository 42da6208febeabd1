"""Latest-frame-wins device->host transfer worker for the realtime preview.

The reference's realtime loop blocks on the GL swapchain (double-buffered
vsync, reference scene.py:461-462) — the GPU-to-screen path is free there.
On a TPU the displayed frame must cross device->host first, and on a
REMOTE-attached chip that transfer can cost hundreds of milliseconds
(measured ~300-400 ms for a 6.2 MB 1080p frame through this environment's
tunnel). Blocking the render loop on it caps the whole scene — input,
dynamics, audio — at the link rate.

This pump decouples them: the loop offers every dispatched frame handle and
picks up the newest COMPLETED host frame, never blocking. Transfers slower
than the frame period drop frames (latest wins) instead of stalling scene
time — the standard game-engine behavior when presentation can't keep up.
On locally-attached hardware (PCIe, ~ms transfers) the pump keeps up with
every frame and additionally overlaps the transfer with the next frame's
render.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import numpy as np


class DisplayPump:
    def __init__(self) -> None:
        self._cv = threading.Condition()
        self._handle: Any = None          # newest dispatched device frames
        self._result: Optional[np.ndarray] = None  # newest completed host frame
        self._stop = False
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="shaderflow-display")
        self._thread.start()

    def offer(self, frames: Any) -> None:
        """Hand the newest dispatched (1, H, W, 3) device batch to the pump.
        Replaces any not-yet-started handle (latest wins); never blocks."""
        with self._cv:
            self._handle = frames
            self._cv.notify()

    def take(self) -> Optional[np.ndarray]:
        """The newest completed host frame, or None if the transfer in
        flight hasn't finished since the last take. Never blocks."""
        with self._cv:
            result, self._result = self._result, None
            return result

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=5.0)

    def _run(self) -> None:
        while True:
            with self._cv:
                while self._handle is None and not self._stop:
                    self._cv.wait()
                if self._stop:
                    return
                frames, self._handle = self._handle, None
            host = np.asarray(frames[0])  # blocks THIS thread only
            with self._cv:
                self._result = host
