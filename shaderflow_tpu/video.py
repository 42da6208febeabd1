"""
ShaderVideo — video files as textures.

Role-equivalent of the reference video module
(/root/reference/shaderflow/video.py): streams decoded RGB frames (FFmpeg
rawvideo pipe, or OpenCV when no binary exists — io/ffmpeg.py) into a uint8
texture, writing a new frame only when scene time passes the next frame
timestamp; supports .temporal rings for feedback effects.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

from shaderflow_tpu import logger
from shaderflow_tpu.io.ffmpeg import FFmpeg
from shaderflow_tpu.module import ShaderModule
from shaderflow_tpu.texture import ShaderTexture


class FramePrefetcher:
    """Decode-ahead worker for the video frame stream.

    The reference decodes inline in the render loop (video.py:57-66), so
    each frame pays the full FFmpeg-pipe read / cv2 decode latency
    (~5-30 ms at 1080p-4K) serialized with rendering. Here a daemon thread
    decodes up to `depth` frames ahead into a bounded queue; update() just
    dequeues — decode overlaps the device render, and at 4K60 the video
    texture stops being the export wall. Bounded queue = bounded memory
    (depth x H x W x 3 bytes)."""

    def __init__(self, iterator, depth: int = 16):
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = threading.Event()
        self._finished = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(iterator,), daemon=True,
            name="shaderflow-video-prefetch")
        self._thread.start()

    def _run(self, iterator) -> None:
        try:
            for frame in iterator:
                while not self._stop.is_set():
                    try:
                        self._queue.put(frame, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except Exception as error:  # decode error ends the stream
            logger.warn(f"Video decode stopped: {error}")
        finally:
            self._finished.set()

    def next(self) -> np.ndarray:
        """Next decoded frame; raises StopIteration at end of stream."""
        while True:
            try:
                return self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._finished.is_set() and self._queue.empty():
                    raise StopIteration

    def close(self) -> None:
        self._stop.set()
        # Unblock a producer waiting on a full queue
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class ShaderVideo(ShaderModule):

    def __init__(self, scene=None, name: str = "iVideo", *, path=None,
                 width: Optional[int] = None, height: Optional[int] = None,
                 fps: Optional[float] = None, **kwargs):
        self.path = Path(path) if path else None
        self._request = (width, height, fps)
        self._reader = None
        self._frames = 0
        self.texture: Optional[ShaderTexture] = None
        super().__init__(scene=scene, name=name, **kwargs)

    def build(self) -> None:
        width, height, fps = self._request
        if self.path is not None:
            if not all((width, height)):
                size = FFmpeg.get_video_resolution(self.path)
                if size is None:
                    logger.warn(f"Could not probe video {self.path}")
                    size = (1280, 720)
                width, height = size
            fps = fps or FFmpeg.get_video_framerate(self.path) or 30.0
            self._reader = FramePrefetcher(FFmpeg.iter_video_frames(self.path))
        self.width = int(width or 1280)
        self.height = int(height or 720)
        self.fps = float(fps or 30.0)

        self.texture = ShaderTexture(
            scene=self.scene,
            name=self.name,
            width=self.width,
            height=self.height,
            dtype=np.uint8,
            components=3,
        )

    def setup(self) -> None:
        if self.path is not None:
            if isinstance(self._reader, FramePrefetcher):
                self._reader.close()
            self._reader = FramePrefetcher(FFmpeg.iter_video_frames(self.path))
            self._frames = 0

    def update(self) -> None:
        if self._reader is None:
            return
        # Write only when a new content frame is due
        while self.scene.time > (self._frames / self.fps):
            try:
                frame = self._reader.next()
            except StopIteration:
                self._reader = None
                return
            self.texture.roll()
            # write() is GL bottom-up; flip the top-down decoded frame
            self.texture.write(frame[::-1])
            self._frames += 1

    def destroy(self) -> None:
        if isinstance(self._reader, FramePrefetcher):
            self._reader.close()
            self._reader = None

    @property
    def duration(self) -> float:
        if self.path is None:
            return 0.0
        return FFmpeg.get_video_duration(self.path) or 0.0
