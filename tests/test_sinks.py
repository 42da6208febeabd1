"""Video sinks: mp4 via OpenCV fallback, PNG/raw sinks, sink selection."""

from pathlib import Path

import numpy as np
import pytest

from shaderflow_tpu import ops
from shaderflow_tpu.io.sinks import CV2Sink, ImageSink, NullSink, PipeSink, RawSink
from shaderflow_tpu.scene import ShaderScene


class Ramp(ShaderScene):
    def build(self):
        import jax.numpy as jnp
        self.shader.fragment = lambda sf: ops.vec4(
            sf.astuv[..., 0], jnp.broadcast_to(ops.fract(sf.iTime), sf.astuv.shape[:-1]),
            0.5, 1.0)


def frames_like(count=4, h=32, w=64, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (count, h, w, 3), np.uint8)


def test_cv2_sink_roundtrip(tmp_path):
    import cv2
    path = tmp_path / "out.mp4"
    frames = frames_like()
    sink = CV2Sink(path, width=64, height=32, fps=10)
    sink.write_batch(frames)
    result = sink.finish()
    assert result == path and path.stat().st_size > 0

    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    ok, first = cap.read()
    assert ok and first.shape == (32, 64, 3)
    cap.release()


def test_mp4_export_end_to_end(tmp_path):
    """Scene -> mp4 through the sink selector (no ffmpeg binary here)."""
    import cv2
    out = tmp_path / "video.mp4"
    scene = Ramp()
    result = scene.main(width=64, height=32, fps=10, time=0.5, output=str(out))
    assert Path(result) == out
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()


def test_image_sink(tmp_path):
    sink = ImageSink(tmp_path / "frames")
    sink.write_batch(frames_like(3))
    directory = sink.finish()
    assert len(list(directory.glob("*.png"))) == 3


def test_raw_sink_metadata(tmp_path):
    sink = RawSink(tmp_path / "o.rgb", width=64, height=32, fps=10)
    sink.write_batch(frames_like(2))
    path = sink.finish()
    import json
    meta = json.loads(path.with_suffix(".rgb.json").read_text())
    assert meta["frames"] == 2 and meta["width"] == 64


def test_pipe_sink_bytes():
    sink = PipeSink()
    frames = frames_like(2)
    sink.write_batch(frames)
    data = sink.finish()
    assert data == frames.tobytes()


def test_null_sink_counts():
    sink = NullSink()
    sink.write_batch(frames_like(7))
    sink.finish()
    assert sink.frames == 7


def test_pipe_output_returns_bytes(tmp_path):
    scene = Ramp()
    result = scene.main(width=16, height=8, fps=10, time=0.2, output="pipe")
    assert isinstance(result, bytes)
    assert len(result) == 2 * 16 * 8 * 3


def test_tcp_sink_streams_raw_frames():
    """output='tcp://host:port' without an ffmpeg binary streams raw rgb24
    (reference exporting.py:24-27 TCP output type)."""
    import socket
    import threading

    import numpy as np
    from shaderflow_tpu.scene import ShaderScene

    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    received = bytearray()

    def accept():
        conn, _ = server.accept()
        while True:
            chunk = conn.recv(1 << 16)
            if not chunk:
                break
            received.extend(chunk)
        conn.close()

    thread = threading.Thread(target=accept, daemon=True)
    thread.start()

    scene = ShaderScene()
    scene.main(width=64, height=36, fps=10, time=0.3,
               output=f"tcp://127.0.0.1:{port}")
    thread.join(timeout=10)
    server.close()
    assert len(received) == 3 * 64 * 36 * 3  # 3 frames of rgb24
