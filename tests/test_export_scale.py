"""Production-scale export delivery evidence (FFmpegSink + C++ pump).

The reference's export numbers include GPU readback + pipe write + encode
(/root/reference/shaderflow/exporting.py:148-200). These tests prove the
equivalent host-side delivery path here at production frame sizes instead
of the 32x16 toys the lifecycle tests use:

  * 1920x1080 frames through the native pump to a draining encoder stub,
    full byte accounting at multi-GB volume;
  * overlap: wall-clock ~= max(render, write), not their sum, when the
    consumer is the bottleneck (the pump's raison d'etre);
  * the scene export loop overlaps device compute with sink writes.

tools/bench_sink.py runs the same phases standalone (plus an optional
on-device phase) and records the numbers BENCHMARKS.md cites.
"""

import os
import stat
import time
from pathlib import Path

import numpy as np
import pytest

from shaderflow_tpu.io.ffmpeg import FFmpeg
from shaderflow_tpu.io.framepump import FramePump
from shaderflow_tpu.io.sinks import FFmpegSink, NullSink

# Drains stdin in chunks (no storage — frame volume exceeds RAM-friendly
# sizes), counts bytes, optionally throttles to a fixed per-byte rate.
DRAIN_STUB = r'''#!/usr/bin/env python3
import os, sys, time
if "f32le" in sys.argv and sys.argv[-1] == "-":
    sys.stdout.buffer.write(b"\x00" * (44100 * 2 * 4))   # 1 s stereo silence
    sys.exit(0)
rate = float(os.environ.get("STUB_DRAIN_BYTES_PER_SEC", "0"))  # 0 = unthrottled
total = 0
start = time.monotonic()
fd = sys.stdin.buffer
while True:
    chunk = fd.read(1 << 20)
    if not chunk:
        break
    total += len(chunk)
    if rate > 0:
        behind = total / rate - (time.monotonic() - start)
        if behind > 0:
            time.sleep(behind)
out = sys.argv[-1]
payload = b"STUB" + total.to_bytes(8, "little")
if out == "-":
    sys.stdout.buffer.write(payload)
else:
    with open(out, "wb") as handle:
        handle.write(payload)
'''

W, H = 1920, 1080
FRAME_BYTES = W * H * 3


@pytest.fixture
def drain_ffmpeg(tmp_path, monkeypatch):
    script = tmp_path / "bin" / "ffmpeg"
    script.parent.mkdir()
    script.write_text(DRAIN_STUB)
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{script.parent}{os.pathsep}{os.environ['PATH']}")
    FFmpeg.binary.cache_clear()
    FFmpeg.ffprobe.cache_clear()
    yield script
    FFmpeg.binary.cache_clear()
    FFmpeg.ffprobe.cache_clear()


def make_ffmpeg(out_path) -> FFmpeg:
    ff = FFmpeg()
    ff.pipe_input(pixel_format="rgb24", width=W, height=H, framerate=60)
    ff.output(path=out_path)
    ff.h264(preset="fast", crf=20)
    return ff


def read_stub_count(path: Path) -> int:
    blob = path.read_bytes()
    assert blob[:4] == b"STUB"
    return int.from_bytes(blob[4:12], "little")


def test_pump_native_in_ci():
    """The C++ pump must actually be the one under test (a silent fallback
    to the Python thread would fake the throughput evidence)."""
    read_fd, write_fd = os.pipe()
    pump = FramePump(write_fd, slot_size=64, slots=2)
    try:
        assert pump.is_native, "native framepump did not build in this environment"
    finally:
        pump.close()
        os.close(write_fd)
        os.close(read_fd)


def test_pump_throughput_1080p_production_volume(drain_ffmpeg, tmp_path):
    """600 frames of 1920x1080 rgb24 (~3.7 GB) through FFmpegSink + native
    pump to a draining encoder: exact byte accounting and a sane floor on
    throughput (this is the reference's TurboPipe duty at the reference's
    own benchmark resolution)."""
    frames_total = int(os.environ.get("EXPORT_SCALE_FRAMES", "600"))
    batch = 64
    out = tmp_path / "out.mp4"
    sink = FFmpegSink(make_ffmpeg(out), frame_bytes=FRAME_BYTES, buffers=5)
    assert sink.pump is not None and sink.pump.is_native

    # One reusable random batch: the pump memcpys on submit, so reuse is safe
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, H, W, 3), np.uint8)

    start = time.monotonic()
    sent = 0
    while sent < frames_total:
        n = min(batch, frames_total - sent)
        sink.write_batch(frames[:n])
        sent += n
    sink.pump.flush()
    submitted = time.monotonic() - start
    sink.finish()

    assert read_stub_count(out) == frames_total * FRAME_BYTES
    gbps = frames_total * FRAME_BYTES / submitted / 1e9
    fps = frames_total / submitted
    print(f"\npump throughput: {gbps:.2f} GB/s = {fps:.0f} fps @1080p "
          f"({frames_total} frames in {submitted:.2f}s)")
    # Very conservative floor: 1080p60 delivery needs 0.373 GB/s; CI boxes
    # under load still manage several x that through a local pipe.
    assert gbps > 0.5, f"pump throughput {gbps:.2f} GB/s below 0.5 GB/s floor"


def test_pump_overlap_write_bound(drain_ffmpeg, tmp_path, monkeypatch):
    """When the encoder is the bottleneck, submit() must overlap the
    producer's work with the drain: wall ~= max-side, not the serial sum.

    Self-calibrating against stub/OS timing imprecision: first measure the
    write-bound wall with a zero-cost producer, then add 60 ms of 'render'
    per frame — overlapped, the wall must absorb most of that render time
    instead of adding it."""
    frames_total = 16
    per_frame_write = 0.20          # consumer throttle target
    per_frame_render = 0.06
    monkeypatch.setenv("STUB_DRAIN_BYTES_PER_SEC", str(FRAME_BYTES / per_frame_write))
    frame = np.zeros((1, H, W, 3), np.uint8)

    def run(render_sleep: float, out: Path) -> float:
        sink = FFmpegSink(make_ffmpeg(out), frame_bytes=FRAME_BYTES, buffers=5)
        assert sink.pump is not None and sink.pump.is_native
        start = time.monotonic()
        for _ in range(frames_total):
            if render_sleep:
                time.sleep(render_sleep)       # stand-in for device render
            sink.write_batch(frame)
        sink.pump.flush()
        wall = time.monotonic() - start
        sink.finish()
        assert read_stub_count(out) == frames_total * FRAME_BYTES
        return wall

    # Timing test: retry under transient host contention (a loaded CI box
    # can stretch either run's sleeps) — genuine lost overlap fails all
    # three attempts deterministically.
    render_total = frames_total * per_frame_render
    added = None
    for attempt in range(3):
        wall_write = run(0.0, tmp_path / f"w{attempt}.mp4")
        wall_both = run(per_frame_render, tmp_path / f"rw{attempt}.mp4")
        added = wall_both - wall_write
        print(f"\noverlap[{attempt}]: write-bound wall {wall_write:.2f}s; "
              f"+{render_total:.2f}s of producer work added {added:.2f}s")
        if added < 0.5 * render_total:
            break
    # Overlapped: most of the producer's time hid under the writes
    assert added < 0.5 * render_total, (
        f"no overlap: {render_total:.2f}s of producer work added "
        f"{added:.2f}s to the wall")


class _TimingSink:
    """VideoSink that timestamps write_batch calls and simulates encode
    cost with a sleep. NOT a NullSink subclass: the export loop must take
    the real host-consuming path (async device->host copies +
    write_batch)."""

    def __init__(self, per_batch: float):
        self.per_batch = per_batch
        self.stamps: list[float] = []
        self.frames = 0

    def write_batch(self, frames) -> None:
        self.stamps.append(time.monotonic())
        host = np.asarray(frames)
        self.frames += int(host.shape[0])
        if self.per_batch:
            time.sleep(self.per_batch)

    def finish(self):
        return None


def _run_with_sink(sink, monkeypatch):
    import shaderflow_tpu.exporting as exporting
    from shaderflow_tpu import ops
    from shaderflow_tpu.scene import ShaderScene

    class Heavy(ShaderScene):
        def build(self):
            import jax.numpy as jnp

            def frag(sf):
                from jax import lax
                acc = sf.astuv[..., 0]
                # fori_loop keeps the compile cheap while giving enough
                # device work per batch (>= ~50 ms) to measure overlap
                acc = lax.fori_loop(
                    0, 1024, lambda i, a: jnp.sin(a * 1.7 + 0.3), acc)
                return ops.vec4(acc, acc, acc, 1.0)
            self.shader.fragment = frag

    monkeypatch.setattr(
        exporting.ExportingHelper, "make_sink",
        lambda self, output, **kw: setattr(self, "sink", sink) or sink)
    scene = Heavy()
    start = time.monotonic()
    scene.main(width=640, height=360, fps=60, time=48 / 60, batch=8,
               output="patched")
    return time.monotonic() - start


def test_export_loop_overlaps_compute_and_writes(monkeypatch):
    """scene.main()'s export loop pipelines: while the sink consumes batch
    k-1 on the host, the device renders batch k. Calibrated wall-clock
    proof: measure the steady per-batch render time with a zero-cost sink,
    then rerun with a sink sleeping 1.5x that per batch. Serial execution
    would add the full B * sleep to the wall; the pipelined loop hides one
    render under each sleep, so the wall grows by roughly
    B * (sleep - render) instead."""
    batches = 48 // 8
    # Timing test: retry under transient host contention (another process
    # stealing the core inflates one run's wall time); genuine loss of
    # overlap fails all three attempts deterministically.
    last = None
    for attempt in range(3):
        calibrate = _TimingSink(per_batch=0.0)
        wall0 = _run_with_sink(calibrate, monkeypatch)
        assert calibrate.frames == 48
        steady = float(np.median(np.diff(calibrate.stamps)))
        if steady < 0.05:
            pytest.skip(f"render too fast to measure overlap ({steady*1e3:.1f} ms/batch)")

        sleep = min(1.0, 1.5 * steady)
        timed = _TimingSink(per_batch=sleep)
        wall1 = _run_with_sink(timed, monkeypatch)
        assert timed.frames == 48
        added = wall1 - wall0
        serial_add = batches * sleep
        print(f"\nexport loop overlap[{attempt}]: steady render "
              f"{steady*1e3:.0f} ms/batch; adding {sleep*1e3:.0f} ms/batch "
              f"of sink cost grew the wall by {added:.2f}s "
              f"(serial would be +{serial_add:.2f}s)")
        # Pipelined: most of the render time hid under the sink sleeps
        if added < 0.75 * serial_add:
            return
        last = (added, serial_add)
    added, serial_add = last
    raise AssertionError(f"no compute/write overlap in 3 attempts: wall "
                         f"grew {added:.2f}s ~ serial {serial_add:.2f}s")


def test_pipeline_depth_preserves_order_and_content(tmp_path, monkeypatch):
    """The in-flight batch queue (SHADERFLOW_PIPELINE_DEPTH) must deliver
    every frame once, in order, bit-identical to depth=1 — including the
    partial final batch."""
    import sys
    import numpy as np
    sys.path.insert(0, "examples/basic")
    import demo

    outputs = {}
    for depth in ("1", "3"):
        monkeypatch.setenv("SHADERFLOW_PIPELINE_DEPTH", depth)
        out = tmp_path / f"depth{depth}.rgb"
        demo.Basic().main(width=64, height=32, fps=10, time=1.1,
                          batch=4, output=str(out))
        outputs[depth] = np.fromfile(out, np.uint8)
    assert outputs["1"].size == 11 * 32 * 64 * 3
    np.testing.assert_array_equal(outputs["1"], outputs["3"])
