"""Integration: every example scene exports a few frames headlessly.

The reference treats its examples as the de-facto integration suite
(SURVEY.md §4); here each scene renders a tiny export and basic image
sanity is asserted.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))
sys.path.insert(0, str(REPO / "examples"))

import demo
import fractals


def export(scene_class, frames=2, width=96, height=54, fps=10, **kwargs):
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "out.rgb"
        scene = scene_class()
        scene.main(width=width, height=height, fps=fps, time=frames / fps,
                   output=str(path), **kwargs)
        return np.fromfile(path, np.uint8).reshape(-1, scene.height, scene.width, 3)


@pytest.mark.parametrize("scene_class", [
    demo.Basic, demo.ShaderToy, demo.MultiShader, demo.Multipass, demo.MotionBlur,
    demo.Dynamics, demo.Waveform, demo.RayMarch,
    fractals.Mandelbrot, fractals.Julia, fractals.Tetration,
], ids=lambda c: c.__name__)
def test_scene_exports(scene_class):
    frames = export(scene_class)
    assert frames.shape[0] == 2
    assert frames.dtype == np.uint8
    # Non-degenerate image: some variation across pixels
    assert frames[-1].std() > 0.5


@pytest.mark.parametrize("scene_class", [demo.MusicBars, demo.Visualizer],
                         ids=lambda c: c.__name__)
def test_audio_scene_exports(scene_class):
    # Audio-reactive content needs some runtime for levels to settle
    frames = export(scene_class, frames=8)
    assert frames.shape[0] == 8
    assert frames[-1].std() > 0.5
    # Audio reactivity: later frames differ from the first
    assert not np.array_equal(frames[0], frames[-1])


def test_life_runs_and_evolves():
    frames = export(demo.Life, frames=14, fps=10)
    # The life grid (period 6) must change the visual output over time
    assert not np.array_equal(frames[0], frames[-1])


def test_cli_launch(tmp_path):
    from shaderflow_tpu.cli import launch
    out = tmp_path / "cli.rgb"
    result = launch([demo.Basic], ["Basic", "main", "-w", "64", "-h", "32",
                                   "-f", "10", "-t", "0.2", "-o", str(out)])
    assert Path(result).exists()
    data = np.fromfile(result, np.uint8)
    assert data.size == 2 * 64 * 32 * 3


def test_video_scene_exports():
    frames = export(demo.Video, frames=3)
    assert frames.shape[0] == 3
    # The plasma clip must actually appear (colorful, varying)
    assert frames[-1].std() > 10


def test_piano_roll_scene_exports():
    import piano_roll
    frames = export(piano_roll.PianoRoll, frames=3)
    assert frames.shape[0] == 3
    assert frames[-1].std() > 10


def test_frame_prefetcher_order_overlap_and_end():
    """FramePrefetcher: decode-ahead thread delivers frames in order, fills
    its queue while the consumer is idle (the overlap), and raises
    StopIteration exactly once at end of stream."""
    import time
    from shaderflow_tpu.video import FramePrefetcher

    def slow_frames(n=12, delay=0.005):
        for k in range(n):
            time.sleep(delay)
            yield np.full((2, 2, 3), k, np.uint8)

    pf = FramePrefetcher(slow_frames(), depth=8)
    first = pf.next()
    assert int(first[0, 0, 0]) == 0
    # Decode-ahead: while the consumer sits idle, the worker keeps filling
    time.sleep(0.2)
    assert pf._queue.qsize() >= 4
    got = [int(pf.next()[0, 0, 0]) for _ in range(11)]
    assert got == list(range(1, 12))
    import pytest
    with pytest.raises(StopIteration):
        pf.next()
    pf.close()


def test_frame_prefetcher_close_unblocks_producer():
    from shaderflow_tpu.video import FramePrefetcher

    def endless():
        k = 0
        while True:
            yield np.full((2, 2, 3), k % 256, np.uint8)
            k += 1

    pf = FramePrefetcher(endless(), depth=2)
    pf.next()
    pf.close()
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()
