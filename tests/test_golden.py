"""Golden-frame regression tests.

The driver's acceptance criterion is PSNR-level stability (BASELINE.md:
>=40 dB); these tests pin each reference scene's output against checked-in
golden frames so refactors and kernel optimizations cannot silently drift
the image. Regenerate goldens intentionally via
`python tests/regen_golden.py` when semantics change on purpose.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


def render_last_frame(scene_cls, frames=3, width=96, height=54, fps=10):
    scene = scene_cls()
    scene._setup_run(width=width, height=height, fps=fps, time=frames / fps,
                     freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(frames):
        scene.next(dt=scene.frametime)
    return np.asarray(engine.flush(frames))[-1]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(255.0 ** 2 / mse)


def load_scene(name):
    import sys
    repo = Path(__file__).parent.parent
    sys.path.insert(0, str(repo / "examples" / "basic"))
    sys.path.insert(0, str(repo / "examples" / "fractals"))
    import demo
    import fractals
    return {
        "basic": demo.Basic,
        "shadertoy": demo.ShaderToy,
        "mandelbrot": fractals.Mandelbrot,
        "tetration": fractals.Tetration,
        "raymarch": demo.RayMarch,
    }[name]


@pytest.mark.parametrize("name", ["basic", "shadertoy", "mandelbrot", "tetration", "raymarch"])
def test_golden_frame(name):
    from PIL import Image
    golden = np.array(Image.open(GOLDEN / f"{name}.png"))
    got = render_last_frame(load_scene(name))
    assert got.shape == golden.shape
    score = psnr(got, golden)
    # Identical math should be bit-equal; allow tiny slack for compiler
    # reassociation across XLA versions
    assert score > 50.0, f"{name}: PSNR {score:.1f} dB vs golden"
