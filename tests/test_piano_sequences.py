"""Piano device-sequence precompute: freewheel exports must render exactly
the frames the per-frame streamed path produces (same scan, same ODE steps,
engine indexing by iFrameIndex)."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples"))


def test_precompute_parity_end_to_end(monkeypatch):
    """The real assertion: bit-identical frames between both paths."""
    import tempfile
    import piano_roll
    from shaderflow_tpu.piano import ShaderPiano

    outputs = {}
    for precompute in (True, False):
        monkeypatch.setattr(ShaderPiano, "precompute", precompute)
        with tempfile.TemporaryDirectory() as tmp:
            path = Path(tmp) / "out.rgb"
            scene = piano_roll.PianoRoll()
            scene.main(width=96, height=54, fps=10, time=0.6, output=str(path))
            assert scene.piano.precompute is precompute
            outputs[precompute] = np.fromfile(path, np.uint8).reshape(
                -1, scene.height, scene.width, 3)

    assert outputs[True].shape == outputs[False].shape
    # Same scan + same ODE trajectory + same sampler reads -> identical u8
    mismatch = (outputs[True].astype(np.int16)
                - outputs[False].astype(np.int16))
    assert np.abs(mismatch).max() <= 1
    assert (mismatch != 0).mean() < 0.01


def test_precompute_is_cached():
    import piano_roll
    scene = piano_roll.PianoRoll()
    scene._setup_run(width=96, height=54, fps=10, time=0.5, freewheel=True)
    scene.next(dt=scene.frametime)
    first = scene.piano._sequence_arrays
    # Second setup + update must reuse the host arrays (no re-scan)
    scene._setup_run(width=96, height=54, fps=10, time=0.5, freewheel=True)
    scene.next(dt=scene.frametime)
    assert scene.piano._sequence_arrays is first
