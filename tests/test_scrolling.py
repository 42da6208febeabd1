"""Scrolling (ring) device sequences: the engine synthesizes the last-L-
columns ring inside the render scan (reference audio/spectrogram.py
scrolling texture, without streaming columns from the host per frame)."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.scene import ShaderScene
from shaderflow_tpu.texture import ShaderTexture

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples"))


def host_ring(columns: np.ndarray, k: int, L: int) -> np.ndarray:
    """Reference ring layout: the host write path puts column k at
    x=(k+1)%L each frame over a zero-initialized texture."""
    H = columns.shape[1]
    ring = np.zeros((H, L) + columns.shape[2:], columns.dtype)
    for m in range(min(k + 1, L)):
        ring[:, (k - m + 1) % L] = columns[k - m]
    return ring


class RingScene(ShaderScene):
    L = 6
    F = 9

    def build(self):
        cols = ((np.arange(self.F, dtype=np.float32) + 1) / 20)[:, None, None, None]
        self.columns = np.broadcast_to(cols, (self.F, 4, 1, 1)).copy()
        self.columns += np.arange(4, dtype=np.float32)[None, :, None, None] / 100
        self.ring_tex = ShaderTexture(scene=self, name="ring", width=self.L,
                                      height=4, components=1, dtype=np.float32)
        self.ring_tex.filter = "nearest"
        self.ring_tex.set_sequence(jnp.asarray(self.columns), window=self.L)
        self.shader.fragment = lambda sf: ops.vec4(
            sf.texture("ring", sf.astuv)[..., 0], 0.0, 0.0, 1.0)


def test_ring_sequence_matches_host_layout(tmp_path):
    out = tmp_path / "ring.raw"
    scene = RingScene()
    scene.main(width=RingScene.L, height=4, fps=10, time=RingScene.F / 10,
               output=str(out), subsample=1)
    frames = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        RingScene.F, 4, RingScene.L, 3)[..., 0] / 255.0

    for k in range(RingScene.F):
        expected = host_ring(scene.columns[:, :, 0, 0], k, RingScene.L)
        np.testing.assert_allclose(frames[k], expected, atol=1 / 255,
                                   err_msg=f"frame {k}")


def test_scrolling_spectrogram_uses_device_ring(tmp_path):
    """Offline scrolling spectrogram binds a windowed device sequence and the
    rendered texture matches the ring of its precomputed columns exactly."""
    from assets import music_wav
    from shaderflow_tpu.audio import ShaderAudio
    from shaderflow_tpu.audio.spectrogram import ShaderSpectrogram

    fps, L, bins, F = 10, 6, 16, 8

    class Scrolling(ShaderScene):
        def build(self):
            self.audio = ShaderAudio(scene=self, name="iAudio", file=music_wav())
            self.spectrogram = ShaderSpectrogram(
                scene=self, audio=self.audio, length=L / fps)
            self.spectrogram.spectrogram_bins = bins
            self.shader.fragment = lambda sf: ops.vec4(
                sf.texture("iSpectrogram", sf.astuv)[..., 0], 0.0, 0.0, 1.0)

    out = tmp_path / "spec.raw"
    scene = Scrolling()
    scene.main(width=L, height=bins, fps=fps, time=F / fps, output=str(out),
               subsample=1)

    module = scene.spectrogram
    assert module.texture.sequence is not None
    assert module.texture.sequence_window == L

    frames = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        F, bins, L, 3)[..., 0] / 255.0
    # _precomputed is bind-ready texture layout (F, bins, 1, C): row 0 =
    # top = highest bin already; take channel 0
    columns = np.asarray(module._precomputed)[:, :, 0, 0]
    for k in range(F):
        expected = np.clip(host_ring(columns, k, L), 0, 1)
        np.testing.assert_allclose(frames[k], expected, atol=1 / 255,
                                   err_msg=f"frame {k}")
    # The texture actually scrolls: consecutive frames differ
    assert not np.array_equal(frames[0], frames[-1])
