"""Multi-device exports of the GRADED scenes (BASELINE.md configs) on the
virtual 8-device CPU mesh, asserting bit-identity with single-device output
— including non-divisible frame counts (the flush self-pads to the mesh
size, engine.flush; scene code no longer needs to know the mesh).

Pattern from test_multihost.py; VERDICT r2 task 6.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))

import demo
import fractals

from shaderflow_tpu import ops
from shaderflow_tpu.scene import ShaderScene


def export(scene_class, frames, devices=None, width=96, height=54, fps=10,
           **kwargs):
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "out.rgb"
        scene = scene_class()
        scene.main(width=width, height=height, fps=fps, time=frames / fps,
                   output=str(path), devices=devices, **kwargs)
        return np.fromfile(path, np.uint8).reshape(-1, scene.height,
                                                   scene.width, 3)


# Graded configs (BASELINE.md): bars, visualizer, mandelbrot, raymarch.
# 11 frames % 4 devices and % 8 devices != 0 — exercises the self-pad.
@pytest.mark.parametrize("devices", [4, 8])
@pytest.mark.parametrize("scene_class", [
    demo.MusicBars, demo.Visualizer, fractals.Mandelbrot, demo.RayMarch,
], ids=lambda c: c.__name__)
def test_graded_scene_sharded_export_bit_identical(scene_class, devices):
    frames = 11
    single = export(scene_class, frames)
    sharded = export(scene_class, frames, devices=devices)
    assert single.shape == sharded.shape == (frames, 54, 96, 3)
    np.testing.assert_array_equal(single, sharded)


# Temporal-feedback scenes: frame sharding is inexact, so the ROW axis
# shards instead (parallel/mesh.py:shard_row_renderer — GSPMD, XLA inserts
# the halo exchanges Life's neighbor stencil needs). height=56 divides both
# meshes; Life's fixed 192x108 simulation texture does NOT divide 8, which
# exercises the replicated-leaf fallback alongside sharded output rows.
@pytest.mark.parametrize("devices", [4, 8])
@pytest.mark.parametrize("scene_class", [demo.MotionBlur, demo.Life],
                         ids=lambda c: c.__name__)
def test_feedback_scene_row_sharded_export_bit_identical(scene_class, devices):
    frames = 11
    single = export(scene_class, frames, height=56)
    sharded = export(scene_class, frames, height=56, devices=devices)
    assert single.shape == sharded.shape == (frames, 56, 96, 3)
    np.testing.assert_array_equal(single, sharded)


def test_row_sharded_flush_actually_shards():
    """The feedback path must run on the mesh, not silently fall back:
    the frames returned by flush carry a row-sharded layout."""
    from shaderflow_tpu.parallel.mesh import frame_mesh

    scene = demo.MotionBlur()
    scene._setup_run(width=64, height=32, fps=10, time=1.0, freewheel=True)
    scene.engine.mesh = frame_mesh(4)
    scene.engine.begin_batch()
    for _ in range(3):
        scene.next(dt=scene.frametime)
    frames = scene.engine.flush(3)
    assert frames.shape == (3, 32, 64, 3)
    assert len(frames.sharding.device_set) == 4
    # and the carry stayed sharded for the next batch
    carry = scene.engine._carry[scene.shader.name]
    assert len(carry.sharding.device_set) == 4


def test_flush_self_pads_without_pad_to():
    """Direct engine users: a frame-sharded flush whose count does not
    divide the mesh must pad itself instead of raising."""
    from shaderflow_tpu.parallel.mesh import frame_mesh

    class Ramp(ShaderScene):
        def build(self):
            import jax.numpy as jnp
            self.shader.fragment = lambda sf: ops.vec4(
                jnp.broadcast_to(sf.iTime, sf.astuv.shape[:-1]),
                sf.astuv[..., 0], sf.astuv[..., 1], 1.0)

    def run(mesh_devices):
        scene = Ramp()
        scene._setup_run(width=64, height=32, fps=10, time=1.0, freewheel=True)
        if mesh_devices:
            scene.engine.mesh = frame_mesh(mesh_devices)
        scene.engine.begin_batch()
        for _ in range(5):                      # 5 % 4 != 0
            scene.next(dt=scene.frametime)
        frames = scene.engine.flush(5)          # no pad_to
        assert frames is not None
        return np.asarray(frames)

    expected = run(None)
    got = run(4)
    assert expected.shape == got.shape == (5, 32, 64, 3)
    np.testing.assert_array_equal(expected, got)


def test_row_sharded_with_streamed_texture_bit_identical():
    """Row path + a host-written per-frame texture: streamed textures ride
    the replicated in_shardings prefix (a dict leaf, not a bare array) —
    locks the pytree-prefix handling in shard_row_renderer."""
    import jax.numpy as jnp

    from shaderflow_tpu.parallel.mesh import frame_mesh
    from shaderflow_tpu.texture import ShaderTexture

    class FeedbackStream(ShaderScene):
        def build(self):
            self.noise = ShaderTexture(scene=self, name="noise",
                                       components=1, track=False)
            self.noise.size = (8, 8)
            self.shader.texture.temporal = 3

            def frag(sf):
                prev = sf.texture(sf.tex("iScreen", 1, 0), sf.astuv)
                n = sf.texture("noise", sf.astuv)
                r = 0.5 * prev[..., 0] + 0.5 * n[..., 0]
                return ops.vec4(r, n[..., 0], prev[..., 0], 1.0)
            self.shader.fragment = frag

        def update(self):
            rng = np.random.default_rng(100 + self.frame)
            self.noise.write(rng.random((8, 8, 1)).astype(np.float32))

    def run(devices):
        scene = FeedbackStream()
        scene._setup_run(width=64, height=32, fps=10, time=0.7, freewheel=True)
        if devices:
            scene.engine.mesh = frame_mesh(devices)
        scene.engine.begin_batch()
        for _ in range(7):
            scene.next(dt=scene.frametime)
        return np.asarray(scene.engine.flush(7))

    single = run(None)
    sharded = run(4)
    assert single.shape == sharded.shape == (7, 32, 64, 3)
    np.testing.assert_array_equal(single, sharded)
