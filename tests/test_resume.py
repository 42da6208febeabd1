"""Export resume: deterministic freewheel time makes any frame reproducible."""

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.scene import ShaderScene


class Ramp(ShaderScene):
    def build(self):
        self.shader.fragment = lambda sf: ops.vec4(
            jnp.broadcast_to(sf.iTime, sf.astuv.shape[:-1]),
            sf.astuv[..., 0], 0.0, 1.0)


class Feedback(ShaderScene):
    """Temporal accumulator: frame k depends on frame k-1."""

    def build(self):
        self.shader.texture.temporal = 2

        def frag(sf):
            previous = sf.texture(sf.tex("iScreen", 1, 0), sf.astuv)
            value = previous[..., 0] + 0.1
            return ops.vec4(value, 0.0, 0.0, 1.0)
        self.shader.fragment = frag


def read(path, scene):
    return np.fromfile(path, np.uint8).reshape(-1, scene.height, scene.width, 3)


def test_resume_stateless_matches_full_export(tmp_path):
    full_scene = Ramp()
    full_scene.main(width=32, height=16, fps=10, time=0.8, output=str(tmp_path / "full.rgb"))
    full = read(tmp_path / "full.rgb", full_scene)

    part_scene = Ramp()
    part_scene.main(width=32, height=16, fps=10, time=0.8, start=0.4,
                    output=str(tmp_path / "part.rgb"))
    part = read(tmp_path / "part.rgb", part_scene)

    assert full.shape[0] == 8 and part.shape[0] == 4
    np.testing.assert_array_equal(part, full[4:])


def test_resume_feedback_scene_renders_history(tmp_path):
    full_scene = Feedback()
    full_scene.main(width=16, height=8, fps=10, time=0.8, output=str(tmp_path / "full.rgb"))
    full = read(tmp_path / "full.rgb", full_scene)

    part_scene = Feedback()
    part_scene.main(width=16, height=8, fps=10, time=0.8, start=0.5,
                    output=str(tmp_path / "part.rgb"))
    part = read(tmp_path / "part.rgb", part_scene)

    assert part.shape[0] == 3
    np.testing.assert_array_equal(part, full[5:])
