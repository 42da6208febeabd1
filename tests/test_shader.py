"""ShaderProgram: source forms, error fallback, hot reload."""

import time
from pathlib import Path

import numpy as np

from shaderflow_tpu.scene import ShaderScene
from shaderflow_tpu.shader import ShaderProgram, default_fragment, missing_fragment


SOURCE_V1 = """
from shaderflow_tpu import ops

def main(sf):
    return ops.vec4(1.0, 0.0, 0.0, 1.0) + 0 * sf.astuv[..., 0:1]
"""

SOURCE_V2 = SOURCE_V1.replace("1.0, 0.0, 0.0", "0.0, 1.0, 0.0")


def make_scene():
    scene = ShaderScene()
    scene.initialize()
    return scene


def test_fragment_from_string():
    scene = make_scene()
    scene.shader.fragment = SOURCE_V1
    assert callable(scene.shader.fragment)
    assert scene.shader.fragment is not missing_fragment


def test_fragment_from_path_and_hot_reload(tmp_path):
    scene = make_scene()
    path = tmp_path / "frag.py"
    path.write_text(SOURCE_V1)
    scene.shader.fragment = path
    first = scene.shader.fragment

    # Rewrite the file; polling notices the mtime change and schedules a
    # recompile marshalled through the scheduler (main-thread discipline,
    # reference shader.py:243-262)
    time.sleep(0.02)
    path.write_text(SOURCE_V2)
    import os
    os.utime(path, (time.time() + 1, time.time() + 1))
    assert scene.shader.poll_hot_reload()
    scene.scheduler.all_once()
    assert scene.shader.fragment is not first


def test_bad_source_falls_back_to_missing(caplog):
    scene = make_scene()
    scene.shader.fragment = "def main(sf: this is not python"
    assert scene.shader.fragment is missing_fragment


def test_source_without_main_falls_back():
    scene = make_scene()
    scene.shader.fragment = "x = 1"
    assert scene.shader.fragment is missing_fragment


def test_default_fragment_assigned_on_build():
    scene = make_scene()
    assert scene.shader.fragment is default_fragment


def test_compile_relay_recompiles_all():
    from shaderflow_tpu.message import ShaderMessage
    scene = make_scene()
    child = ShaderProgram(scene=scene, name="child")
    child.fragment = SOURCE_V1
    scene.relay(ShaderMessage.Shader.Compile)
    assert callable(child.fragment)


def test_missing_fragment_renders():
    """The fallback shader itself must be renderable."""
    import tempfile
    scene = make_scene()
    scene.shader.fragment = "broken((("
    with tempfile.TemporaryDirectory() as tmp:
        out = Path(tmp) / "o.rgb"
        scene.main(width=32, height=16, fps=10, time=0.2, output=str(out))
        frames = np.fromfile(out, np.uint8).reshape(-1, 16, 32, 3)
        # Magenta checkerboard: red+blue present, green absent
        assert frames[0, ..., 0].max() > 0
        assert frames[0, ..., 2].max() > 0
        assert frames[0, ..., 1].max() == 0


def test_instanced_rendering_last_writer_wins_and_discard():
    """ShaderProgram.instances: the pixel program runs N times; without
    discard the last instance overwrites, with discard earlier instances
    (or the zero clear color) show through."""
    import numpy as np
    from shaderflow_tpu import ops
    from shaderflow_tpu.scene import ShaderScene

    class Instanced(ShaderScene):
        def build(self):
            self.shader.instances = 3

            def frag(sf):
                # Instance i draws a flat color only on column band i
                u = sf.astuv[..., 0]
                lo, hi = sf.instance / 4, (sf.instance + 1) / 4
                sf.discard((u < lo) | (u >= hi))
                value = (sf.instance + 1) / 10
                return ops.vec4(value, value, value, 1.0)
            self.shader.fragment = frag

    scene = Instanced()
    scene._setup_run(width=8, height=4, fps=10, time=0.1, freewheel=True, subsample=1)
    scene.engine.begin_batch()
    scene.next(dt=scene.frametime)
    frame = np.asarray(scene.engine.flush(1))[0]

    # Columns 0-1: instance 0 (0.1); 2-3: instance 1 (0.2); 4-5: instance 2
    # (0.3); 6-7: everyone discarded -> clear color (0)
    row = frame[0, :, 0] / 255
    np.testing.assert_allclose(row[:2], 0.1, atol=0.01)
    np.testing.assert_allclose(row[2:4], 0.2, atol=0.01)
    np.testing.assert_allclose(row[4:6], 0.3, atol=0.01)
    np.testing.assert_allclose(row[6:], 0.0, atol=0.01)


def test_instanced_rendering_without_discard_overwrites():
    import numpy as np
    from shaderflow_tpu import ops
    from shaderflow_tpu.scene import ShaderScene

    class Plain(ShaderScene):
        def build(self):
            self.shader.instances = 4
            self.shader.fragment = lambda sf: ops.vec4(
                (sf.instance + 1) / 10, 0.0, 0.0, 1.0)

    scene = Plain()
    scene._setup_run(width=8, height=4, fps=10, time=0.1, freewheel=True, subsample=1)
    scene.engine.begin_batch()
    scene.next(dt=scene.frametime)
    frame = np.asarray(scene.engine.flush(1))[0]
    np.testing.assert_allclose(frame[..., 0] / 255, 0.4, atol=0.01)
