"""Scene integration: time model, export loop, multipass/temporal semantics,
custom shaders, texture streaming."""

import numpy as np
import pytest

import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.scene import ShaderScene
from shaderflow_tpu.shader import ShaderProgram
from shaderflow_tpu.texture import ShaderTexture
from shaderflow_tpu.variable import Uniform


def export_frames(scene, frames=4, width=64, height=32, fps=10, **kwargs):
    """Helper: run an export into a raw sink and load the frames back."""
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "out.rgb"
        scene.main(width=width, height=height, fps=fps, time=frames / fps,
                   output=str(path), **kwargs)
        data = np.fromfile(path, np.uint8)
        return data.reshape(-1, scene.height, scene.width, 3)


class Solid(ShaderScene):
    """Constant color scene for exact-value assertions."""
    color = (0.2, 0.4, 0.6)

    def build(self):
        color = self.color
        self.shader.fragment = lambda sf: ops.vec4(
            jnp.full(sf.astuv.shape[:-1], color[0]),
            jnp.full(sf.astuv.shape[:-1], color[1]),
            jnp.full(sf.astuv.shape[:-1], color[2]), 1.0)


def test_solid_color_export():
    frames = export_frames(Solid(), frames=3)
    assert frames.shape == (3, 32, 64, 3)
    expected = np.floor(np.array([0.2, 0.4, 0.6]) * 255 + 0.5)
    np.testing.assert_array_equal(frames[0, 0, 0], expected)
    np.testing.assert_array_equal(frames[-1], frames[0])


class TimeRamp(ShaderScene):
    """Encodes iTime in the red channel: checks frame zero is t=0 and the
    timestep is exactly 1/fps (freewheel determinism)."""

    def build(self):
        self.shader.fragment = lambda sf: ops.vec4(
            jnp.broadcast_to(sf.iTime, sf.astuv.shape[:-1]), 0.0, 0.0, 1.0)


def test_time_model_frame_zero_is_t0():
    frames = export_frames(TimeRamp(), frames=5, fps=10)
    reds = frames[:, 0, 0, 0] / 255.0
    expected = np.floor(np.clip(np.arange(5) * 0.1, 0, 1) * 255 + 0.5) / 255
    np.testing.assert_allclose(reds, expected, atol=1e-6)


class UvScene(ShaderScene):
    def build(self):
        self.shader.fragment = lambda sf: ops.vec4(
            sf.astuv[..., 0], sf.astuv[..., 1], 0.0, 1.0)


def test_uv_orientation():
    """astuv.y is 1 at the top of the image (GL v-up folded into rows)."""
    frames = export_frames(UvScene(), frames=1)
    frame = frames[0]
    # green channel (astuv.y): top row > bottom row
    assert frame[0, 0, 1] > frame[-1, 0, 1]
    # red channel (astuv.x): right > left
    assert frame[0, -1, 0] > frame[0, 0, 0]


class MultiShader(ShaderScene):
    """Two programs: child sampled by the main shader, like the reference
    MultiShader demo (examples/basic/demo.py:67-89)."""

    def build(self):
        self.child = ShaderProgram(scene=self, name="child")
        self.child.fragment = lambda sf: ops.vec4(
            0.0, 1.0 - sf.stuv[..., 0], 0.0, 1.0)
        self.shader.fragment = lambda sf: ops.with_alpha(
            ops.vec4(sf.stuv[..., 0], 0.0, 0.0, 1.0)
            + sf.texture("child", sf.astuv), 1.0)


def test_multishader_child_sampling():
    frames = export_frames(MultiShader(), frames=1)
    frame = frames[0].astype(np.float32) / 255
    # Left edge: green ~1 (child), red ~0; right edge: red ~1, green ~0
    assert frame[16, 0, 1] > 0.8 and frame[16, 0, 0] < 0.2
    assert frame[16, -1, 0] > 0.8 and frame[16, -1, 1] < 0.2


class Multipass(ShaderScene):
    """layers=2: layer 1 reads layer 0 of the same frame."""

    def build(self):
        self.shader.texture.layers = 2

        def frag(sf):
            if sf.iLayer == 0:
                return ops.vec4(0.25, 0.5, 0.75, 1.0)
            previous = sf.texture(sf.tex("iScreen", 0, 0), sf.astuv)
            return ops.with_alpha(previous[..., [2, 1, 0, 3]], 1.0)  # swap r/b
        self.shader.fragment = frag


def test_multipass_layers_same_frame():
    frames = export_frames(Multipass(), frames=2)
    expected = np.floor(np.array([0.75, 0.5, 0.25]) * 255 + 0.5)
    np.testing.assert_array_equal(frames[-1, 8, 8], expected)


class Temporal(ShaderScene):
    """temporal=3: layer samples its own previous frame (slot 1 after roll).
    Writes iTime each frame; reading temporal slot 1 yields last frame's."""

    def build(self):
        self.shader.texture.temporal = 3

        def frag(sf):
            previous = sf.texture(sf.tex("iScreen", 1, 0), sf.astuv)
            t = jnp.broadcast_to(sf.iTime, sf.astuv.shape[:-1])
            return ops.vec4(t, previous[..., 0], 0.0, 1.0)
        self.shader.fragment = frag


def test_temporal_feedback_previous_frame():
    frames = export_frames(Temporal(), frames=4, fps=10)
    reds = frames[:, 0, 0, 0].astype(np.float32) / 255
    greens = frames[:, 0, 0, 1].astype(np.float32) / 255
    # green[k] == red[k-1] (previous frame's written value)
    np.testing.assert_allclose(greens[1:], reds[:-1], atol=2 / 255)
    assert greens[0] == 0.0


class StreamedTexture(ShaderScene):
    """A module writes a 1x1 texture every frame -> streamed batching."""

    def build(self):
        self.data = ShaderTexture(scene=self, name="blink", width=1, height=1,
                                  components=1, dtype=np.float32)
        self.counter = 0
        self.shader.fragment = lambda sf: ops.vec4(
            sf.texture("blink", sf.astuv)[..., 0], 0.0, 0.0, 1.0)

    def update(self):
        self.counter += 1
        self.data.write(np.full((1, 1, 1), (self.counter % 2), np.float32))


def test_streamed_texture_per_frame():
    frames = export_frames(StreamedTexture(), frames=4)
    reds = frames[:, 0, 0, 0]
    np.testing.assert_array_equal(reds, [255, 0, 255, 0])


def test_ssaa_renders_supersampled():
    scene = Solid()
    frames = export_frames(scene, frames=1, ssaa=2.0)
    expected = np.floor(np.array([0.2, 0.4, 0.6]) * 255 + 0.5)
    np.testing.assert_array_equal(frames[0, 5, 5], expected)


def test_screenshot():
    scene = Solid()
    scene.main(width=32, height=16, fps=10, time=0.1, output=None, freewheel=True)
    shot = scene.screenshot()
    assert shot.shape == (16, 32, 3)


def test_custom_uniform_pipeline():
    class WithUniform(ShaderScene):
        def build(self):
            self.shader.fragment = lambda sf: ops.vec4(
                jnp.broadcast_to(sf.iBrightness, sf.astuv.shape[:-1]), 0, 0, 1)

        def pipeline(self):
            yield from ShaderScene.pipeline(self)
            yield Uniform("float", "iBrightness", 0.5)

    frames = export_frames(WithUniform(), frames=1)
    assert frames[0, 0, 0, 0] == 128


def test_realtime_loop_frame_limited():
    """The scheduler-paced realtime path runs and terminates via frame_limit."""
    scene = Solid()
    scene.frame_limit = 3
    scene.main(width=32, height=16, fps=240, output=None, freewheel=False)
    assert scene.quit
    assert scene.frame >= 3


def test_cv2_mouse_events_update_state_and_relay():
    """The cv2 preview mouse callback feeds the message bus: position moves
    iMouse, left-drag relays Mouse.Drag (camera nav), buttons track state."""
    import cv2
    from shaderflow_tpu.scene import ShaderScene

    scene = ShaderScene()
    scene.initialize()
    scene.resize(width=100, height=50)
    scene._preview = cv2

    received = []
    original = scene.relay
    scene.relay = lambda message: (received.append(message), original(message))

    # Move to the center-right edge: u ~ +aspect, v ~ 0
    scene._cv2_mouse_event(cv2.EVENT_MOUSEMOVE, 99, 25, 0)
    assert scene.mouse_inside
    assert type(received[-1]).__name__ == "Position"
    u, v = scene.mouse_gluv
    assert u > 1.9 and abs(v) < 0.05  # aspect = 2.0

    # Press left, drag -> Drag message and button state
    scene._cv2_mouse_event(cv2.EVENT_LBUTTONDOWN, 99, 25, 0)
    assert scene.mouse_buttons[1]
    scene._cv2_mouse_event(cv2.EVENT_MOUSEMOVE, 50, 25, 0)
    assert type(received[-1]).__name__ == "Drag"
    scene._cv2_mouse_event(cv2.EVENT_LBUTTONUP, 99, 25, 0)
    assert not scene.mouse_buttons[1]

    # Scroll wheel relays Scroll with signed dv
    wheel = getattr(cv2, "EVENT_MOUSEWHEEL", None)
    if wheel is not None:
        scene._cv2_mouse_event(wheel, 50, 25, 1 << 16)
        assert type(received[-1]).__name__ == "Scroll"
        assert received[-1].dv > 0


def test_fkey_bindings(tmp_path, monkeypatch):
    """F1 toggles exclusive mode, F2 saves a screenshot PNG, F11 flips the
    fullscreen flag (reference scene.py:666-682 keybinds)."""
    import shaderflow_tpu
    from shaderflow_tpu.keyboard import ShaderKeyboard
    from shaderflow_tpu.message import ShaderMessage
    from shaderflow_tpu.scene import ShaderScene

    monkeypatch.setattr(shaderflow_tpu.directories, "user_data_path", tmp_path)
    scene = ShaderScene()
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)

    assert not scene.exclusive
    scene.relay(ShaderMessage.Keyboard.KeyDown(key=ShaderKeyboard.Keys.F1))
    assert scene.exclusive

    scene.relay(ShaderMessage.Keyboard.KeyDown(key=ShaderKeyboard.Keys.F2))
    shots = list((tmp_path / "screenshots").glob("*.png"))
    assert len(shots) == 1

    scene.relay(ShaderMessage.Keyboard.KeyDown(key=ShaderKeyboard.Keys.F11))
    assert scene.fullscreen


def test_modifier_drags(monkeypatch):
    """Ctrl+drag rolls the camera, Alt+drag scrubs time, plain drag relays
    Mouse.Drag (reference scene.py:815-841)."""
    import numpy as np
    from shaderflow_tpu.keyboard import ShaderKeyboard
    from shaderflow_tpu.scene import ShaderScene

    scene = ShaderScene()
    scene.initialize()
    scene.resize(width=100, height=50)
    scene.time = 5.0

    # Alt+drag: time travel, no Drag relay
    scene.keyboard._pressed[ShaderKeyboard.Keys.LEFT_ALT] = True
    scene._handle_drag(x=50, y=25, dx=0, dy=25, u=0, v=0, du=0, dv=-1.0)
    assert scene.time < 5.0
    scene.keyboard._pressed[ShaderKeyboard.Keys.LEFT_ALT] = False

    # Ctrl+drag: camera rolls around forward (rotation quaternion changes)
    before = np.array(scene.camera.rotation.target, copy=True)
    scene.keyboard._pressed[ShaderKeyboard.Keys.LEFT_CTRL] = True
    scene._handle_drag(x=80, y=25, dx=0, dy=10, u=0.6, v=0, du=0, dv=-0.4)
    assert not np.allclose(np.array(scene.camera.rotation.target), before)
    scene.keyboard._pressed[ShaderKeyboard.Keys.LEFT_CTRL] = False

    # Plain drag relays
    seen = []
    original = scene.relay
    scene.relay = lambda m: (seen.append(m), original(m))
    scene._handle_drag(x=50, y=25, dx=5, dy=0, u=0.1, v=0, du=0.1, dv=0)
    assert type(seen[-1]).__name__ == "Drag"


def test_per_key_uniform_export_opt_in():
    """Per-key uniforms (reference keyboard.py:38-41 ships this disabled;
    here export_keys=True honors it — packed uniforms make it cheap)."""
    from shaderflow_tpu.message import ShaderMessage
    from shaderflow_tpu.scene import ShaderScene

    scene = ShaderScene()
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)
    names = lambda: {v.name: v.value for v in scene.keyboard.pipeline()}
    assert names() == {}  # parity: off by default

    scene.keyboard.export_keys = True
    exported = names()
    assert exported["iKeyW"] is False
    assert "iKeySpace" in exported and "iKeyLeftShift" in exported

    scene.relay(ShaderMessage.Keyboard.KeyDown(key=scene.keyboard.Keys.W))
    assert names()["iKeyW"] is True
    scene.relay(ShaderMessage.Keyboard.KeyUp(key=scene.keyboard.Keys.W))
    assert names()["iKeyW"] is False
