"""Realtime input fidelity: KeyDown/KeyUp (with modifiers) through the
preview path (VERDICT r2 #7).

The reference's glfw window delivers press AND release events plus modifier
state (/root/reference/shaderflow/camera.py:240-278 held-key WASD + Shift);
the preview loop here sources the same transitions from the X11 keymap
poller, or synthesizes releases from cv2.waitKey autorepeat when no X
server exists (shaderflow_tpu/io/x11keys.py). These tests drive
scene._poll_input() directly — the exact entry the realtime frame calls.
"""

import numpy as np

from shaderflow_tpu.io.x11keys import AutoReleaseKeys, X11Keymap
from shaderflow_tpu.keyboard import ShaderKeyboard
from shaderflow_tpu.message import ShaderMessage
from shaderflow_tpu.scene import ShaderScene

Keys = ShaderKeyboard.Keys
NOKEY = 255  # cv2.waitKey(1) & 0xFF with an empty queue


def make_scene():
    scene = ShaderScene()
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)
    return scene


def test_waitkey_fallback_press_hold_release():
    """waitKey path: lowercase code normalizes to the key table, repeats do
    not re-fire KeyDown, quiet repeat train synthesizes KeyUp."""
    scene = make_scene()
    received = []
    original = scene.relay
    scene.relay = lambda message: (received.append(message), original(message))

    scene._poll_input(ord("w"), now=0.0)
    assert scene.keyboard(Keys.W)
    downs = [m for m in received if isinstance(m, ShaderMessage.Keyboard.KeyDown)]
    assert [m.key for m in downs] == [Keys.W]

    # Autorepeat train: held, no duplicate KeyDown
    scene._poll_input(ord("w"), now=0.1)
    scene._poll_input(ord("w"), now=0.2)
    downs = [m for m in received if isinstance(m, ShaderMessage.Keyboard.KeyDown)]
    assert [m.key for m in downs] == [Keys.W]
    assert scene.keyboard(Keys.W)

    # Train goes quiet -> synthesized KeyUp
    scene._poll_input(NOKEY, now=1.0)
    ups = [m for m in received if isinstance(m, ShaderMessage.Keyboard.KeyUp)]
    assert [m.key for m in ups] == [Keys.W]
    assert not scene.keyboard(Keys.W)


def test_waitkey_escape_quits():
    scene = make_scene()
    scene._poll_input(27, now=0.0)
    assert scene.quit


def test_x11_keymap_path_delivers_transitions_and_modifiers():
    """With an active keymap source, exact KeyDown/KeyUp (incl. Shift) flow
    through the same relay the camera reads."""
    scene = make_scene()

    class FakeKeymap:
        active = True

        def __init__(self):
            self.frames = [([Keys.W, Keys.LEFT_SHIFT], []),
                           ([], [Keys.W]),
                           ([], [Keys.LEFT_SHIFT])]

        def poll(self):
            return self.frames.pop(0)

    scene._keymap = FakeKeymap()
    scene._poll_input(NOKEY)
    assert scene.keyboard(Keys.W) and scene.keyboard(Keys.LEFT_SHIFT)
    scene._poll_input(NOKEY)
    assert not scene.keyboard(Keys.W) and scene.keyboard(Keys.LEFT_SHIFT)
    scene._poll_input(NOKEY)
    assert not scene.keyboard(Keys.LEFT_SHIFT)


def test_held_keys_drive_camera_until_release():
    """Held W moves the camera each update; KeyUp stops it; Shift (3D mode)
    adds downward motion — the reference's held-key navigation contract."""
    scene = make_scene()
    camera = scene.camera
    scene.dt = 1 / 60

    start = np.asarray(camera.position.target).copy()
    scene.relay(ShaderMessage.Keyboard.KeyDown(key=Keys.W))
    camera.update()
    moved = np.asarray(camera.position.target).copy()
    assert np.linalg.norm(moved - start) > 0

    scene.relay(ShaderMessage.Keyboard.KeyUp(key=Keys.W))
    camera.update()
    stopped = np.asarray(camera.position.target).copy()
    assert np.allclose(stopped, moved)


def test_shift_modifier_reaches_camera():
    """LEFT_SHIFT held (only expressible via the keymap source) feeds the
    camera's 3D descend binding."""
    from shaderflow_tpu.camera import CameraMode

    scene = make_scene()
    camera = scene.camera
    camera.mode = CameraMode.FreeCamera
    scene.dt = 1 / 60

    start = np.asarray(camera.position.target).copy()
    scene.relay(ShaderMessage.Keyboard.KeyDown(key=Keys.LEFT_SHIFT))
    camera.update()
    moved = np.asarray(camera.position.target)
    assert moved[1] < start[1]  # GlobalBasis.Down = -y


def test_x11_keymap_inactive_without_display(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    keymap = X11Keymap()
    assert not keymap.active
    assert keymap.poll() == ([], [])


def test_autorelease_is_per_key():
    auto = AutoReleaseKeys(linger=0.5)
    assert auto.feed(Keys.W, 0.0)
    assert auto.feed(Keys.A, 0.4)
    assert not auto.feed(Keys.A, 0.45)   # repeat, not a fresh press
    assert auto.poll(0.6) == [Keys.W]    # W quiet past linger; A still live
    assert list(auto.held()) == [Keys.A]
