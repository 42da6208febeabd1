"""SDL window backend (io/sdlwindow.py): the reference's glfw event surface
over pygame/SDL2 — real KeyDown/KeyUp, unicode, mouse, wheel, resize, file
drop, close — driven headlessly through SDL's dummy video driver, whose
event queue is the REAL one (pygame.event.post injects genuine events).

Reference parity: /root/reference/shaderflow/scene.py:139-153 (glfw window)
and :708-841 (event callbacks -> message relays).
"""

import os

import numpy as np
import pytest

os.environ.setdefault("SHADERFLOW_SDL_VIDEODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from shaderflow_tpu.keyboard import ShaderKeyboard
from shaderflow_tpu.message import ShaderMessage
from shaderflow_tpu.scene import ShaderScene, WindowBackend

Keys = ShaderKeyboard.Keys


def test_event_translation_roundtrip():
    from shaderflow_tpu.io.sdlwindow import SDLWindow
    window = SDLWindow("t", 64, 32)
    window.show(np.zeros((32, 64, 3), np.uint8))
    post = pygame.event.post
    post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_w, mod=0, unicode="w"))
    post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_LSHIFT, mod=0, unicode=""))
    post(pygame.event.Event(pygame.KEYUP, key=pygame.K_w, mod=0))
    post(pygame.event.Event(pygame.MOUSEMOTION, pos=(10, 11), rel=(2, 3),
                            buttons=(1, 0, 0)))
    post(pygame.event.Event(pygame.MOUSEBUTTONDOWN, button=3, pos=(5, 6)))
    post(pygame.event.Event(pygame.MOUSEWHEEL, y=-2, x=0))
    post(pygame.event.Event(pygame.DROPFILE, file="/tmp/bg.png"))
    post(pygame.event.Event(pygame.QUIT))
    events = window.poll()
    window.close()
    assert ("keydown", Keys.W) in events
    assert ("unicode", "w") in events
    assert ("keydown", Keys.LEFT_SHIFT) in events       # modifiers arrive
    assert ("keyup", Keys.W) in events                  # real releases
    assert ("mousemove", 10, 11, 2, 3, {1}) in events   # held-button drag
    assert ("mousedown", 2, 5, 6) in events             # SDL right=3 -> 2
    assert ("wheel", -1) in events
    assert ("drop", "/tmp/bg.png") in events
    assert ("close",) in events


def _scene():
    scene = ShaderScene(backend=WindowBackend.Headless)
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)
    return scene


def test_dispatch_key_and_quit_semantics():
    scene = _scene()
    scene._dispatch_window_events([("keydown", Keys.W)])
    assert scene.keyboard(Keys.W)
    scene._dispatch_window_events([("keyup", Keys.W)])
    assert not scene.keyboard(Keys.W)
    scene._dispatch_window_events([("keydown", Keys.TAB)])
    assert scene.render_ui
    assert not scene.quit
    scene._dispatch_window_events([("close",)])
    assert scene.quit


def test_dispatch_mouse_drag_and_scroll_reach_camera():
    scene = _scene()
    zoom_before = float(np.asarray(scene.camera.zoom.value))
    scene._dispatch_window_events([("wheel", 1)])
    # Camera2D scroll zooms (reference camera.py scroll handler)
    scene.camera.update()
    assert float(np.asarray(scene.camera.zoom.target)) != zoom_before

    received = []
    original = scene.relay
    scene.relay = lambda m: (received.append(m), original(m))
    scene._dispatch_window_events([
        ("mousedown", 1, 4, 4),
        ("mousemove", 6, 5, 2, 1, {1}),
        ("mouseup", 1, 6, 5),
        ("mousemove", 7, 5, 1, 0, set()),
    ])
    kinds = [type(m).__name__ for m in received]
    assert "Press" in kinds and "Release" in kinds and "Position" in kinds
    # Drag with button held goes through the drag intercept -> Drag message
    assert any(isinstance(m, ShaderMessage.Mouse.Drag) for m in received)


def test_dispatch_resize_and_filedrop():
    scene = _scene()
    dropped = []
    scene.handle_messages = None  # (marker only)

    class Catcher:
        def handle(self, message):
            if isinstance(message, ShaderMessage.Window.FileDrop):
                dropped.append(message.first)

    catcher = Catcher()
    scene.modules.append(catcher)
    scene._dispatch_window_events([("resize", 32, 16), ("drop", "/tmp/a.png")])
    scene.modules.remove(catcher)
    assert scene.resolution == (32, 16)
    assert dropped == ["/tmp/a.png"]


def test_realtime_loop_through_sdl_window(monkeypatch):
    """End-to-end: the realtime loop opens the SDL window (dummy driver),
    blits frames, drains the real event queue, and a posted QUIT closes the
    session — the full windowed-preview path with zero mocks."""
    monkeypatch.setenv("SHADERFLOW_PREVIEW", "sdl")
    scene = ShaderScene(backend=WindowBackend.Preview)
    scene.frame_limit = 6
    # Pre-post: the queue persists across set_mode, so these arrive at the
    # first poll() — TAB exercises the HUD draw path too
    pygame.display.init()
    pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_TAB,
                                         mod=0, unicode="\t"))
    scene.main(width=32, height=16, fps=60)
    assert scene.render_ui
    assert scene.frame >= 1
    assert getattr(scene, "_window", None) is not None


def test_realtime_resize_event_retraces_and_survives(monkeypatch):
    """A window resize mid-run must re-fit the resolution, rebuild textures,
    and keep rendering (engine retrace) — the reference's glfw resize
    callback path (scene.py:708-841 -> resize)."""
    monkeypatch.setenv("SHADERFLOW_PREVIEW", "sdl")
    scene = ShaderScene(backend=WindowBackend.Preview)
    scene.frame_limit = 8
    pygame.display.init()
    pygame.event.post(pygame.event.Event(pygame.VIDEORESIZE, w=48, h=24))
    scene.main(width=32, height=16, fps=60)
    assert scene.resolution == (48, 24)
    assert scene.frame >= 1
