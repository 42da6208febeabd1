"""Interactive HUD v2: editable per-module panel fields (VERDICT r2 #10).

The reference's imgui overlay exposes per-module panels with editable state
(/root/reference/shaderflow/scene.py:856-932, module.py:156-166 — e.g.
DynamicNumber's f/zeta/r drag-floats). Here modules declare UIField entries
via ui_fields(); the HUD edits them with , / . (select) and - / + (nudge,
Shift x10 / Ctrl x0.1) — driven entirely through the Keyboard message bus,
so the same path works from the X11 poller or the waitKey fallback.
"""

import numpy as np

from shaderflow_tpu.keyboard import ShaderKeyboard
from shaderflow_tpu.message import ShaderMessage
from shaderflow_tpu.scene import ShaderScene

Keys = ShaderKeyboard.Keys


def key(scene, code):
    scene.relay(ShaderMessage.Keyboard.KeyDown(key=code))


def select_module(scene, module) -> None:
    others = [m for m in scene.modules if m is not scene]
    scene._ui_index = others.index(module)
    scene._ui_field_index = 0


def make_scene():
    scene = ShaderScene()
    scene._setup_run(width=16, height=8, fps=10, time=0.1, freewheel=True)
    return scene


def test_dynamics_f_zeta_r_editable():
    """Camera dynamics f/zeta/r — the top panel VERDICT asks for."""
    scene = make_scene()
    dynamics = scene.camera.position  # a ShaderDynamics module
    select_module(scene, dynamics)

    f0 = dynamics.frequency
    key(scene, Keys.PLUS)
    assert np.isclose(dynamics.frequency, f0 + 0.1)
    key(scene, Keys.MINUS)
    key(scene, Keys.MINUS)
    assert np.isclose(dynamics.frequency, f0 - 0.1)

    # '.' selects zeta, then response
    key(scene, Keys.PERIOD)
    z0 = dynamics.zeta
    key(scene, Keys.EQUAL)  # unshifted '+' key
    assert np.isclose(dynamics.zeta, z0 + 0.1)
    key(scene, Keys.PERIOD)
    r0 = dynamics.response
    key(scene, Keys.MINUS)
    assert np.isclose(dynamics.response, r0 - 0.1)


def test_modifier_scales_step():
    scene = make_scene()
    dynamics = scene.camera.position
    select_module(scene, dynamics)

    f0 = dynamics.frequency
    scene.keyboard._pressed[Keys.LEFT_SHIFT] = True
    key(scene, Keys.PLUS)
    assert np.isclose(dynamics.frequency, f0 + 1.0)  # x10

    scene.keyboard._pressed[Keys.LEFT_SHIFT] = False
    scene.keyboard._pressed[Keys.LEFT_CTRL] = True
    key(scene, Keys.PLUS)
    assert np.isclose(dynamics.frequency, f0 + 1.0 + 0.01)  # x0.1


def test_field_bounds_clamp():
    """frequency has a positive floor — hammering '-' cannot freeze the
    second-order system."""
    scene = make_scene()
    dynamics = scene.camera.position
    select_module(scene, dynamics)
    scene.keyboard._pressed[Keys.LEFT_SHIFT] = True
    for _ in range(10):
        key(scene, Keys.MINUS)
    assert dynamics.frequency >= 0.01


def test_spectrogram_range_editable():
    """Spectrogram min/max Hz — the second panel VERDICT asks for. The band
    matrix rebuilds from the (min, max, bins) key on the next update."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent / "examples" / "basic"))
    import demo

    scene = demo.Visualizer()
    scene._setup_run(width=32, height=16, fps=10, time=0.1, freewheel=True)
    spectrogram = next(m for m in scene.modules
                       if type(m).__name__ == "ShaderSpectrogram")
    select_module(scene, spectrogram)

    min0 = spectrogram.minimum_frequency
    key(scene, Keys.PLUS)
    assert np.isclose(spectrogram.minimum_frequency, min0 + 10.0)

    key(scene, Keys.PERIOD)
    max0 = spectrogram.maximum_frequency
    key(scene, Keys.MINUS)
    assert np.isclose(spectrogram.maximum_frequency, max0 - 500.0)


def test_camera_zoom_field():
    scene = make_scene()
    select_module(scene, scene.camera)
    zoom0 = float(scene.camera.zoom.target)
    key(scene, Keys.PLUS)
    assert np.isclose(float(scene.camera.zoom.target), zoom0 + 0.05)


def test_hud_renders_fields_with_marker():
    import cv2  # noqa: F401  (HUD drawing needs cv2; headless-safe)

    scene = make_scene()
    select_module(scene, scene.camera.position)
    scene._preview = cv2
    frame = np.zeros((240, 320, 3), np.uint8)
    out = scene._draw_hud(frame.copy())
    assert out.std() > 0  # panel text drew something


def test_bracket_cycle_resets_field_selection():
    scene = make_scene()
    select_module(scene, scene.camera.position)
    key(scene, Keys.PERIOD)
    assert scene._ui_field_index == 1
    key(scene, Keys.BRACKET_RIGHT)
    assert scene._ui_field_index == 0


def draw_hud(scene):
    import numpy as np
    frame = np.zeros((scene.resolution[1], scene.resolution[0], 3), np.uint8)
    scene.render_ui = True
    scene._draw_hud(frame)
    return scene._hud_rows


def row_y(scene, row):
    return scene._HUD_ROW0 + scene._HUD_ROWH * row + 2


def test_hud_mouse_click_selects_module_and_field():
    """HUD v3 mouse interaction (the imgui-class surface): clicking a module
    row opens its panel, clicking a field row selects the field, and panel
    clicks never leak to the scene (imgui want_capture_mouse semantics)."""
    scene = make_scene()
    scene.resize(width=640, height=480)
    rows = draw_hud(scene)
    module_rows = [i for i, a in enumerate(rows) if a and a[0] == "module"]
    assert len(module_rows) >= 3  # frametimer/keyboard/camera + dynamics

    # Click the LAST module row -> selection moves there
    target = module_rows[-1]
    assert scene._hud_mouse("press", 10, row_y(scene, target))
    assert scene._ui_index == rows[target][1]

    # Redraw: the selected module's panel expands with field rows
    rows = draw_hud(scene)
    field_rows = [i for i, a in enumerate(rows) if a and a[0] == "field"]
    if field_rows:  # camera dynamics expose f/zeta/r fields
        assert scene._hud_mouse("press", 10, row_y(scene, field_rows[-1]))
        assert scene._ui_field_index == rows[field_rows[-1]][1]

    # Clicks on plain panel text are consumed, not relayed
    assert scene._hud_mouse("press", 10, row_y(scene, 0))
    # Clicks outside the panel are NOT consumed
    assert not scene._hud_mouse("press", scene._HUD_WIDTH + 10, 40)


def test_hud_mouse_drag_and_wheel_edit_value():
    scene = make_scene()
    scene.resize(width=640, height=480)
    dynamics = scene.camera.position
    select_module(scene, dynamics)
    rows = draw_hud(scene)
    field_rows = [i for i, a in enumerate(rows) if a and a[0] == "field"]
    assert field_rows, "selected dynamics module must expose fields"

    f0 = dynamics.frequency
    y = row_y(scene, field_rows[0])
    assert scene._hud_mouse("drag", 10, y, dx=5)       # drag right: +step
    assert np.isclose(dynamics.frequency, f0 + 0.1)
    assert scene._hud_mouse("wheel", 10, y, dy=-1)     # wheel down: -step
    assert np.isclose(dynamics.frequency, f0)


def test_hud_toggle_off_consumes_nothing():
    scene = make_scene()
    scene.resize(width=640, height=480)
    draw_hud(scene)
    scene.render_ui = False
    assert not scene._hud_mouse("press", 10, 40)


def test_scene_panel_edits_speed_quality_ssaa():
    """The scene's own HUD panel (last in the list — the reference imgui
    main menu's sliders, scene.py:856-932) edits speed/quality/ssaa."""
    scene = make_scene()
    panels = scene._ui_panels()
    assert panels[-1] is scene
    scene._ui_index = len(panels) - 1
    scene._ui_field_index = 0

    key(scene, Keys.PLUS)                    # speed +0.1
    assert np.isclose(scene.speed, 1.1)
    key(scene, Keys.PERIOD)                  # -> quality
    key(scene, Keys.PLUS)
    assert scene.quality == 55.0
    key(scene, Keys.PERIOD)                  # -> ssaa (resize path)
    before = scene.render_resolution
    key(scene, Keys.PLUS)                    # ssaa 1.0 -> 1.25
    assert scene.ssaa == 1.25
    assert scene.render_resolution != before


def test_hud_sparkline_plots_render():
    """ui_plots() sparkline strips rasterize into the HUD (imgui PlotLines
    equivalent — VERDICT r4 missing #3's 'plots beyond the frametimer')."""
    scene = make_scene()
    # frametimer plot: feed it real deltas
    for _ in range(12):
        scene.next(dt=0.1)
    timer = scene.frametimer
    assert timer.ui_plots(), "frametimer declares no plot"
    select_module(scene, timer)
    frame = np.full((480, 640, 3), 200, np.uint8)
    out = scene._draw_hud(frame.copy())
    # The strip region is darkened twice and carries a white polyline
    assert (out == 255).any(), "no polyline pixels drawn"
    assert (out < 64).any(), "no plot bed darkening"

    # dynamics module plots its value history
    dynamics = scene.camera.position
    for _ in range(8):
        scene.next(dt=0.1)
    assert dynamics.ui_plots(), "dynamics declares no history plot"
    select_module(scene, dynamics)
    out2 = scene._draw_hud(frame.copy())
    assert (out2 == 255).any()
