"""PSNR parity vs the GL-exact NumPy oracle (tools/gl_oracle.py).

The BASELINE.json acceptance bar: engine output within PSNR >= 40 dB of the
OpenGL reference renderer. The oracle is an independent float32
transcription of the reference GLSL (see gl_oracle's docstring for the
file:line map); these tests render the graded configs through the real
engine pipeline and assert the bar with margin.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))
sys.path.insert(0, str(REPO / "examples"))
sys.path.insert(0, str(REPO / "tools"))

import gl_oracle


def engine_frames_and_uniforms(scene, frames, **kwargs):
    """Render `frames` frames through the engine; return (frames_u8,
    per-frame uniform dicts incl. statics)."""
    scene._setup_run(fps=10, time=frames / 10, freewheel=True, **kwargs)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(frames):
        scene.next(dt=scene.frametime)
    uniforms = []
    for snapshot in engine._frame_uniforms:
        merged = dict(engine._statics)
        merged.update(snapshot)
        uniforms.append(merged)
    out = np.asarray(engine.flush(frames))
    return out, uniforms


@pytest.mark.parametrize("ssaa,subsample", [(1.0, 1), (2.0, 2)])
def test_default_scene_psnr(ssaa, subsample):
    """Graded config 1: the default (welcome) shader, 512x288."""
    import demo

    scene = demo.Basic()
    width, height = 512, 288
    frames, uniforms = engine_frames_and_uniforms(
        scene, 3, width=width, height=height, ssaa=ssaa, subsample=subsample)

    for index, uniform in enumerate(uniforms):
        oracle = gl_oracle.render_scene(
            gl_oracle.default_fragment, uniform,
            *scene.render_resolution,
            width, height, subsample, scene.aspect_ratio)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_mandelbrot_psnr():
    """Graded config 3: Mandelbrot escape-time (Pallas kernel on TPU,
    XLA loop on CPU) vs the oracle's python escape loop."""
    import fractals

    scene = fractals.Mandelbrot()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 2, width=width, height=height, ssaa=2.0, subsample=2, quality=5)

    for index, uniform in enumerate(uniforms):
        merged = dict(uniform)
        merged.setdefault("iQuality", merged.get("iQualityS", 0.05))
        oracle = gl_oracle.render_scene(
            gl_oracle.mandelbrot_fragment, merged,
            *scene.render_resolution,
            width, height, 2, scene.aspect_ratio)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_raymarch_psnr():
    """Graded config 4: stacked-boxes ray march (camera rays + SDF union +
    GLSL break semantics on the step counter) vs the oracle's masked loop."""
    import demo

    scene = demo.RayMarch()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 2, width=width, height=height, ssaa=1.0, subsample=1)

    for index, uniform in enumerate(uniforms):
        oracle = gl_oracle.render_scene(
            gl_oracle.raymarch_fragment, uniform,
            *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_bars_psnr():
    """Graded config: audio bars. Nearest bin lookup with the bin axis along
    screen x; live-audio frames required (silence renders flat)."""
    import demo

    scene = demo.MusicBars()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 3, width=width, height=height, ssaa=1.0, subsample=1)
    assert any(float(np.asarray(u["iAudioVolume"])) > 0.1 for u in uniforms)
    spec_seq = np.asarray(scene.engine._sequences["iSpectrogram"])

    for index, uniform in enumerate(uniforms):
        k = int(np.asarray(uniform["iFrameIndex"]))
        textures = dict(
            spectrogram=spec_seq[min(k, len(spec_seq) - 1)][:, 0, :][::-1])
        oracle = gl_oracle.render_scene(
            lambda u, w, h, a: gl_oracle.bars_fragment(u, w, h, a, textures),
            uniform, *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_waveform_parity():
    """Oscilloscope bars. The fragment is three BINARY thresholds on a
    bilinearly-sampled wave value, so ULP differences between the engine's
    interpolation matmul and the oracle's two-tap lerp flip isolated
    single-row pixels at threshold edges (full 0.2 -> 1.0 amplitude) —
    PSNR punishes those flips out of proportion. The parity statement:
    >= 99.5% of pixels agree within 2 u8 steps (measured: 99.85%+, silent
    frame bit-exact)."""
    import demo

    scene = demo.Waveform()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 3, width=width, height=height, ssaa=1.0, subsample=1)
    wave_seq = np.asarray(scene.engine._sequences["iWaveform"])

    for index, uniform in enumerate(uniforms):
        k = int(np.asarray(uniform["iFrameIndex"]))
        textures = dict(waveform=wave_seq[min(k, len(wave_seq) - 1)][0])
        oracle = gl_oracle.render_scene(
            lambda u, w, h, a: gl_oracle.waveform_fragment(u, w, h, a, textures),
            uniform, *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        diff = np.abs(frames[index].astype(np.int16) - oracle.astype(np.int16))
        disagree = (diff.max(-1) > 2).mean()
        assert disagree < 0.005, f"frame {index}: {disagree:.2%} pixels differ"


@pytest.mark.parametrize("blur_level,bar,tail_bf16", [
    (4, 40.0, False),
    (1, 50.0, False),
    # SHADERFLOW_TAIL_BF16: the color chain in bfloat16 (the staged VPU/
    # VMEM lever, ROADMAP #1) must still clear the acceptance bar vs the
    # f32 GL oracle — this is the PSNR gate that decides whether the flag
    # may ever ship enabled.
    (1, 40.0, True),
])
def test_visualizer_psnr(blur_level, bar, tail_bf16, monkeypatch):
    """Graded config 2 (the flagship): the full visualizer vs a POINTWISE
    GLSL transcription (literal 80-tap blur loop, per-pixel bilinear
    background samples, nearest bar lookup) — the independent check on the
    engine's restructured formulation: blur-sample commutation, separable
    sampling, the batched MXU bar lookup, and the column-major rotate2d
    convention (music_uv = (-y, x), not the textbook (y, -x)).

    Frames with LIVE audio matter: volume drives the blur intensity, bar
    heights, and blink — a silent frame exercises almost none of it.
    blur_level=4 (the perf default) is the radial blur's pyramid
    approximation (~45 dB); level 1 is GLSL-exact modulo splat
    reconstruction (~54-56 dB, maxdiff ~20 at bar-bin edges)."""
    import demo

    monkeypatch.setenv("SHADERFLOW_VIZ_BLUR_LEVEL", str(blur_level))
    if tail_bf16:
        monkeypatch.setenv("SHADERFLOW_TAIL_BF16", "1")
    scene = demo.Visualizer()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 3, width=width, height=height, ssaa=1.0, subsample=1)
    assert any(float(np.asarray(u["iAudioVolume"])) > 0.1 for u in uniforms), \
        "test must cover a live-audio frame"
    engine = scene.engine
    # Engine texture matrices store row 0 = top; the oracle samples GL
    # row-0-bottom storage
    background = np.asarray(engine._static_tex["background"])[0, 0][::-1]
    spec_seq = np.asarray(engine._sequences["iSpectrogram"])   # (F, bins, 1, 2)
    wave_seq = np.asarray(engine._sequences["iWaveform"])      # (F, 1, points, 2)

    for index, uniform in enumerate(uniforms):
        k = int(np.asarray(uniform["iFrameIndex"]))
        textures = dict(
            background=background,
            spectrogram=spec_seq[min(k, len(spec_seq) - 1)][:, 0, :][::-1],
            waveform=wave_seq[min(k, len(wave_seq) - 1)][0],
        )
        oracle = gl_oracle.render_scene(
            lambda u, w, h, a: gl_oracle.visualizer_fragment(
                u, w, h, a, textures),
            uniform, *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= bar, f"frame {index}: PSNR {value:.1f} dB < {bar}"


def test_tetration_parity():
    """Bonus fractal: complex tetration. Pins the GLSL-exact semantics —
    binary k from INTEGER division (tetration.frag:48), break-after-update
    Z, cycles-as-radians hue quirk.

    PSNR is the wrong metric here: k is BINARY and the orbit is chaotic, so
    single-ULP differences between XLA's and libm's pow/exp/log flip
    escape-boundary pixels to full amplitude (a real GPU running the GLSL
    would differ from both at a similar rate). The parity statement is:
    >= 99% of pixels agree exactly, and the flips are confined to the
    escape boundary (measured: 99.4% agreement, 344/349 flips on the
    1px-dilated boundary at 320x180)."""
    import fractals

    scene = fractals.Tetration()
    width, height = 320, 180
    frames, uniforms = engine_frames_and_uniforms(
        scene, 2, width=width, height=height, ssaa=1.0, subsample=1)

    for index, uniform in enumerate(uniforms):
        oracle = gl_oracle.render_scene(
            gl_oracle.tetration_fragment, uniform,
            *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        ours = frames[index].astype(np.int16)
        ref = oracle.astype(np.int16)
        disagree = np.abs(ours - ref).max(-1) > 1
        assert (1 - disagree.mean()) >= 0.99, (
            f"frame {index}: {disagree.mean():.2%} of pixels differ")

        # Disagreements must hug the oracle's own escape boundary (2px)
        k = (ref[..., 0] > 127).astype(np.int16)
        pad = np.pad(k, 2, mode="edge")
        stacked = np.stack([pad[dy:dy + height, dx:dx + width]
                            for dy in range(5) for dx in range(5)])
        boundary = stacked.min(0) != stacked.max(0)
        stray = (disagree & ~boundary).sum()
        assert stray <= disagree.sum() * 0.05 + 3, (
            f"frame {index}: {stray} flips far from the escape boundary")


def test_life_temporal_parity():
    """Conway's Life vs an independent NumPy transcription of BOTH shaders
    AND the temporal ring mechanics (life/simulation.glsl + visuals.glsl +
    the reference's render-then-roll order): pins the engine's scan-carry
    ring semantics — write to slot 0, roll so slot 1 is newest, later
    programs see the ROLLED matrix (visuals reads slots 0-4 of which slot 0
    is the recycled oldest, exactly like the reference's live GL bindings) —
    plus texelFetch's zero border and the iFrame % iLifePeriod hold gate."""
    import demo

    scene = demo.Life()
    width, height = 192, 108
    n_frames = 15                                    # covers 3 sim periods
    frames, uniforms = engine_frames_and_uniforms(
        scene, n_frames, width=width, height=height, ssaa=1.0, subsample=1)

    # --- oracle: replay the ring in GL space (row 0 = bottom)
    sim_h, sim_w = 108, 192
    period = scene.life_period
    seed = np.random.default_rng(0).integers(0, 2, (sim_h, sim_w)).astype(np.float32)
    ring = np.zeros((10, sim_h, sim_w), np.float32)
    # setup wrote the seed into temporal slot 1 (texture.write(..., temporal=1));
    # write() flips to GL storage, so in GL space (row 0 = bottom, this
    # oracle's convention) the content IS the raw array
    ring[1] = seed

    def sim_step(prev):
        padded = np.pad(prev, 1)                     # texelFetch zero border
        near = sum(padded[1 + dy:1 + dy + sim_h, 1 + dx:1 + dx + sim_w] > 0.5
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)) - (prev > 0.5)
        current = prev > 0.5
        alive = np.where(current, (near == 2) | (near == 3), near == 3)
        return alive.astype(np.float32)

    colors = [np.array(c, np.float32) for c in gl_oracle.MAGMA]

    def visuals(uniform, ring):
        def fragment(u, w, h, a):
            co = gl_oracle.coords(w, h, a)
            cam = gl_oracle.get_camera(u, co)
            uv = (cam["gluv"] + 1) / 2               # gluv2stuv of camera gluv
            tex_aspect = np.float32(sim_h / sim_w)
            su = ((uv[..., 0] * 2 - 1) * tex_aspect + 1) / 2
            sv = uv[..., 1]
            ix = np.clip(np.floor(su * sim_w).astype(np.int32), 0, sim_w - 1)
            iy = np.clip(np.floor(sv * sim_h).astype(np.int32), 0, sim_h - 1)
            exponent = 1.3
            area = 1 / (exponent + 1)
            life = ring[0][iy, ix].astype(np.float32)
            for slot, factor in zip(range(1, 5), (0.8, 0.6, 0.4, 0.2)):
                life = life + ring[slot][iy, ix] * np.float32(factor ** exponent)
            life = (life / np.float32(5 * area)).astype(np.float32)
            rgb = gl_oracle.palette(life, *colors)
            return np.where(cam["out_of_bounds"][..., None], colors[0], rgb)
        return gl_oracle.render_scene(
            fragment, uniform, *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)

    for index, uniform in enumerate(uniforms):
        frame_i = int(np.asarray(uniform["iFrame"]))
        if frame_i % period != 0:
            out = ring[1].copy()                     # hold: previous frame
        else:
            out = sim_step(ring[1])
        ring[0] = out
        ring = np.roll(ring, 1, axis=0)              # slot 1 = newest
        oracle = visuals(uniform, ring)
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_motionblur_temporal_parity():
    """MotionBlur vs a NumPy replay of its MAIN-program temporal ring —
    the path Life does not cover: the displayed program itself carries
    temporal state (layers=2, temporal=10), so this pins multipass layer
    progression (layer 1 reads this frame's layer 0 at slot 0), the roll,
    and the final pass reading slot 1 (the newest content after roll).
    The camera teleports each frame so temporal mixing is observable."""
    import demo

    scene = demo.MotionBlur()
    width, height = 160, 90
    n_frames = 12
    scene._setup_run(width=width, height=height, fps=10,
                     time=n_frames / 10, freewheel=True, ssaa=1.0, subsample=1)
    engine = scene.engine
    engine.begin_batch()
    for i in range(n_frames):
        p = np.array([0.05 * i, 0.04 * np.sin(i * 0.9), 0.0], np.float32)
        scene.camera.position.value = p
        scene.camera.position.target = p
        scene.next(dt=scene.frametime)
    uniforms = []
    for snapshot in engine._frame_uniforms:
        merged = dict(engine._statics)
        merged.update(snapshot)
        uniforms.append(merged)
    frames = np.asarray(engine.flush(n_frames))

    background = np.asarray(engine._static_tex["background"])[0, 0][::-1]
    tex_aspect = np.float32(background.shape[0] / background.shape[1])
    temporal = 10
    ring = np.zeros((temporal, 2, height, width, 3), np.float32)

    def sstep01(x):
        t = np.clip(x, 0, 1).astype(np.float32)
        return (t * t * (3 - 2 * t)).astype(np.float32)

    for index, uniform in enumerate(uniforms):
        def fragment(u, w, h, a, ring=ring):
            co = gl_oracle.coords(w, h, a)
            cam = gl_oracle.get_camera(u, co)
            st = ((cam["gluv"] + 1) / 2).astype(np.float32)
            su = ((st[..., 0] * 2 - 1) * tex_aspect + 1) / 2
            layer0 = gl_oracle._sample_bilinear(
                background, su.astype(np.float32), st[..., 1], repeat=True)[..., :3]
            ring[0, 0] = layer0                  # slot 0 = current frame
            color = np.zeros_like(layer0)
            for i in range(temporal):
                factor = sstep01(1.0 - i / temporal)
                color = color + ring[i, 0] * factor
            ring[0, 1] = 2 * color / temporal
            return ring[0, 1]
        oracle = gl_oracle.render_scene(
            fragment, uniform, *scene.render_resolution,
            width, height, 1, scene.aspect_ratio)
        ring[:] = np.roll(ring, 1, axis=0)       # slot 1 = newest
        value = gl_oracle.psnr(frames[index], oracle)
        assert value >= 40.0, f"frame {index}: PSNR {value:.1f} dB < 40"


def test_oracle_final_pass_matches_engine_downsample():
    """The oracle's final.glsl tap loop and the engine's fused/pooled
    downsample agree on synthetic data (exact-pooling regime)."""
    from shaderflow_tpu.ops.downsample import final_pass as engine_final

    rng = np.random.default_rng(3)
    render = rng.random((72, 128, 3), np.float32)
    ours = np.asarray(engine_final(render, 36, 64, 2))
    # Oracle renders row-0-bottom; feed it flipped input, flip its output
    oracle = gl_oracle.final_pass(render[::-1], 64, 36, 2)[::-1]
    diff = np.abs(ours.astype(np.int16) - oracle.astype(np.int16))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02
