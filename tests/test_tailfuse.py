"""Fused tail stage (ops/tailfuse.py): the Pallas kernel must match the
reference (full-resolution jnp) evaluation bit-for-bit at the u8 level."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shaderflow_tpu.ops import tailfuse
from shaderflow_tpu.ops.downsample import final_pass


def _make_spec(render_h, render_w):
    rng = np.random.default_rng(7)
    color = jnp.asarray(rng.random((render_h, render_w, 3), np.float32))
    gain = jnp.asarray(rng.random((render_h, render_w), np.float32))
    rowv = jnp.asarray(np.linspace(0.0, 1.0, render_h, dtype=np.float32))
    colv = jnp.asarray(np.linspace(-1.0, 1.0, render_w, dtype=np.float32))
    vol = jnp.float32(0.37)

    def tail(tp):
        r, g, b = tp.vec3("color")
        k = tp.plane("gain")
        y = tp.row("rowv")
        x = tp.col("colv")
        v = tp.scalar("vol")
        vig = tp.astuv_x * (1.0 - tp.astuv_y) + 0.5
        mask = (tp.gluv_x * tp.gluv_x + tp.gluv_y * tp.gluv_y) < 1.0
        r = jnp.where(mask, r * k + v, r) * vig
        g = jnp.where(mask, g + y, g * 0.5) * vig
        b = (b + x * 0.1) * (1.0 + v) * vig
        return r, g, b

    return tailfuse.make_spec(
        tail, render_h, render_w,
        color=color, gain=gain,
        rowv=tailfuse.Row(rowv), colv=tailfuse.Col(colv), vol=vol)


@pytest.mark.parametrize("subsample", [1, 2])
def test_fused_matches_reference(subsample):
    out_h, out_w = 48, 128
    render_h, render_w = out_h * subsample, out_w * subsample
    spec = _make_spec(render_h, render_w)
    aspect = out_w / out_h

    rgb = tailfuse.eval_reference(spec, render_h, render_w, aspect)
    reference = np.asarray(final_pass(rgb, out_h, out_w, subsample))

    fused = np.asarray(tailfuse.fused_tail_final(
        spec, render_h, render_w, out_h, out_w, subsample, aspect,
        interpret=True))

    assert fused.shape == (out_h, out_w, 3)
    assert fused.dtype == np.uint8
    # Identical math, possibly different summation order in the pooling ->
    # at most one quantization step apart, and only on exact ties
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_uneven_tiles():
    """Output size not divisible by the tile: edge blocks must mask correctly."""
    out_h, out_w = 30, 100  # < default tile, non-multiples of 8/128
    s = 2
    render_h, render_w = out_h * s, out_w * s
    spec = _make_spec(render_h, render_w)
    rgb = tailfuse.eval_reference(spec, render_h, render_w, 1.0)
    reference = np.asarray(final_pass(rgb, out_h, out_w, s))
    fused = np.asarray(tailfuse.fused_tail_final(
        spec, render_h, render_w, out_h, out_w, s, 1.0, interpret=True))
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    assert diff.max() <= 1


def test_make_spec_classification():
    spec = _make_spec(16, 32)
    assert set(spec.planes) == {"color", "gain"}
    assert len(spec.planes["color"]) == 3
    assert set(spec.rows) == {"rowv"}
    assert set(spec.cols) == {"colv"}
    assert set(spec.scalars) == {"vol"}


def test_ambiguous_1d_rejected():
    with pytest.raises(ValueError, match="Ambiguous"):
        tailfuse.make_spec(lambda tp: None, 32, 32, x=jnp.zeros(32))


def test_run_tail_final_fallback_on_cpu():
    """On CPU (no TPU backend) run_tail_final must take the reference path."""
    out_h, out_w, s = 24, 64, 2
    spec = _make_spec(out_h * s, out_w * s)
    out = tailfuse.run_tail_final(spec, out_h * s, out_w * s, out_h, out_w, s, 1.0)
    rgb = tailfuse.eval_reference(spec, out_h * s, out_w * s, 1.0)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(final_pass(rgb, out_h, out_w, s)))


def test_visualizer_fused_interpret_matches_fallback(monkeypatch):
    """End-to-end: the real Visualizer scene through the FUSED kernel
    (interpret mode) vs the reference fallback — guards the engine's
    TailSpec plumbing and the kernel's operand/BlockSpec construction
    without TPU hardware."""
    import sys
    from pathlib import Path
    REPO = Path(__file__).parent.parent
    sys.path.insert(0, str(REPO / "examples" / "basic"))
    sys.path.insert(0, str(REPO / "examples"))
    import demo

    def render(fused):
        if fused:
            monkeypatch.setenv("SHADERFLOW_TAILFUSE_INTERPRET", "1")
        else:
            monkeypatch.delenv("SHADERFLOW_TAILFUSE_INTERPRET", raising=False)
        scene = demo.Visualizer()
        scene._setup_run(width=128, height=72, fps=10, time=0.2,
                         ssaa=2.0, freewheel=True)
        scene.engine.begin_batch()
        for _ in range(2):
            scene.next(dt=scene.frametime)
        return np.asarray(scene.engine.flush(2))

    fused = render(True)
    reference = render(False)
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02


@pytest.mark.parametrize("subsample", [1, 2])
def test_colsampled_windowed_matches_reference(subsample):
    """ColSampled inputs: the kernel's scalar-prefetch windowed column
    interpolation must match the dense reference materialization."""
    out_h, out_w = 64, 512
    render_h, render_w = out_h * subsample, out_w * subsample
    rng = np.random.default_rng(11)
    w_in = 640   # 5 * 128: no padding needed
    planes = tuple(jnp.asarray(rng.random((render_h, w_in), np.float32))
                   for _ in range(3))
    # Zoom-in map: ~0.2 texels per output pixel, interior positions
    u_line = jnp.asarray(np.linspace(0.2, 0.2 + 0.2 * render_w / w_in,
                                     render_w, dtype=np.float32))

    def tail(tp):
        r, g, b = tp.vec3("tex")
        return r, g * 0.5, b + 0.1

    spec = tailfuse.make_spec(
        tail, render_h, render_w,
        tex=tailfuse.ColSampled(planes, u_line, texels_per_px=0.25))
    assert "tex" in spec.colsampled

    rgb = tailfuse.eval_reference(spec, render_h, render_w, 1.0)
    reference = np.asarray(final_pass(rgb, out_h, out_w, subsample))
    fused = np.asarray(tailfuse.fused_tail_final(
        spec, render_h, render_w, out_h, out_w, subsample, 1.0,
        interpret=True))
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_colsampled_demotes_when_window_covers():
    """A texels-per-px bound so large the window spans the input must fall
    back to dense pre-sampling (still correct)."""
    out_h, out_w = 32, 128
    render_h, render_w = out_h, out_w
    rng = np.random.default_rng(3)
    planes = (jnp.asarray(rng.random((render_h, 256), np.float32)),)
    u_line = jnp.asarray(np.linspace(0.05, 0.95, render_w, dtype=np.float32))

    def tail(tp):
        (v,) = tp.vec("tex")
        return v, v, v

    spec = tailfuse.make_spec(
        tail, render_h, render_w,
        tex=tailfuse.ColSampled(planes, u_line, texels_per_px=3.0))
    rgb = tailfuse.eval_reference(spec, render_h, render_w, 1.0)
    reference = np.asarray(final_pass(rgb, out_h, out_w, 1))
    fused = np.asarray(tailfuse.fused_tail_final(
        spec, render_h, render_w, out_h, out_w, 1, 1.0, interpret=True))
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    assert diff.max() <= 1


def test_pianoroll_fused_interpret_matches_fallback(monkeypatch):
    """PianoRoll's tail (54 Col inputs + scalars, no planes) through the
    fused kernel vs the reference fallback."""
    import sys
    from pathlib import Path
    REPO = Path(__file__).parent.parent
    sys.path.insert(0, str(REPO / "examples" / "basic"))
    sys.path.insert(0, str(REPO / "examples"))
    import piano_roll

    def render(fused):
        if fused:
            monkeypatch.setenv("SHADERFLOW_TAILFUSE_INTERPRET", "1")
        else:
            monkeypatch.delenv("SHADERFLOW_TAILFUSE_INTERPRET", raising=False)
        scene = piano_roll.PianoRoll()
        scene._setup_run(width=192, height=108, fps=10, time=0.2,
                         ssaa=1.0, freewheel=True)
        scene.engine.begin_batch()
        for _ in range(2):
            scene.next(dt=scene.frametime)
        return np.asarray(scene.engine.flush(2))

    fused = render(True)
    reference = render(False)
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    # ssaa=1 routes through the bf16-plane + bf16-stencil regime: two bf16
    # round-trips before quantization — up to two u8 steps on scattered
    # pixels (~50 dB, far above the 40 dB parity bar), last bit on ~10%
    assert diff.max() <= 2
    assert (diff != 0).mean() < 0.15


def test_equal_res_stencil_regime_fused(monkeypatch):
    """ssaa=1 + subsample=2 (the 3-tap stencil regime): run_tail_final must
    route through the fused kernel's bf16-render mode + the XLA stencil and
    match the reference path within bf16 rounding."""
    out_h, out_w = 40, 160
    spec = _make_spec(out_h, out_w)
    reference = np.asarray(final_pass(
        tailfuse.eval_reference(spec, out_h, out_w, 1.0), out_h, out_w, 2))
    monkeypatch.setenv("SHADERFLOW_TAILFUSE_INTERPRET", "1")
    fused = np.asarray(tailfuse.run_tail_final(
        spec, out_h, out_w, out_h, out_w, 2, 1.0))
    diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
    # bf16 plane round-trip before the stencil: ~2^-8 relative, about one
    # quantization step
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.01


def test_indexed_stack_matches_reference():
    """Indexed inputs: kernel block-indexes the (N, H, W) stack via scalar
    prefetch; must equal dynamic-indexing + plane input."""
    out_h, out_w, s = 32, 256, 2
    render_h, render_w = out_h * s, out_w * s
    rng = np.random.default_rng(21)
    stack = jnp.asarray(rng.random((5, render_h, render_w), np.float32))

    def tail(tp):
        (v,) = tp.vec("sel")
        return v, 1.0 - v, v * 0.5

    for index in (0, 3, 4, 9):   # 9 exercises the clip
        spec = tailfuse.make_spec(
            tail, render_h, render_w,
            sel=tailfuse.Indexed(stack, jnp.int32(index)))
        assert "sel" in spec.indexed
        rgb = tailfuse.eval_reference(spec, render_h, render_w, 1.0)
        reference = np.asarray(final_pass(rgb, out_h, out_w, s))
        fused = np.asarray(tailfuse.fused_tail_final(
            spec, render_h, render_w, out_h, out_w, s, 1.0, interpret=True))
        diff = np.abs(fused.astype(np.int16) - reference.astype(np.int16))
        assert diff.max() <= 1, f"index {index}"


def test_atan2_nonfinite_matches_ieee():
    """Poly atan2 must match IEEE arctan2 on infinities: escaped-fractal z
    planes contain +-inf (the tetration golden regressed 42 dB when
    inf/inf produced NaN -> black pixels instead of pi/4 hues)."""
    inf = np.float32(np.inf)
    # (0, -0.0) is deliberately absent: the poly treats -0.0 as +0.0
    # (returns 0, IEEE says pi) — a documented deviation to keep the hot
    # kernel free of a signbit divide.
    ys = np.array([inf, inf, -inf, -inf, 1.0, -1.0, inf, -inf, 0.0,
                   5.0, 5.0], np.float32)
    xs = np.array([inf, -inf, inf, -inf, inf, inf, 1.0, 1.0, 0.0,
                   5.0, -5.0], np.float32)
    got = np.asarray(tailfuse.atan2(jnp.asarray(ys), jnp.asarray(xs)))
    want = np.arctan2(ys, xs)
    assert np.allclose(got, want, atol=2e-5), (got, want)
