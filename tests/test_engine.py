"""Engine internals: batch padding semantics, uniform packing, streamed
promotion persistence, build-key stability (no retrace across runs)."""

import numpy as np

import jax.numpy as jnp

from shaderflow_tpu import ops
from shaderflow_tpu.scene import ShaderScene
from shaderflow_tpu.texture import ShaderTexture


class Feedback(ShaderScene):
    """Accumulator: value(k) = value(k-1) + 0.1 — exposes carry corruption."""

    def build(self):
        self.shader.texture.temporal = 2

        def frag(sf):
            previous = sf.texture(sf.tex("iScreen", 1, 0), sf.astuv)
            return ops.vec4(previous[..., 0] + 0.1, 0.0, 0.0, 1.0)
        self.shader.fragment = frag


def test_padded_flush_crops_and_preserves_count():
    scene = Feedback()
    scene._setup_run(width=16, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(3):
        scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(3, pad_to=8))
    assert frames.shape[0] == 3
    # Accumulator values 0.1, 0.2, 0.3
    np.testing.assert_allclose(frames[:, 0, 0, 0] / 255, [0.1, 0.2, 0.3], atol=0.01)


def test_padding_does_advance_carry_past_batch():
    """Documented hazard: padded frames run through the scan, so the carry
    after a padded flush reflects the padding. The export loop only pads the
    final batch (carry unused after); resume/replay must not pad."""
    scene = Feedback()
    scene._setup_run(width=16, height=8, fps=10, time=2.0, freewheel=True)
    engine = scene.engine

    engine.begin_batch()
    for _ in range(2):
        scene.next(dt=scene.frametime)
    engine.flush(2, pad_to=6)  # 4 extra scan steps advance the accumulator

    engine.begin_batch()
    scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(1))
    assert frames[0, 0, 0, 0] / 255 > 0.6  # 2 real + 4 padded + 1 = 0.7


def test_uniform_packing_roundtrip():
    scene = Feedback()
    scene._setup_run(width=16, height=8, fps=10, time=0.5, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(2):
        scene.next(dt=scene.frametime)
    packed, spec, streams = engine.stack_captures(2)
    assert packed.dtype == np.float32 and packed.shape[0] == 2
    names = [entry[0] for entry in spec]
    assert "iTime" in names and "iResolution" in names and "iFrameIndex" in names
    # Offsets tile the row exactly
    total = sum(entry[2] for entry in spec)
    assert packed.shape[1] == total
    # iTime of frame 1 is 1/fps
    entry = next(e for e in spec if e[0] == "iTime")
    assert packed[1, entry[1]] == np.float32(1 / 10)


def test_streamed_promotion_persists_across_batches():
    class Streamer(ShaderScene):
        def build(self):
            self.tex = ShaderTexture(scene=self, name="s", width=1, height=1,
                                     components=1, dtype=np.float32)
            self.n = 0
            self.shader.fragment = lambda sf: ops.vec4(
                sf.texture("s", sf.astuv)[..., 0], 0, 0, 1)

        def update(self):
            self.n += 1
            self.tex.write(np.full((1, 1, 1), self.n / 10, np.float32))

    scene = Streamer()
    scene._setup_run(width=8, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    scene.next(dt=scene.frametime)
    engine.flush(1)
    assert "s" in engine._streamed_names
    jitted = engine._jitted

    engine.begin_batch()
    scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(1))
    assert engine._jitted is jitted  # no rebuild across batches
    np.testing.assert_allclose(frames[0, 0, 0, 0] / 255, 0.2, atol=0.01)


def test_no_rebuild_across_runs():
    scene = Feedback()
    scene.main(width=16, height=8, fps=10, time=0.3, output="null")
    jitted = scene.engine._jitted
    scene.main(width=16, height=8, fps=10, time=0.3, output="null")
    assert scene.engine._jitted is jitted


def test_batch_prelude_flows_per_frame():
    """A scene-registered batch prelude runs once per flush outside the scan
    and each frame reads its own slice via Frag.prelude()."""
    calls = []

    class Preluded(ShaderScene):
        def build(self):
            def prelude(ctx):
                calls.append(1)
                # One value per frame: the stepped frame index as a plane
                h, w = ctx.render_size
                return (ctx.frames[:, None, None].astype(jnp.float32)
                        * jnp.ones((1, h, w), jnp.float32)) / 10.0

            self.batch_preludes["ramp"] = prelude

            def frag(sf):
                plane = sf.prelude("ramp")
                assert plane is not None
                return ops.vec4(plane, 0.0, 0.0, 1.0)
            self.shader.fragment = frag

    scene = Preluded()
    scene._setup_run(width=16, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(4))
    # Frame k's red channel == k/10 (frame indices 0..3)
    np.testing.assert_allclose(frames[:, 0, 0, 0] / 255, [0.0, 0.1, 0.2, 0.3],
                               atol=0.01)
    # Traced at most thrice (the build-time batch-invariance probe calls the
    # fn at two frame offsets + the render program), never per frame — and a
    # second flush re-traces nothing
    traces = len(calls)
    assert traces <= 3
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    engine.flush(4)
    assert len(calls) == traces


def test_prelude_returning_none_deactivates():
    class Fallback(ShaderScene):
        def build(self):
            self.batch_preludes["missing"] = lambda ctx: ctx.rows("nonexistent")

            def frag(sf):
                plane = sf.prelude("missing")
                value = 0.25 if plane is None else 0.75
                return ops.vec4(value, 0.0, 0.0, 1.0)
            self.shader.fragment = frag

    scene = Fallback()
    scene._setup_run(width=8, height=8, fps=10, time=0.5, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(1))
    np.testing.assert_allclose(frames[0, 0, 0, 0] / 255, 0.25, atol=0.01)


def test_static_prelude_shared_across_frames():
    """A batch prelude returning leading-axis-1 takes the STATIC path:
    computed once per batch, captured by the scan closure (not scanned as
    xs), every frame reads the one entry via Frag.prelude()."""
    class StaticPreluded(ShaderScene):
        def build(self):
            def prelude(ctx):
                h, w = ctx.render_size
                # Frame-invariant field with leading axis 1
                return 0.5 * jnp.ones((1, h, w), jnp.float32)

            self.batch_preludes["flat"] = prelude

            def frag(sf):
                plane = sf.prelude("flat")
                assert plane is not None
                assert plane.shape == tuple(reversed(self.render_resolution))
                return ops.vec4(plane, sf.iTime / 10.0, 0.0, 1.0)
            self.shader.fragment = frag

    scene = StaticPreluded()
    scene._setup_run(width=16, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(4))
    # Every frame reads the shared 0.5 plane; green still varies per frame
    np.testing.assert_allclose(frames[:, 0, 0, 0] / 255, [0.5] * 4, atol=0.01)
    assert len({frames[k, 0, 0, 1] for k in range(4)}) > 1

def test_prelude_cache_drops_when_sequence_unbinds():
    """ADVICE r4 (medium): a batch-invariant prelude cached while a device
    sequence was bound must be re-probed when the sequence's PRESENCE
    changes — offline export then realtime on the same scene instance must
    not keep serving the sequence-era field."""
    class Presence(ShaderScene):
        def build(self):
            self.seq_tex = ShaderTexture(scene=self, name="seq", width=1,
                                         height=1, components=1,
                                         dtype=np.float32)
            self.seq_tex.set_sequence(
                jnp.ones((8, 1, 1, 1), jnp.float32), quantize=0)

            def prelude(ctx):
                h, w = ctx.render_size
                value = 0.75 if ctx.sequence("seq") is not None else 0.25
                return value * jnp.ones((1, h, w), jnp.float32)

            self.batch_preludes["field"] = prelude
            self.shader.fragment = lambda sf: ops.vec4(
                sf.prelude("field"), 0.0, 0.0, 1.0)

    scene = Presence()
    scene._setup_run(width=8, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(1))
    np.testing.assert_allclose(frames[0, 0, 0, 0] / 255, 0.75, atol=0.01)

    scene.seq_tex.set_sequence(None)
    scene.seq_tex.write(np.zeros((1, 1, 1), np.float32))
    engine.begin_batch()
    scene.next(dt=scene.frametime)
    frames = np.asarray(engine.flush(1))
    np.testing.assert_allclose(frames[0, 0, 0, 0] / 255, 0.25, atol=0.01)


def test_frame_value_dependent_axis1_prelude_not_frozen():
    """ADVICE r4 (low): an axis-1 prelude that REDUCES over ctx.frames must
    not be frozen at the probe's indices — the dual-offset probe detects the
    frame-value dependence and leaves it per-launch."""
    class Reducer(ShaderScene):
        def build(self):
            def prelude(ctx):
                h, w = ctx.render_size
                mean = jnp.mean(ctx.frames.astype(jnp.float32))
                return (mean / 20.0) * jnp.ones((1, h, w), jnp.float32)

            self.batch_preludes["mean"] = prelude
            self.shader.fragment = lambda sf: ops.vec4(
                sf.prelude("mean"), 0.0, 0.0, 1.0)

    scene = Reducer()
    scene._setup_run(width=8, height=8, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    first = np.asarray(engine.flush(4))[0, 0, 0, 0] / 255
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    second = np.asarray(engine.flush(4))[0, 0, 0, 0] / 255
    # Batch 1 frames 0-3 (mean 1.5), batch 2 frames 4-7 (mean 5.5)
    np.testing.assert_allclose(first, 1.5 / 20, atol=0.01)
    np.testing.assert_allclose(second, 5.5 / 20, atol=0.01)


def test_u8_stream_crosses_wire_as_u8_and_matches_f32():
    """A streamed texture written with uint8 frames ships u8 host->device
    (engine._stream_snapshot / texture.wire_u8) and normalizes in-jit with
    the same /255 division the host write uses — pixel values must equal
    the f32-snapshot path exactly."""
    def make_scene():
        class U8Streamer(ShaderScene):
            def build(self):
                self.tex = ShaderTexture(scene=self, name="s", width=4,
                                         height=2, components=3,
                                         dtype=np.uint8)
                self.n = 0
                self.shader.fragment = lambda sf: ops.vec4(
                    sf.texture("s", sf.astuv)[..., :3], 1.0)

            def update(self):
                self.n += 1
                frame = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
                self.tex.write((frame + 7 * self.n).astype(np.uint8))
        scene = U8Streamer()
        scene._setup_run(width=8, height=4, fps=10, time=1.0, freewheel=True)
        return scene

    scene = make_scene()
    engine = scene.engine
    engine.begin_batch()
    for _ in range(3):
        scene.next(dt=scene.frametime)
    _, _, streams = engine.stack_captures(3)
    assert streams["s"].dtype == np.uint8  # u8 on the wire
    engine.begin_batch()
    for _ in range(3):
        scene.next(dt=scene.frametime)
    wire = np.asarray(engine.flush(3))

    # Same scene, f32 snapshots forced (the permanent-fallback path)
    scene2 = make_scene()
    engine2 = scene2.engine
    engine2._stream_f32.add("s")
    engine2.begin_batch()
    for _ in range(3):
        scene2.next(dt=scene2.frametime)
    _, _, streams2 = engine2.stack_captures(3)
    assert streams2["s"].dtype == np.float32
    engine2.begin_batch()
    for _ in range(3):
        scene2.next(dt=scene2.frametime)
    ref = np.asarray(engine2.flush(3))
    np.testing.assert_array_equal(wire, ref)


def test_stream_falls_back_to_f32_on_mixed_writes():
    """A partial-viewport (or f32) write invalidates the u8 twin; already-
    captured u8 snapshots convert in place so the stacked stream stays
    homogeneous f32."""
    class Mixed(ShaderScene):
        def build(self):
            self.tex = ShaderTexture(scene=self, name="s", width=4, height=2,
                                     components=1, dtype=np.uint8)
            self.n = 0
            self.shader.fragment = lambda sf: ops.vec4(
                sf.texture("s", sf.astuv)[..., 0], 0, 0, 1)

        def update(self):
            self.n += 1
            if self.n < 3:
                self.tex.write(np.full((2, 4, 1), 128, np.uint8))
            else:  # f32 write drops the u8 twin
                self.tex.write(np.full((2, 4, 1), 0.25, np.float32))

    scene = Mixed()
    scene._setup_run(width=8, height=4, fps=10, time=1.0, freewheel=True)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(4):
        scene.next(dt=scene.frametime)
    _, _, streams = engine.stack_captures(4)
    assert streams["s"].dtype == np.float32
    np.testing.assert_allclose(streams["s"][0].ravel()[0], 128 / 255)
    np.testing.assert_allclose(streams["s"][3].ravel()[0], 0.25)
    assert "s" in engine._stream_f32
