"""Multi-host segment export (parallel/multihost.py): disjoint frame-aligned
content windows rendered independently must join bit-identically to a
single-host export (deterministic freewheel time is the contract)."""

import numpy as np
import pytest

from shaderflow_tpu import ops
from shaderflow_tpu.parallel.multihost import (
    export_segment, join_segments, segment_plan, segment_path)
from shaderflow_tpu.scene import ShaderScene


class Ramp(ShaderScene):
    def build(self):
        import jax.numpy as jnp

        def frag(sf):
            t = ops.fract(sf.iTime)
            return ops.vec4(sf.astuv[..., 0],
                            jnp.broadcast_to(t, sf.astuv.shape[:-1]),
                            sf.astuv[..., 1], 1.0)
        self.shader.fragment = frag


def read_rgb(path, w, h):
    data = np.fromfile(path, np.uint8)
    return data.reshape(-1, h, w, 3)


def test_segment_plan_covers_all_frames_exactly():
    plan = segment_plan(1.2, 10, 3)   # 12 frames over 3 hosts
    frames = []
    for start, end in plan:
        first, last = round(start * 10), round(end * 10)
        frames.extend(range(first, last))
    assert frames == list(range(12))
    # Uneven split: 11 frames over 3 hosts
    plan = segment_plan(1.1, 10, 3)
    counts = [round(e * 10) - round(s * 10) for s, e in plan]
    assert sum(counts) == 11 and max(counts) - min(counts) <= 1


def test_segmented_export_joins_bit_identical(tmp_path):
    w, h, fps, seconds = 32, 16, 10.0, 1.2
    single = tmp_path / "single.rgb"
    Ramp().main(output=str(single), width=w, height=h, fps=fps, time=seconds)

    joined = tmp_path / "joined.rgb"
    for host in range(3):
        export_segment(Ramp(), joined, hosts=3, host=host,
                       time=seconds, fps=fps, width=w, height=h)
    join_segments(joined, hosts=3)

    a = read_rgb(single, w, h)
    b = read_rgb(joined, w, h)
    assert a.shape == b.shape == (12, h, w, 3)
    np.testing.assert_array_equal(a, b)
    # Metadata merged
    import json
    meta = json.loads(joined.with_suffix(".rgb.json").read_text())
    assert meta["frames"] == 12
    # Segment temp files removed
    assert not segment_path(joined, 0).exists()


def test_feedback_scene_rejected(tmp_path):
    class Feedback(ShaderScene):
        def build(self):
            self.shader.texture.temporal = 2
            self.shader.fragment = lambda sf: ops.vec4(0.5, 0.5, 0.5, 1.0)

    with pytest.raises(ValueError, match="temporal feedback"):
        scene = Feedback()
        scene._setup_run(width=8, height=8, fps=10, freewheel=True)
        export_segment(scene, tmp_path / "x.rgb", hosts=2, host=0,
                       time=1.0, fps=10, width=8, height=8)
