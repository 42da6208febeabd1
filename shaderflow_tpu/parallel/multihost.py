"""
Multi-host export: per-host content segments + lossless join.

The single-host multi-chip path (mesh.py) shards each frame batch over the
local chips. Scaling past one host needs no collectives at all: freewheel
time is deterministic (frame k at t = k/fps exactly — scheduler.py /
scene.main(start=)), so hosts render disjoint content windows of the SAME
export independently and the segments concatenate losslessly — the same
mechanism as crash resume (FFmpeg.concat_segments), planned up front. This
mirrors the SURVEY §5 recommendation ("multi-host exports, each host
encoding its own segment and concatenating — FFmpeg segment muxing"); DCN
never carries frames.

Only feedback-free scenes segment exactly (same condition as mesh.py's
frame sharding): a temporal-feedback scene's frame k depends on frame k-1,
so a mid-run segment boundary would need state replay.

Usage (same invocation on every host, e.g. under `jax.distributed` or any
launcher that provides a rank):

    from shaderflow_tpu.parallel.multihost import export_segment, join_segments
    path = export_segment(MyScene(), "out.mp4", hosts=4, host=rank,
                          time=30.0, width=3840, height=2160, fps=60)
    # afterwards, on one host (shared filesystem):
    join_segments("out.mp4", hosts=4)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional

from shaderflow_tpu import logger


def segment_plan(duration: float, fps: float, hosts: int) -> list:
    """Split [0, duration) into `hosts` frame-aligned (start, end) windows.

    Boundaries land exactly on frame times (start = k/fps) so each segment
    renders an integral, disjoint run of frames; together they cover every
    frame of the single-host export exactly once."""
    if hosts < 1:
        raise ValueError(f"hosts must be >= 1, got {hosts}")
    total = round(duration * fps)
    plan = []
    for host in range(hosts):
        first = (total * host) // hosts
        last = (total * (host + 1)) // hosts
        plan.append((first / fps, last / fps))
    return plan


def segment_path(output, host: int) -> Path:
    output = Path(output)
    return output.with_stem(f"{output.stem}.seg{host:03d}")


def export_segment(scene, output, *, hosts: int, host: int,
                   time: float, fps: float = 60.0, **main_kwargs):
    """Render THIS host's content window to its segment file.

    `scene` is a built ShaderScene; remaining kwargs flow to scene.main().
    Feedback scenes are rejected (segments would need cross-frame state)."""
    for module in scene.modules:
        texture = getattr(module, "texture", None)
        if texture is not None and getattr(texture, "temporal", 1) > 1:
            raise ValueError(
                f"Scene has temporal feedback ({module.name}); multi-host "
                f"segmenting needs feedback-free frames (same condition as "
                f"frame sharding)")
    start, end = segment_plan(time, fps, hosts)[host]
    target = segment_path(output, host)
    logger.info(f"Host {host}/{hosts}: rendering [{start:.3f}, {end:.3f})s "
                f"-> {target}")
    return scene.main(output=str(target), time=end, start=start, fps=fps,
                      **main_kwargs)


def join_segments(output, *, hosts: int, remove: bool = True) -> Path:
    """Concatenate the per-host segments into `output` (run on ONE host over
    a shared filesystem, after every export_segment returned).

    Container files join via FFmpeg's lossless concat demuxer; .rgb raw
    streams (and their .json metadata) join by byte concatenation — the
    binary-free path this environment can verify end-to-end."""
    output = Path(output)
    segments = [segment_path(output, host) for host in range(hosts)]
    missing = [s for s in segments if not s.exists()]
    if missing:
        raise FileNotFoundError(f"Missing segments: {missing}")

    if output.suffix == ".rgb":
        meta = None
        with open(output, "wb") as joined:
            for segment in segments:
                with open(segment, "rb") as handle:
                    shutil.copyfileobj(handle, joined)
                side = segment.with_suffix(".rgb.json")
                if side.exists():
                    part = json.loads(side.read_text())
                    if meta is None:
                        meta = part
                    else:
                        meta["frames"] += part["frames"]
        if meta is not None:
            output.with_suffix(".rgb.json").write_text(json.dumps(meta))
    else:
        from shaderflow_tpu.io.ffmpeg import FFmpeg
        FFmpeg.concat_segments(segments, output)

    if remove:
        for segment in segments:
            segment.unlink(missing_ok=True)
            segment.with_suffix(".rgb.json").unlink(missing_ok=True)
    logger.info(f"Joined {hosts} segments -> {output}")
    return output
