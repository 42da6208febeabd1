"""Realtime preview benchmark (VERDICT r3 #7): can the interactive path hold
1080p60 with live audio + HUD on the chip?

Reports THREE decomposed measurements, because on a remote-attached chip the
display link dominates and a single number would misattribute it:

  * device: per-frame render cost at batch=1, launches queued back-to-back
    (what the chip itself can sustain)
  * link: one displayed frame's device->host transfer (what the attachment
    can sustain; ~6.2 MB at 1080p — hundreds of ms through this
    environment's tunnel, ~1 ms on locally-attached PCIe)
  * paced-60 loop: the REAL realtime path (scene.next + dispatch + async
    latest-frame-wins display, io/displaypump.py) — scene-loop fps (the
    'holds 60' verdict: input/audio/dynamics pacing) and displayed fps
    (link-bound) separately

Run ON THE CHIP, serialized (tools/chip_session.sh). Env:
BENCH_PREVIEW_{WIDTH,HEIGHT,FRAMES}.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "examples" / "basic"))


def make_scene(width: int, height: int, fps: float):
    import demo
    scene = demo.Visualizer()
    scene.frame_limit = None
    scene._setup_run(width=width, height=height, fps=fps, time=1e9,
                     freewheel=False)
    scene.engine.begin_batch()
    return scene


def bench_device(scene, fps: float, frames: int) -> float:
    """Amortized per-frame device+dispatch cost: queue every launch, block
    once at the end (the async-display loop never blocks per frame)."""
    import jax
    handles = []
    for _ in range(10):  # warmup
        scene.engine.begin_batch()
        scene.next(dt=1.0 / fps)
        handles.append(scene.engine.flush(1))
    jax.block_until_ready(handles)
    handles.clear()
    t0 = time.perf_counter()
    for _ in range(frames):
        scene.engine.begin_batch()
        scene.next(dt=1.0 / fps)
        handles.append(scene.engine.flush(1))
        if len(handles) > 3:
            handles.pop(0)[0].block_until_ready()
    jax.block_until_ready(handles)
    return (time.perf_counter() - t0) / frames


def bench_link(scene, fps: float, reps: int = 5) -> float:
    import numpy as np
    scene.engine.begin_batch()
    scene.next(dt=1.0 / fps)
    frames = scene.engine.flush(1)
    np.asarray(frames[0])  # first-transfer setup cost excluded
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(frames[0])
    return (time.perf_counter() - t0) / reps


def bench_paced(scene, fps: float, frames: int) -> dict:
    """The real async-display realtime path, paced at `fps`."""
    import numpy as np
    from shaderflow_tpu.io.displaypump import DisplayPump

    pump = DisplayPump()
    scene.render_ui = True
    inflight = []
    times = []
    displayed = 0
    try:
        for k in range(frames + 10):
            t0 = time.perf_counter()
            scene.engine.begin_batch()
            scene.next(dt=1.0 / fps)
            dispatched = scene.engine.flush(1)
            inflight.append(dispatched)
            while len(inflight) > 3:
                inflight.pop(0)[0].block_until_ready()
            pump.offer(dispatched)
            frame = pump.take()
            if frame is not None:
                scene._draw_hud(frame.copy())
                displayed += 1
            budget = 1.0 / fps - (time.perf_counter() - t0)
            if budget > 0:
                time.sleep(budget)
            if k >= 10:
                times.append(time.perf_counter() - t0)
    finally:
        pump.close()
    times = np.asarray(times)
    wall = times.sum()
    return {
        "fps_achieved": 1.0 / times.mean(),
        "frame_ms_p95": float(np.percentile(times, 95) * 1e3),
        "missed_pct": float((times > 1.0 / fps * 1.05).mean() * 100),
        "display_fps": displayed / wall if wall > 0 else 0.0,
    }


def main() -> None:
    import jax
    print(f"device: {jax.devices()[0]}")
    width = int(os.environ.get("BENCH_PREVIEW_WIDTH", 1920))
    height = int(os.environ.get("BENCH_PREVIEW_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_PREVIEW_FRAMES", 300))

    scene = make_scene(width, height, fps=60.0)
    device_s = bench_device(scene, fps=60.0, frames=frames)
    print(f"device  {width}x{height}: {device_s * 1e3:.1f} ms/frame "
          f"({1.0 / device_s:.1f} fps render ceiling)")

    link_s = bench_link(scene, fps=60.0)
    mb = width * height * 3 / 1e6
    print(f"link    {width}x{height}: {link_s * 1e3:.1f} ms/frame "
          f"({mb / link_s:.1f} MB/s device->host)")

    paced = bench_paced(make_scene(width, height, fps=60.0), 60.0, frames)
    loop_verdict = "HOLDS 60" if paced["missed_pct"] < 5 else "MISSES 60"
    print(f"paced-60 {width}x{height}: scene loop {paced['fps_achieved']:.1f} fps "
          f"(p95 {paced['frame_ms_p95']:.1f} ms, {paced['missed_pct']:.1f}% over "
          f"budget -> {loop_verdict}), display {paced['display_fps']:.1f} fps "
          f"(link-bound: one {mb:.1f} MB frame per {link_s * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
