"""Realtime preview benchmark (VERDICT r3 #7): can the interactive path hold
1080p60 with live audio + HUD on the chip?

Runs the visualizer in REALTIME mode (per-frame dispatch, depth-pipelined
display, audio streaming, HUD drawn) without a window (frames realized, not
blitted — the display blit is backend-dependent and cheap) at two paces:

  * unpaced (fps=10000): the path's maximum throughput
  * paced 60 fps: achieved fps + frame-time p95 (the 'holds 60' verdict)

Run ON THE CHIP, serialized (tools/chip_session.sh). Env:
BENCH_PREVIEW_{WIDTH,HEIGHT,FRAMES}.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "examples" / "basic"))


def run(width: int, height: int, fps: float, frames: int) -> dict:
    import numpy as np
    import demo

    scene = demo.Visualizer()
    scene.frame_limit = None
    scene._setup_run(width=width, height=height, fps=fps, time=1e9,
                     freewheel=False)
    scene.engine.begin_batch()

    times = []
    pending = None
    # Mirror _realtime_frame's depth-1 pipelining + HUD + realization
    scene.render_ui = True
    for k in range(frames + 10):
        t0 = time.perf_counter()
        scene.engine.begin_batch()
        scene.next(dt=1.0 / fps)
        dispatched = scene.engine.flush(1)
        frame = pending
        pending = dispatched
        if frame is not None:
            host = np.asarray(frame[0])
            scene._draw_hud(host.copy())
        # Pace like the scheduler would
        budget = 1.0 / fps - (time.perf_counter() - t0)
        if budget > 0:
            time.sleep(budget)
        if k >= 10:  # skip warmup
            times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "fps_achieved": 1.0 / times.mean(),
        "frame_ms_p50": float(np.percentile(times, 50) * 1e3),
        "frame_ms_p95": float(np.percentile(times, 95) * 1e3),
        "missed_pct": float((times > 1.0 / fps * 1.05).mean() * 100),
    }


def main() -> None:
    import jax
    print(f"device: {jax.devices()[0]}")
    width = int(os.environ.get("BENCH_PREVIEW_WIDTH", 1920))
    height = int(os.environ.get("BENCH_PREVIEW_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_PREVIEW_FRAMES", 300))

    unpaced = run(width, height, fps=10000.0, frames=frames)
    print(f"unpaced {width}x{height}: {unpaced['fps_achieved']:.1f} fps "
          f"(p50 {unpaced['frame_ms_p50']:.1f} ms, "
          f"p95 {unpaced['frame_ms_p95']:.1f} ms)")

    paced = run(width, height, fps=60.0, frames=frames)
    verdict = "HOLDS 60" if paced["missed_pct"] < 5 else "MISSES 60"
    print(f"paced-60 {width}x{height}: {paced['fps_achieved']:.1f} fps, "
          f"p95 {paced['frame_ms_p95']:.1f} ms, "
          f"{paced['missed_pct']:.1f}% frames over budget -> {verdict}")


if __name__ == "__main__":
    main()
