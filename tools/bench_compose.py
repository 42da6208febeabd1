"""Composed end-to-end export ON the chip at a link-feasible resolution
(VERDICT r4 #5): one real `scene.main()` with a consuming sink, measured as
render ∥ device→host ∥ encoder-write and compared against its components —
wall ≈ max(render, transfer, write) is the overlap evidence, >1x realtime
is the UX claim. The headline bench (bench.py) deliberately excludes
delivery (NullSink); this run is the composed complement at a resolution
the environment's ~10 MB/s tunnel can actually carry (on locally-attached
hardware the same path runs at the pump's 2.25 GB/s ceiling,
tools/bench_sink.py). Reference metric anchor: the GL exporter's stats
include readback + pipe + encode (/root/reference/shaderflow/exporting.py:138-200).

Run serialized on the chip. Env: COMPOSE_WIDTH/HEIGHT/FPS/SECONDS.
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "examples" / "basic"))

from bench_sink import make_stub, read_stub_count  # noqa: E402


def measure_link_mbps() -> float:
    """Device→host throughput through this attachment (timed fetch of
    INCOMPRESSIBLE bytes — a pattern like arange measures the tunnel's
    compressor, not the link). Every timed fetch targets a FRESHLY
    computed device array: jax caches a fetched array's host copy
    (`_npy_value`), so re-fetching the same array measures nothing
    (observed 2026-08-19: 34 GB/s 'link' on a ~20 MB/s tunnel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    host = np.random.default_rng(0).integers(
        0, 256, 4 * 1024 * 1024, dtype=np.uint8)
    base = jnp.asarray(host)
    fetch = jax.jit(lambda x, s: x ^ s)
    # warm: compile + first-readback path setup (can cost tens of seconds)
    np.asarray(jax.block_until_ready(fetch(base, jnp.uint8(1))))
    reps, took = 3, 0.0
    for i in range(reps):
        out = jax.block_until_ready(fetch(base, jnp.uint8(2 + i)))
        t0 = time.monotonic()
        np.asarray(out)
        took += time.monotonic() - t0
    return reps * host.size / took / 1e6


def main() -> None:
    width = int(os.environ.get("COMPOSE_WIDTH", 320))
    height = int(os.environ.get("COMPOSE_HEIGHT", 180))
    fps = float(os.environ.get("COMPOSE_FPS", 30))
    seconds = float(os.environ.get("COMPOSE_SECONDS", 10.0))
    frames = round(seconds * fps)
    frame_bytes = width * height * 3

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        make_stub(tmp)  # stub ffmpeg onto PATH (+ binary cache clear)

        import demo

        common = dict(width=width, height=height, fps=fps, ssaa=2.0,
                      time=seconds)
        scene = demo.Visualizer()  # ONE instance: precomputes cache across runs

        def run(output: str) -> float:
            t0 = time.monotonic()
            scene.main(output=output, **common)
            return time.monotonic() - t0

        run("null")                      # compile + warm + precomputes
        wall_null = run("null")          # render-only
        link_mbps = measure_link_mbps()
        out = tmp / "compose.mp4"
        # Warm the sink-consuming path too: the FIRST device->host batch
        # transfer of a session pays a multi-second setup cost on this
        # attachment (measured ~8 s inside the 16:00Z timed run) that is
        # not steady-state export behavior
        scene.main(output=str(tmp / "warm.mp4"), width=width, height=height,
                   fps=fps, ssaa=2.0, time=1.0)
        wall_sink = run(str(out))        # composed: render ∥ transfer ∥ write
        delivered = read_stub_count(out)
        assert delivered == frames * frame_bytes, (delivered, frames * frame_bytes)

        transfer_s = delivered / (link_mbps * 1e6)
        floor = max(wall_null, transfer_s)
        print(json.dumps({
            "metric": f"composed export visualizer {width}x{height}@{fps:g} "
                      f"ssaa=2 ({seconds:g}s content, FFmpegSink+pump)",
            "frames": frames,
            "wall_sink_s": round(wall_sink, 2),
            "realtime_x": round(seconds / wall_sink, 2),
            "export_fps": round(frames / wall_sink, 1),
            "render_only_wall_s": round(wall_null, 2),
            "link_mbps": round(link_mbps, 1),
            "transfer_bytes": delivered,
            "transfer_floor_s": round(transfer_s, 2),
            "serial_sum_s": round(wall_null + transfer_s, 2),
            "max_component_s": round(floor, 2),
            # 1.0 = perfect overlap (wall == slowest component);
            # (sum/max) = fully serialized
            "wall_over_max": round(wall_sink / floor, 2),
            "overlapped": bool(wall_sink < 0.75 * (wall_null + transfer_s)
                               or wall_sink <= 1.15 * floor),
        }))


if __name__ == "__main__":
    main()
