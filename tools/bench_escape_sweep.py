"""Sweep the escape-kernel tiling knobs on the GRADED mandelbrot config.

The kernel defaults (tile 256x128, unroll 16, sub 64) came from a q=50
sweep; the graded scene runs q=500 cap=142 where the wasted-work vs
check-cost tradeoff differs (deeper boundary blocks, more unroll slack).
This runs the actual graded bench (BENCH_SCENE=mandelbrot, 1080p60 ssaa=2)
once per config in a fresh subprocess (env is read at trace time) and
prints a ranked table. ONE chip job at a time — run only via/after
tools/chip_session.sh (respects the session lock through bench.py).

Reference metric: /root/reference/shaderflow/exporting.py:191-200 (the
export stats line); target >= 600 fps = 10x realtime on the graded config.
"""

import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TILES = ["256x128", "256x256", "128x256", "512x128"]
UNROLLS = [8, 16, 32]
SUBS = [16, 32, 64]


def run(tile: str, unroll: int, sub: int) -> float:
    env = dict(os.environ)
    env.update(
        BENCH_SCENE="mandelbrot",
        SHADERFLOW_FRACTAL_TILE=tile,
        SHADERFLOW_FRACTAL_UNROLL=str(unroll),
        SHADERFLOW_FRACTAL_SUB=str(sub),
        BENCH_INSIDE_CHIP_SESSION=env.get("BENCH_INSIDE_CHIP_SESSION", "1"),
    )
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return float(json.loads(line)["value"])
            except Exception:
                continue
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-2000:], file=sys.stderr)
    return 0.0


def main() -> None:
    # Sweep one axis at a time around the current default first (cheap),
    # then the full grid only if the caller asks (--full).
    full = "--full" in sys.argv
    if full:
        configs = list(itertools.product(TILES, UNROLLS, SUBS))
    else:
        base = ("256x128", 16, 64)
        configs = [base]
        configs += [(t, base[1], base[2]) for t in TILES if t != base[0]]
        configs += [(base[0], u, base[2]) for u in UNROLLS if u != base[1]]
        configs += [(base[0], base[1], s) for s in SUBS if s != base[2]]
    results = []
    for tile, unroll, sub in configs:
        fps = run(tile, unroll, sub)
        results.append((fps, tile, unroll, sub))
        print(f"tile={tile:8s} unroll={unroll:3d} sub={sub:3d} -> "
              f"{fps:7.1f} fps ({fps / 60.0:.2f}x)", flush=True)
    results.sort(reverse=True)
    print("\n=== ranked ===")
    for fps, tile, unroll, sub in results:
        print(f"{fps:7.1f} fps  tile={tile} unroll={unroll} sub={sub}")


if __name__ == "__main__":
    main()
