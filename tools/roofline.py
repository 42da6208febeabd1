"""Roofline / MFU accounting for the graded configs (BASELINE.md).

For each config: steady-state device ms/frame (measured), XLA's compiled
cost model (flops + bytes accessed per batch, engine.cost_analysis), the
achieved GB/s and FLOP/s, and how far each sits from the v5e walls — i.e.
whether the program is bandwidth- or compute-bound and the remaining
headroom. This answers "is it actually fast?" against hardware limits
instead of against prior rounds (the reference quotes fps only,
/root/reference/shaderflow/exporting.py:191-200).

Pallas kernels are custom calls, opaque to XLA's flop model — their
operand/result traffic IS visible to the bytes model, so the bandwidth
side is complete; the flop side is a LOWER bound for Pallas-heavy configs
(mandelbrot's escape loop; the visualizer/pianoroll tails) and the table
marks those rows.

Peaks (TPU v5e / "v5 lite", one chip):
  HBM           819 GB/s   (scaling-book spec)
  MXU bf16      197 TFLOP/s (spec)
  VPU f32 mix   5.56 Tops/s (MEASURED here on the tail-shaped op mix,
                             tools/bench_vpu_dtype.py 2026-08-18; the
                             realistic elementwise ceiling)

Usage: python tools/roofline.py [config ...]   (default: all six)
Writes docs/roofline.md and prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))

HBM_PEAK = 819e9          # bytes/s
MXU_BF16_PEAK = 197e12    # flop/s
VPU_F32_MEASURED = 5.56e12  # op/s, tail-shaped mix (bench_vpu_dtype.py)

CONFIGS = {
    "basic": dict(width=512, height=288, fps=30.0, ssaa=1.0, batch=128),
    "bars": dict(width=1280, height=720, fps=30.0, ssaa=1.0, batch=128),
    "visualizer": dict(width=1920, height=1080, fps=60.0, ssaa=2.0, batch=128),
    "mandelbrot": dict(width=1920, height=1080, fps=60.0, ssaa=2.0, batch=128),
    "raymarch": dict(width=1920, height=1080, fps=60.0, ssaa=1.0, batch=128),
    "pianoroll": dict(width=3840, height=2160, fps=60.0, ssaa=1.0, batch=64),
}
PALLAS_HEAVY = {"mandelbrot", "visualizer", "pianoroll"}


def scene_for(name: str):
    import demo
    import fractals
    import piano_roll
    return {
        "visualizer": demo.Visualizer,
        "bars": demo.MusicBars,
        "basic": demo.Basic,
        "raymarch": demo.RayMarch,
        "mandelbrot": fractals.Mandelbrot,
        "pianoroll": piano_roll.PianoRoll,
    }[name]()


def measure(name: str, rounds: int = 4) -> dict:
    import jax
    cfg = CONFIGS[name]
    batch = cfg["batch"]
    scene = scene_for(name)
    scene._setup_run(width=cfg["width"], height=cfg["height"], fps=cfg["fps"],
                     ssaa=cfg["ssaa"], time=(rounds + 2) * batch / cfg["fps"],
                     freewheel=True)
    engine = scene.engine

    def run_batch():
        engine.begin_batch()
        for _ in range(batch):
            scene.next(dt=scene.frametime)
        return engine.flush(batch, pad_to=batch)

    jax.block_until_ready(run_batch())  # compile + warm
    cost = engine.cost_analysis(batch, pad_to=batch)

    t0 = time.monotonic()
    for _ in range(rounds):
        out = run_batch()
    jax.block_until_ready(out)
    wall = time.monotonic() - t0
    frames = rounds * batch

    s_per_frame = wall / frames
    flops = float(cost.get("flops", 0.0)) / batch
    bytes_acc = float(cost.get("bytes accessed", 0.0)) / batch
    bw_util = (bytes_acc / s_per_frame) / HBM_PEAK
    vpu_util = (flops / s_per_frame) / VPU_F32_MEASURED
    mxu_util = (flops / s_per_frame) / MXU_BF16_PEAK
    bound = "bandwidth" if bw_util >= vpu_util else "compute(VPU)"
    headroom = 1.0 / max(bw_util, vpu_util, 1e-12)
    return {
        "config": name,
        **{k: cfg[k] for k in ("width", "height", "fps", "ssaa", "batch")},
        "ms_per_frame": round(s_per_frame * 1e3, 3),
        "export_fps": round(1.0 / s_per_frame, 1),
        "gflop_per_frame": round(flops / 1e9, 3),
        "gbytes_per_frame": round(bytes_acc / 1e9, 4),
        "achieved_gbps": round(bytes_acc / s_per_frame / 1e9, 1),
        "hbm_utilization": round(bw_util, 3),
        "achieved_tflops": round(flops / s_per_frame / 1e12, 3),
        "vpu_mix_utilization": round(vpu_util, 3),
        "mxu_bf16_utilization": round(mxu_util, 4),
        "bound": bound,
        "headroom_x": round(headroom, 2),
        "flops_lower_bound": name in PALLAS_HEAVY,
    }


def main() -> None:
    import jax
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(CONFIGS)
    device = str(jax.devices()[0])
    rows = []
    for name in names:
        print(f"== {name} ==", file=sys.stderr, flush=True)
        row = measure(name)
        rows.append(row)
        print(json.dumps(row), flush=True)

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    lines = [
        "## Roofline / MFU (per graded config)",
        "",
        f"Measured {stamp} on `{device}` (`python tools/roofline.py`; "
        "steady-state device batches, XLA compiled cost model).",
        "Walls: HBM 819 GB/s; VPU f32 tail-mix 5.56 Tops/s (measured, "
        "`tools/bench_vpu_dtype.py`); MXU bf16 197 TFLOP/s.",
        "Pallas custom calls are opaque to XLA's flop model, so flop-side "
        "numbers marked `>=` are lower bounds (their HBM traffic IS counted).",
        "",
        "| Config | ms/frame | GB/frame | GB/s (vs 819) | GFLOP/frame "
        "| TFLOP/s | bound | headroom |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        ge = ">=" if r["flops_lower_bound"] else ""
        lines.append(
            f"| {r['config']} {r['width']}x{r['height']}@{r['fps']:g} "
            f"ssaa={r['ssaa']:g} | {r['ms_per_frame']:.2f} "
            f"| {r['gbytes_per_frame']:.3f} "
            f"| {r['achieved_gbps']:.0f} ({r['hbm_utilization']:.0%}) "
            f"| {ge}{r['gflop_per_frame']:.1f} "
            f"| {ge}{r['achieved_tflops']:.2f} "
            f"| {r['bound']} | {r['headroom_x']:.1f}x |")
    lines.append("")
    out = REPO / "docs" / "roofline.md"
    out.write_text("\n".join(lines))
    print(f"Wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
