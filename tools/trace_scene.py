"""Per-op device profiling of a scene's render program.

Runs one warm batch, then captures a jax.profiler trace of a timed batch and
prints the top HLO ops by total device time, with fusion details and python
source attribution — the tool that located every round-1 bottleneck
(reshape-pooling re-tiling, gather-lowered strided slices, constant-baked
coordinate grids).

Usage:
    python tools/trace_scene.py [scene] [width] [height] [ssaa] [batch]
    scene in {visualizer, bars, basic, raymarch, mandelbrot, pianoroll}
"""

import collections
import glob
import gzip
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))

import jax


def main() -> None:
    args = sys.argv[1:]
    which = args[0] if args else "visualizer"
    width = int(args[1]) if len(args) > 1 else 1920
    height = int(args[2]) if len(args) > 2 else 1080
    ssaa = float(args[3]) if len(args) > 3 else 2.0
    batch = int(args[4]) if len(args) > 4 else 64

    import demo
    import fractals
    import piano_roll
    scene = {
        "visualizer": demo.Visualizer, "bars": demo.MusicBars,
        "basic": demo.Basic, "raymarch": demo.RayMarch, "life": demo.Life,
        "mandelbrot": fractals.Mandelbrot, "pianoroll": piano_roll.PianoRoll,
    }[which]()

    scene._setup_run(width=width, height=height, fps=60,
                     time=3 * batch / 60, ssaa=ssaa, freewheel=True)
    engine = scene.engine

    def run_batch():
        engine.begin_batch()
        for _ in range(batch):
            scene.next(dt=scene.frametime)
        jax.block_until_ready(engine.flush(batch, pad_to=batch))

    run_batch()  # compile + warm

    trace_dir = "/tmp/shaderflow_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        run_batch()

    path = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(path) as handle:
        trace = json.load(handle)

    agg = collections.defaultdict(float)
    meta = {}
    for event in trace.get("traceEvents", []):
        if event.get("ph") == "X" and "dur" in event:
            agg[event["name"]] += event["dur"]
            if event.get("args"):
                meta.setdefault(event["name"], event["args"])

    print(f"\n=== {which} {width}x{height} ssaa={ssaa} batch={batch} "
          f"(per-batch totals; /{batch} for per-frame) ===")
    for name, duration in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{duration / 1e3:9.1f} ms  {name[:90]}")
        info = meta.get(name, {})
        for key in ("source", "tf_op"):
            if key in info:
                print(f"             {key}: {str(info[key])[:160]}")


if __name__ == "__main__":
    main()
