"""Measure realtime-loop pacing (VERDICT r1 #7): actual frames/sec of the
interactive path (per-frame dispatch, depth-1 pipelined display) without a
display attached.

Usage: python tools/bench_realtime.py [scene] [width] [height] [frames]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))


def main() -> None:
    args = sys.argv[1:]
    which = args[0] if args else "visualizer"
    width = int(args[1]) if len(args) > 1 else 1280
    height = int(args[2]) if len(args) > 2 else 720
    frames = int(args[3]) if len(args) > 3 else 120

    import demo
    import fractals
    scene = {
        "visualizer": demo.Visualizer, "basic": demo.Basic,
        "raymarch": demo.RayMarch, "mandelbrot": fractals.Mandelbrot,
    }[which]()

    scene.frame_limit = frames + 1
    # Realtime loop, headless (no cv2 window): frames are still realized
    # per tick for honest pacing. fps=1000 removes the scheduler's sleep
    # so the measurement is the loop's natural ceiling.
    start = time.monotonic()
    scene.main(width=width, height=height, fps=1000)
    took = time.monotonic() - start
    # First frame pays compile; report steady rate over the rest
    print(f"{which} realtime {width}x{height}: {frames / took:.1f} fps "
          f"({took:.2f}s for {frames} frames incl. warmup)")

    scene2 = {
        "visualizer": demo.Visualizer, "basic": demo.Basic,
        "raymarch": demo.RayMarch, "mandelbrot": fractals.Mandelbrot,
    }[which]()
    scene2.frame_limit = frames + 1
    start = time.monotonic()
    scene2.main(width=width, height=height, fps=1000)
    took = time.monotonic() - start
    print(f"{which} realtime {width}x{height} (warm): {frames / took:.1f} fps")


if __name__ == "__main__":
    main()
