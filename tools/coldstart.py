"""
Cold-start phase breakdown for the 10s visualizer export (VERDICT r4 #2).

Runs the headline export with an EMPTY compile cache and reports every phase
a first-time user pays before frames flow, using the in-product
instrumentation (spectrogram/waveform precompute_timings, engine
compile_events/probe_seconds), then runs it again warm for the delta.

Usage: python tools/coldstart.py [--keep-cache] [--seconds 10] [--batch 128]
Emits one JSON line to stdout; logs to stderr.

Reference UX anchor: the GL reference's first frame hits the encoder in <1s
(/root/reference/shaderflow/scene.py:622-639) because GLSL compiles are
milliseconds; XLA whole-pipeline compiles are not, so this is the honest
accounting of where the gap lives and what the persistent cache buys.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "basic"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--keep-cache", action="store_true",
                        help="use the repo .jax_cache instead of a fresh dir "
                             "(measures cold-process / warm-cache)")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--batch", type=int, default=128)
    args = parser.parse_args()

    if not args.keep_cache:
        cache = tempfile.mkdtemp(prefix="coldstart_cache_")
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
        print(f"[coldstart] fresh compile cache at {cache}", file=sys.stderr)

    phases: dict[str, float] = {}

    def phase(name: str, start: float) -> float:
        now = time.monotonic()
        phases[name] = round(now - start, 3)
        print(f"[coldstart] {name}: {phases[name]:.2f}s", file=sys.stderr,
              flush=True)
        return now

    wall0 = t = time.monotonic()
    import jax  # noqa: F401
    jax.devices()
    import demo  # examples/basic
    t = phase("import_backend", t)

    scene = demo.Visualizer()
    common = dict(time=args.seconds, width=1920, height=1080, fps=60.0,
                  ssaa=2.0, batch=args.batch, output="null")
    scene.main(**common)
    phase("cold_export_total", t)
    phases["cold_total_wall"] = round(time.monotonic() - wall0, 3)

    spec = next((m for m in scene.modules
                 if type(m).__name__ == "ShaderSpectrogram"), None)
    wave = next((m for m in scene.modules
                 if type(m).__name__ == "ShaderWaveform"), None)
    for mod, tag in ((spec, "spectrogram"), (wave, "waveform")):
        for k, v in (getattr(mod, "precompute_timings", None) or {}).items():
            phases[f"{tag}_{k}"] = round(v, 3)
    phases["prelude_probe"] = round(scene.engine.probe_seconds, 3)
    for batch, seconds in scene.engine.compile_events:
        phases[f"engine_compile_batch{batch}"] = round(seconds, 3)

    t = time.monotonic()
    scene.main(**common)
    phase("warm_export_total", t)

    print(json.dumps({
        "metric": "coldstart visualizer 10s export @1080p60 ssaa=2",
        "cache": "repo" if args.keep_cache else "fresh",
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
