"""
On-device PSNR parity gate (VERDICT r2 #5).

One command regenerates a dated PSNR table (PSNR_GATE.md) on the REAL
device, so kernel/precision work (bf16 tails, Pallas changes) cannot land
on vibes: run this after any kernel change and eyeball the table.

Two kinds of checks, mirroring BENCHMARKS.md's parity section:

- ORACLE rows: engine output vs the independent NumPy GL transcription
  (tools/gl_oracle.py) — absolute parity with the reference GLSL
  (acceptance bar from BASELINE.md: >= 40 dB).
- FUSED-vs-REF rows: the fused Pallas tail path vs the same engine with
  SHADERFLOW_NO_TAILFUSE=1 (reference semantics by construction) — isolates
  what the fused kernel's polynomial/bf16 math costs, scene by scene.

Each config runs in its own subprocess (env knobs are trace-time, and the
device/jit state stays isolated, same pattern as tools/bench_all.py).
Run on the real chip with nothing else using it; pass --cpu for a smoke run.

Usage: python tools/psnr_gate.py [--cpu]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples" / "fractals"))

BAR_DB = 40.0

# name -> (scene key, width, height, ssaa, subsample, frames, scene kwargs)
# Binary-output scenes (tetration's int-division k, waveform thresholds)
# use an exact-pixel agreement metric instead of PSNR: transcendental/
# matmul ULPs flip isolated boundary pixels at full amplitude there.
ORACLE_CONFIGS = {
    "default (welcome) ssaa=1": ("basic", 512, 288, 1.0, 1, 3, {}),
    "default (welcome) ssaa=2": ("basic", 512, 288, 2.0, 2, 3, {}),
    "mandelbrot (escape kernel + fused tail)":
        ("mandelbrot", 320, 180, 2.0, 2, 2, {"quality": 5}),
    "raymarch (camera rays + SDF)": ("raymarch", 320, 180, 1.0, 1, 2, {}),
    "visualizer (flagship, blur level 4)":
        ("visualizer", 320, 180, 1.0, 1, 3, {}),
    "bars": ("bars", 320, 180, 1.0, 1, 3, {}),
    "tetration (binary k)": ("tetration", 320, 180, 1.0, 1, 2, {}),
    "waveform (binary thresholds)": ("waveform", 320, 180, 1.0, 1, 3, {}),
}
AGREEMENT_CONFIGS = {"tetration (binary k)", "waveform (binary thresholds)"}
AGREE_BAR = 0.99
# Chaotic binary scenes: on the REAL device the transcendental ULP
# differences vs NumPy are larger than XLA:CPU's, so more escape-boundary
# pixels flip (measured 08-18: 98.6% on chip vs 99.4% on CPU for
# tetration). The parity statement that matters — and that the CI test
# (tests/test_psnr_reference.py::test_tetration_parity) also asserts — is
# that flips are CONFINED to the oracle's own escape boundary: for these
# configs the bar relaxes to AGREE_BAR_CHAOTIC provided <= 5% (+3 px) of
# the flips land off the 2px-dilated boundary.
CHAOTIC_CONFIGS = {"tetration (binary k)"}
AGREE_BAR_CHAOTIC = 0.98

FUSED_CONFIGS = {
    "visualizer": ("visualizer", 640, 360, 2.0, 2, 2, {}),
    "pianoroll": ("pianoroll", 192, 108, 1.0, 2, 2, {}),
    "julia": ("julia", 320, 180, 2.0, 2, 2, {"quality": 5}),
    "tetration": ("tetration", 320, 180, 2.0, 2, 2, {}),
}


def scene_class(key: str):
    import demo
    import fractals
    import piano_roll
    return {
        "basic": demo.Basic,
        "visualizer": demo.Visualizer,
        "bars": demo.MusicBars,
        "waveform": demo.Waveform,
        "raymarch": demo.RayMarch,
        "mandelbrot": fractals.Mandelbrot,
        "julia": fractals.Julia,
        "tetration": fractals.Tetration,
        "pianoroll": piano_roll.PianoRoll,
    }[key]


def render_frames(key, width, height, ssaa, subsample, frames, kwargs):
    """Render `frames` frames through the real engine pipeline; return
    (frames u8 array, merged per-frame uniform dicts)."""
    scene = scene_class(key)(**kwargs)
    scene._setup_run(fps=10, time=frames / 10, freewheel=True,
                     width=width, height=height, ssaa=ssaa,
                     subsample=subsample)
    engine = scene.engine
    engine.begin_batch()
    for _ in range(frames):
        scene.next(dt=scene.frametime)
    uniforms = []
    for snapshot in engine._frame_uniforms:
        merged = dict(engine._statics)
        merged.update(snapshot)
        uniforms.append(merged)
    out = np.asarray(engine.flush(frames))
    return out, uniforms, scene


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _oracle_textures(engine, uniform) -> dict:
    """Engine texture state -> oracle handoff (engine matrices store
    row 0 = top; the oracle samples GL row-0-bottom storage)."""
    k = int(np.asarray(uniform.get("iFrameIndex", 0)))
    textures = {}
    if "background" in engine._static_tex:
        textures["background"] = np.asarray(
            engine._static_tex["background"])[0, 0][::-1]
    if "iSpectrogram" in engine._sequences:
        seq = np.asarray(engine._sequences["iSpectrogram"])
        textures["spectrogram"] = seq[min(k, len(seq) - 1)][:, 0, :][::-1]
    if "iWaveform" in engine._sequences:
        seq = np.asarray(engine._sequences["iWaveform"])
        textures["waveform"] = seq[min(k, len(seq) - 1)][0]
    return textures


def worker_oracle(name: str) -> None:
    import gl_oracle
    key, w, h, ssaa, sub, n, kwargs = ORACLE_CONFIGS[name]
    frames, uniforms, scene = render_frames(key, w, h, ssaa, sub, n, kwargs)
    plain = {"basic": gl_oracle.default_fragment,
             "mandelbrot": gl_oracle.mandelbrot_fragment,
             "raymarch": gl_oracle.raymarch_fragment,
             "tetration": gl_oracle.tetration_fragment}
    textured = {"visualizer": gl_oracle.visualizer_fragment,
                "bars": gl_oracle.bars_fragment,
                "waveform": gl_oracle.waveform_fragment}
    worst_psnr = float("inf")
    worst_agree = 1.0
    worst_stray_frac = 0.0
    for index, uniform in enumerate(uniforms):
        merged = dict(uniform)
        if key == "mandelbrot":
            merged.setdefault("iQuality", merged.get("iQualityS", 0.05))
        if key in plain:
            fragment = plain[key]
        else:
            textures = _oracle_textures(scene.engine, uniform)
            base = textured[key]
            fragment = (lambda b, t: lambda u, ww, hh, a: b(u, ww, hh, a, t))(
                base, textures)
        oracle = gl_oracle.render_scene(
            fragment, merged, *scene.render_resolution,
            w, h, sub, scene.aspect_ratio)
        worst_psnr = min(worst_psnr, gl_oracle.psnr(frames[index], oracle))
        diff = np.abs(frames[index].astype(np.int16) - oracle.astype(np.int16))
        worst_agree = min(worst_agree, float((diff.max(-1) <= 2).mean()))
        if name in CHAOTIC_CONFIGS:
            # Flip confinement: disagreements must hug the oracle's own
            # escape boundary (same check as the CI tetration test)
            disagree = diff.max(-1) > 1
            k_field = (oracle[..., 0] > 127).astype(np.int16)
            pad = np.pad(k_field, 2, mode="edge")
            stacked = np.stack([pad[dy:dy + h, dx:dx + w]
                                for dy in range(5) for dx in range(5)])
            boundary = stacked.min(0) != stacked.max(0)
            stray = int((disagree & ~boundary).sum())
            if stray > 3:
                worst_stray_frac = max(worst_stray_frac,
                                       stray / max(1, int(disagree.sum())))
    if name in AGREEMENT_CONFIGS:
        out = {"name": name, "metric": "agree",
               "value": round(worst_agree, 5)}
        if name in CHAOTIC_CONFIGS:
            out["stray"] = round(worst_stray_frac, 5)
        print(json.dumps(out))
    else:
        print(json.dumps({"name": name, "metric": "psnr",
                          "value": round(worst_psnr, 1)}))


def worker_render(name: str, out_path: str) -> None:
    key, w, h, ssaa, sub, n, kwargs = FUSED_CONFIGS[name]
    frames, _, _ = render_frames(key, w, h, ssaa, sub, n, kwargs)
    np.save(out_path, frames)


def run_worker(argv: list[str], extra_env: dict | None = None) -> str:
    env = dict(os.environ, **(extra_env or {}))
    if env.get("JAX_PLATFORMS") == "cpu":
        # The axon sitecustomize registers the remote TPU PJRT plugin off
        # these; JAX_PLATFORMS=cpu alone is not enough (see __graft_entry__).
        for key in ("JAX_PLATFORM_NAME", "TPU_LIBRARY_PATH",
                    "PALLAS_AXON_POOL_IPS"):
            env.pop(key, None)
    proc = subprocess.run([sys.executable, str(Path(__file__).resolve()), *argv],
                          env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"worker {argv} failed")
    return proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""


def main() -> None:
    cpu = "--cpu" in sys.argv
    base_env = {"JAX_PLATFORMS": "cpu", "SHADERFLOW_NO_COMPILE_CACHE": "1"} if cpu else {}
    rows = []

    for name in ORACLE_CONFIGS:
        print(f"== oracle: {name} ==", file=sys.stderr, flush=True)
        line = run_worker(["--worker-oracle", name], base_env)
        result = json.loads(line)
        rows.append((f"oracle/{result['metric']}", name, result["value"],
                     result.get("stray")))
        print(line, file=sys.stderr, flush=True)

    import tempfile
    for name in FUSED_CONFIGS:
        print(f"== fused-vs-ref: {name} ==", file=sys.stderr, flush=True)
        with tempfile.TemporaryDirectory() as tmp:
            fused, ref = f"{tmp}/fused.npy", f"{tmp}/ref.npy"
            run_worker(["--worker-render", name, fused], base_env)
            run_worker(["--worker-render", name, ref],
                       dict(base_env, SHADERFLOW_NO_TAILFUSE="1"))
            a, b = np.load(fused), np.load(ref)
            value = psnr(a, b)
            step = int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max())
            rows.append(("fused-vs-ref", name, round(value, 1), step))
            print(f"{name}: {value:.1f} dB, max {step} u8 step",
                  file=sys.stderr, flush=True)

    # bf16 tail color mode vs the f32 reference path (the gate that decides
    # whether SHADERFLOW_TAIL_BF16 may ship enabled — ROADMAP r4)
    if "visualizer" in FUSED_CONFIGS:
        print("== bf16-tail-vs-ref: visualizer ==", file=sys.stderr, flush=True)
        with tempfile.TemporaryDirectory() as tmp:
            bf16, ref = f"{tmp}/bf16.npy", f"{tmp}/ref.npy"
            run_worker(["--worker-render", "visualizer", bf16],
                       dict(base_env, SHADERFLOW_TAIL_BF16="1"))
            run_worker(["--worker-render", "visualizer", ref],
                       dict(base_env, SHADERFLOW_NO_TAILFUSE="1"))
            a, b = np.load(bf16), np.load(ref)
            value = psnr(a, b)
            step = int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max())
            rows.append(("bf16-tail-vs-ref", "visualizer", round(value, 1), step))
            print(f"visualizer bf16: {value:.1f} dB, max {step} u8 step",
                  file=sys.stderr, flush=True)

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    import jax
    device = "CPU (smoke)" if cpu else str(jax.devices()[0])
    lines = [
        "# PSNR parity gate",
        "",
        f"Measured {stamp} on `{device}` (`python tools/psnr_gate.py`).",
        f"Acceptance bar (BASELINE.md): >= {BAR_DB:.0f} dB. Regenerate after",
        "any kernel/precision change; BENCHMARKS.md cites this table.",
        "",
        "| Check | Config | Value | Max u8 step | Passes |",
        "|---|---|---|---|---|",
    ]
    failed = []
    for kind, name, value, step in rows:
        if kind == "oracle/agree":
            if name in CHAOTIC_CONFIGS:
                # step carries the worst stray-flip fraction here: the
                # relaxed bar only applies while flips stay on the
                # escape boundary (see CHAOTIC_CONFIGS comment)
                stray = step if step is not None else 1.0
                ok = value >= AGREE_BAR or (
                    value >= AGREE_BAR_CHAOTIC and stray <= 0.05)
                shown = (f"{value:.2%} exact-pixel agreement "
                         f"({stray:.1%} of flips off-boundary)")
                step = None
            else:
                ok = value >= AGREE_BAR
                shown = f"{value:.2%} exact-pixel agreement"
        else:
            ok = value >= BAR_DB
            shown = f"{value:.1f} dB"
        if not ok:
            failed.append(name)
        lines.append(f"| {kind} | {name} | {shown} "
                     f"| {'—' if step is None else step} "
                     f"| {'yes' if ok else '**NO**'} |")
    lines.append("")
    (REPO / "PSNR_GATE.md").write_text("\n".join(lines))
    print("\n".join(lines))
    if failed:
        print(f"GATE FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    if "--worker-oracle" in sys.argv:
        worker_oracle(sys.argv[sys.argv.index("--worker-oracle") + 1])
    elif "--worker-render" in sys.argv:
        index = sys.argv.index("--worker-render")
        worker_render(sys.argv[index + 1], sys.argv[index + 2])
    else:
        main()
