"""Component-level timing of the visualizer pipeline on the live device.

Times stripped-down variants of the flagship scene to locate the hot spots:
each variant renders WARM+N frames at 1080p60 ssaa=2 through the real
engine; reported cost is steady-state seconds/frame.
"""
import os, sys, time
from pathlib import Path
REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples" / "basic"))

import jax
import jax.numpy as jnp
import demo
from shaderflow_tpu import ops
from shaderflow_tpu.ops import vec2, vec4, clamp, smoothstep, mix, length, rotate2d

N = int(os.environ.get("PROFILE_FRAMES", 24))
W, H, FPS, SSAA = 1920, 1080, 60.0, float(os.environ.get("PROFILE_SSAA", 2.0))
BATCH = int(os.environ.get("PROFILE_BATCH", 8))


def time_scene(name, scene):
    scene._setup_run(width=W, height=H, fps=FPS, time=(N + BATCH) / FPS,
                     ssaa=SSAA, freewheel=True)
    engine = scene.engine
    # Warmup batch (compile)
    engine.begin_batch()
    for _ in range(BATCH):
        scene.next(dt=scene.frametime)
    t0 = time.monotonic()
    jax.block_until_ready(engine.flush(BATCH, pad_to=BATCH))
    compile_s = time.monotonic() - t0
    # Timed batches
    t0 = time.monotonic()
    done = 0
    while done < N:
        engine.begin_batch()
        for _ in range(BATCH):
            scene.next(dt=scene.frametime)
        jax.block_until_ready(engine.flush(BATCH, pad_to=BATCH))
        done += BATCH
    per_frame = (time.monotonic() - t0) / done
    print(f"{name:<28} {per_frame*1000:8.1f} ms/frame  ({1/per_frame:7.1f} fps)  warm+compile {compile_s:.1f}s", flush=True)


def variant(frag):
    class V(demo.Visualizer):
        def build(self):
            super().build()
            self.shader.fragment = frag
    return V()


def frag_flat(sf):
    return vec4(jnp.broadcast_to(sf.iTime * 0 + 0.5, sf.astuv.shape[:-1]), 0.3, 0.2, 1.0)

def frag_camera_only(sf):
    cam = sf.camera
    return vec4(cam.gluv[..., 0], cam.gluv[..., 1], 0.0, 1.0)

def frag_bg_sample(sf):
    from shaderflow_tpu.ops.sampling import sample_separable
    cam = sf.camera
    gx, gy = cam.gluv[0, :, 0], cam.gluv[:, 0, 1]
    z = 0.95 + 0.01 * jnp.sin(sf.iTime) - 0.02 * sf.iAudioVolume - 0.03
    qx = ((gx + 1) / 2 - 0.5) * z * z + 0.5
    qy = ((gy + 1) / 2 - 0.5) * z * z + 0.5
    tex = sf.tex("background")
    u = ((2 * qx - 1) * tex.height / tex.width + 1) / 2
    return ops.with_alpha(sample_separable(tex, u, qy), 1.0)

def frag_bg_pointwise(sf):
    cam = sf.camera
    z = 0.95 + 0.01 * jnp.sin(sf.iTime) - 0.02 * sf.iAudioVolume - 0.03
    q = ((cam.gluv + 1) / 2 - 0.5) * z * z + 0.5
    return ops.with_alpha(sf.stexture("background", q), 1.0)

def frag_bg_blur(sf):
    from shaderflow_tpu.ops.sampling import Sampler2D, convolve2d, sample_separable, splat_kernel
    import math
    cam = sf.camera
    gx, gy = cam.gluv[0, :, 0], cam.gluv[:, 0, 1]
    z = 0.95
    qx = ((gx + 1) / 2 - 0.5) * z * z + 0.5
    qy = ((gy + 1) / 2 - 0.5) * z * z + 0.5
    tex = sf.tex("background")
    u = ((2 * qx - 1) * tex.height / tex.width + 1) / 2
    intensity = 0.01 * clamp(jnp.power(jnp.maximum(sf.iAudioVolume, 0.0), 2.5), 0, 0.3)
    taps = jnp.asarray([(math.cos(ops.TAU*d/8)*s/10, math.sin(ops.TAU*d/8)*s/10)
                        for d in range(8) for s in range(1, 11)], jnp.float32) * intensity
    kern = splat_kernel(taps * jnp.asarray([tex.height, -tex.height]), 11)
    blurred = convolve2d(tex.data, kern)
    bt = Sampler2D(blurred, True, tex.repeat_x, tex.repeat_y)
    return ops.with_alpha(sample_separable(bt, u, qy), 1.0)

def frag_spectro(sf):
    circle = jnp.abs(ops.atan1n(sf.gluv))
    freq = jnp.sqrt(sf.texture("iSpectrogram", vec2(jnp.zeros_like(circle), circle))[..., 0:2] / 1000)
    return vec4(freq[..., 0], freq[..., 1], 0.0, 1.0)

def frag_waveform(sf):
    wave = sf.texture("iWaveform", vec2(sf.astuv[..., 0], 0.0))[..., 0:2]
    return vec4(wave[..., 0], wave[..., 1], 0.0, 1.0)


print(f"device={jax.devices()[0]} render={int(W*SSAA)}x{int(H*SSAA)} batch={BATCH}", flush=True)
time_scene("flat", variant(frag_flat))
time_scene("camera-only", variant(frag_camera_only))
time_scene("bg-separable", variant(frag_bg_sample))
time_scene("bg-pointwise-gather", variant(frag_bg_pointwise))
time_scene("bg-blur-conv", variant(frag_bg_blur))
time_scene("spectrogram-gather", variant(frag_spectro))
time_scene("waveform-gather", variant(frag_waveform))
time_scene("full-visualizer", demo.Visualizer())
