"""Regenerate the golden frames (run deliberately after intended visual
changes): python tests/regen_golden.py"""

import os
import sys
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parent.parent))

from test_golden import GOLDEN, load_scene, render_last_frame  # noqa: E402

if __name__ == "__main__":
    from PIL import Image
    GOLDEN.mkdir(exist_ok=True)
    for name in ["basic", "shadertoy", "mandelbrot", "tetration", "raymarch"]:
        frame = render_last_frame(load_scene(name))
        Image.fromarray(frame).save(GOLDEN / f"{name}.png")
        print(f"regenerated {name}")
