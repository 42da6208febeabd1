"""Visual QA: render one late frame of every example scene into a contact
sheet (tools/contact_sheet.py -> /tmp/contact_sheet.png). Run on CPU; eyeball
after engine/ops changes — golden tests only cover five scenes."""

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", os.environ.get("SHEET_PLATFORM", "cpu"))

REPO = Path(__file__).parent.parent
for sub in ("examples/basic", "examples/fractals", "examples"):
    sys.path.insert(0, str(REPO / sub))

import numpy as np
from PIL import Image, ImageDraw

import demo
import fractals
import piano_roll

SCENES = [demo.Basic, demo.ShaderToy, demo.MultiShader, demo.Multipass,
          demo.MotionBlur, demo.Dynamics, demo.Video, demo.Waveform,
          demo.MusicBars, demo.Visualizer, demo.RayMarch, demo.Life,
          fractals.Mandelbrot, fractals.Julia, fractals.Tetration,
          piano_roll.PianoRoll]


def main(width=192, height=108, out="/tmp/contact_sheet.png"):
    tiles = []
    for cls in SCENES:
        try:
            with tempfile.TemporaryDirectory() as tmp:
                scene = cls()
                frames = 12 if cls in (demo.Life, demo.MotionBlur) else 4
                scene.main(width=width, height=height, fps=10, time=frames / 10,
                           output=str(Path(tmp) / "o.rgb"))
                array = np.fromfile(Path(tmp) / "o.rgb", np.uint8)
                image = Image.fromarray(array.reshape(-1, height, width, 3)[-1])
        except Exception as error:
            image = Image.new("RGB", (width, height), (120, 0, 0))
            print(f"{cls.__name__}: FAILED {error}")
        ImageDraw.Draw(image).text((4, 2), cls.__name__, fill=(255, 255, 0))
        tiles.append(image)

    cols = 4
    rows = (len(tiles) + cols - 1) // cols
    sheet = Image.new("RGB", (cols * width, rows * height))
    for index, tile in enumerate(tiles):
        sheet.paste(tile, ((index % cols) * width, (index // cols) * height))
    sheet.save(out)
    print(f"saved {out} ({sheet.size[0]}x{sheet.size[1]})")


if __name__ == "__main__":
    main()
