"""
GLSL authoring demo: scenes whose fragments are plain `.frag` files.

The reference's authoring format (GLSL fragments assembled by its
metaprogrammer, /root/reference/shaderflow/shader.py:186-239) runs here
as-is: assign a `.frag` path to `shader.fragment` and the GLSL front-end
(shaderflow_tpu/glsl.py) compiles it into the jitted render program.
Hot reload works the same as python shaders — edit the file mid-preview.

Run:  python -m shaderflow_tpu examples/glsl/glsl_demo.py Plasma main -o out.mp4
"""

from pathlib import Path

from shaderflow_tpu.scene import ShaderScene

SHADERS = Path(__file__).parent / "shaders"


class Plasma(ShaderScene):
    """Animated plasma rings, authored in GLSL (shaders/plasma.frag)"""

    def build(self):
        self.shader.fragment = SHADERS / "plasma.frag"


SCENES = [Plasma]

if __name__ == "__main__":
    from shaderflow_tpu.cli import launch
    launch(SCENES)
