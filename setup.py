"""Wheel build hook: bundle the example scenes into the package.

Reference parity: the reference force-includes its examples tree into the
wheel at shaderflow/resources/examples (/root/reference/pyproject.toml:47-48)
so `shaderflow <Scene> main` works out of the box from an install. Same
destination here: shaderflow_tpu/resources/examples, searched by
cli.bundled_scenes() after the source-tree sibling. Generated binary assets
(examples/assets/) are excluded — assets.py synthesizes them on demand into
a writable location.
"""

import shutil
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithExamples(build_py):
    def run(self):
        super().run()
        source = Path(__file__).parent / "examples"
        target = Path(self.build_lib) / "shaderflow_tpu" / "resources" / "examples"
        if source.is_dir():
            if target.exists():
                shutil.rmtree(target)
            shutil.copytree(
                source, target,
                ignore=shutil.ignore_patterns("assets", "__pycache__", "*.pyc"))


setup(cmdclass={"build_py": BuildWithExamples})
