"""Run another tool on XLA:CPU in this axon-baked environment.

The image's sitecustomize registers the TPU PJRT plugin at interpreter
start and the plugin wins over a shell-set JAX_PLATFORMS=cpu — the only
reliable switch is jax.config.update after import (tests/conftest.py does
the same). Use this wrapper to smoke-test chip tools host-side without
touching (or waiting on) the tunnel device:

    python tools/cpu_run.py tools/bench_preview.py
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

path = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(path, run_name="__main__")
