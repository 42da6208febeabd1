"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real chip is reserved for benchmarking; tests exercise the same jitted
programs through XLA:CPU, including multi-chip sharding via the forced host
platform device count.

Note: this environment's sitecustomize registers the TPU PJRT plugin and
bakes JAX_PLATFORMS into the process env before conftest runs, so plain
os.environ tweaks are too late — jax.config.update is the reliable switch
(and skips the plugin's multi-minute tunnel initialization entirely).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compile cache targets the TPU path; on CPU it only adds
# cross-machine AOT feature-mismatch warnings to every test run
os.environ.setdefault("SHADERFLOW_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
