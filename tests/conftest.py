"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX's standard trick for testing multi-chip sharding without hardware
(SURVEY.md §4): force the host platform and split it into 8 virtual devices.
The env vars must be set before the first backend initialization; the
``jax_platforms`` config update overrides the axon TPU plugin that this
image's sitecustomize registers in every interpreter.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip XLA recompilation.
# Host-fingerprinted — XLA:CPU AOT entries from a different VM/CPU would
# SIGILL/abort if loaded (svol_tpu/utils/compile_cache.py).
from svol_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
