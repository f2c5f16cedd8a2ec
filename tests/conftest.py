"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX's standard trick for testing multi-chip sharding without hardware
(SURVEY.md §4): force the host platform and split it into 8 virtual devices.
The env vars must be set before the first backend initialization; the
``jax_platforms`` config update overrides the axon TPU plugin that this
image's sitecustomize registers in every interpreter.
"""
import os

from svol_tpu.utils.cpu_mesh import set_virtual_cpu_mesh_flags

# 8 virtual devices + raised CPU-collective rendezvous timeouts (the default
# terminate timeout SIGABRTs under 1-core scheduling skew — see cpu_mesh.py)
set_virtual_cpu_mesh_flags(n_devices=8)

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
