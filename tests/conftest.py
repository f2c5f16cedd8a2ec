"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX's standard trick for testing multi-chip sharding without hardware
(SURVEY.md §4): force the host platform and split it into 8 virtual devices.
The env vars must be set before the first backend initialization; the
``jax_platforms`` config update overrides the axon TPU plugin that this
image's sitecustomize registers in every interpreter.

Stability on this 1-core host (hard-won, round 2 — core-dump root causes):
  * collective rendezvous timeouts raised (cpu_mesh.py) — the defaults
    LOG(FATAL) the process under scheduling skew;
  * async CPU dispatch off — an async computation still draining the
    XLA:CPU Eigen pool when the next 8-shard program dispatches can
    wedge the pool into a cross-program deadlock (all workers parked in
    blocking collective waits, the missing participant queued behind them);
  * torch-importing test modules run LAST (collection reorder below): the
    observed deadlock/abort always struck the first sharded train step
    executed after torch was loaded into the process.
"""
import os

from svol_tpu.utils.cpu_mesh import set_virtual_cpu_mesh_flags

#   * 16 virtual devices but 8-device meshes (SVOL_MESH_DEVICES): XLA:CPU
#     sizes its worker pool by device count and its collective waits BLOCK
#     workers — on exactly-n devices an n-shard program can park all n
#     workers at a rendezvous while the missing participant's producer task
#     waits in the queue (deadlock; struck ~50% of full-suite runs). Eight
#     always-free workers break the cycle structurally.
set_virtual_cpu_mesh_flags(n_devices=16, terminate_secs=1800)
os.environ.setdefault("SVOL_MESH_DEVICES", "8")
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip XLA recompilation.
# Host-fingerprinted — XLA:CPU AOT entries from a different VM/CPU would
# SIGILL/abort if loaded (svol_tpu/utils/compile_cache.py).
from svol_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest

_TORCH_MODULES = ("test_torch_parity", "test_torch_port",
                  "test_full_model_parity", "test_reference_port",
                  "test_e2e_jsonl_parity", "test_optimizer_parity",
                  "test_parity_report")


def pytest_collection_modifyitems(session, config, items):
    # stable partition: torch-importing modules move to the end, everything
    # else keeps its order — no sharded-mesh program then runs after torch
    # is in the process (see module docstring)
    items.sort(key=lambda it: any(m in it.nodeid for m in _TORCH_MODULES))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
