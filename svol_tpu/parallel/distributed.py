"""Multi-host initialization.

The reference bootstraps with torch.distributed NCCL env:// rendezvous under
torchrun (train.py:362-366). JAX's single-controller SPMD equivalent is one
``jax.distributed.initialize`` per host before any device use; afterwards
``jax.devices()`` spans the whole pod and the Mesh in parallel/mesh.py covers
every chip. Collectives ride ICI within a slice and DCN across slices —
placement follows from the mesh axis order, not from explicit comm calls.

On a single host (including this environment) initialization is a no-op.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running under a multi-host launcher.

    With no arguments, auto-detects the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars)
    and silently no-ops for single-host runs.
    """
    import jax

    coordinator_address = (
        coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not coordinator_address and os.environ.get("JAX_NUM_PROCESSES") is None:
        # single host: nothing to do
        return
    # jax.distributed.initialize does NOT read these env names itself (its
    # auto-detection covers SLURM / TPU-pod metadata only) — parse them here
    # or the call raises "Number of processes must be defined" on any
    # env-var-driven launch. Proven live by tests/test_multiprocess_smoke.py
    # (two real processes, gloo CPU collectives).
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
