"""Device mesh + sharding layout.

The reference's distribution story is apex DDP over NCCL (train.py:124,
configs.py:44) — data parallel only (SURVEY.md §2 parallelism checklist).
The TPU-native equivalent is declarative: one ``jax.sharding.Mesh``, batch
arrays sharded over the ``data`` axis, parameters replicated. Gradient
averaging falls out of jit-compiling ``value_and_grad`` on sharded inputs —
XLA inserts the psum over ICI; there is no DDP wrapper, no delay_allreduce,
no explicit barrier (SPMD programs are implicitly synchronized).

Beyond parity, the plan carries an optional ``seq`` axis for sharding the
video-token dimension (context parallelism over frames) — a new capability
for long clips the reference cannot express (SURVEY.md §5 long-context).
Multi-host topologies initialize via ``jax.distributed.initialize`` before
mesh construction; each host feeds its own data shard
(pipeline.build_loader(shard_index=process_index)).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    mesh: Mesh
    batch_spec: P  # activations/inputs: shard batch over 'data'
    replicated_spec: P  # parameters/optimizer state

    @property
    def data_axis_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def seq_axis_size(self) -> int:
        return self.mesh.shape["seq"]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec)

    def video_sharding(self) -> NamedSharding:
        """Sequence parallelism: the frame axis of video tensors shards over
        'seq'. Frames are independent through the whole conv trunk, so the
        backbone runs model-parallel with zero communication; XLA inserts
        the all-gather exactly where the head first needs the full token
        sequence. A new capability — the reference is DP-only (SURVEY §2)."""
        return NamedSharding(self.mesh, P("data", "seq"))

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.replicated_spec)

    def shard_batch(self, tree: Any) -> Any:
        """Place a host batch onto the mesh: batch dim over 'data', and —
        when the mesh has a non-trivial 'seq' axis — the frame dim of
        (B, T, ...) video tensors over 'seq'."""
        batch_sh = self.batch_sharding()
        video_sh = self.video_sharding() if self.seq_axis_size > 1 else batch_sh

        def place(x):
            arr = np.asarray(x) if not hasattr(x, "ndim") else x
            if (
                self.seq_axis_size > 1
                and arr.ndim >= 2
                and arr.shape[1] % self.seq_axis_size == 0
                and arr.ndim != 2  # (B, 1) masks stay data-sharded
            ):
                return jax.device_put(arr, video_sh)
            return jax.device_put(arr, batch_sh)

        return jax.tree.map(place, tree)

    def replicate(self, tree: Any) -> Any:
        sharding = self.replicated_sharding()
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_mesh_plan(
    num_devices: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
    seq_axis: int = 1,
) -> MeshPlan:
    """Build a ('data', 'seq') mesh. seq_axis=1 (default) means pure DP."""
    if devices is None:
        devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % seq_axis == 0, (n, seq_axis)
    dev_array = np.asarray(devices).reshape(n // seq_axis, seq_axis)
    mesh = Mesh(dev_array, axis_names=("data", "seq"))
    return MeshPlan(mesh=mesh, batch_spec=P("data"), replicated_spec=P())
