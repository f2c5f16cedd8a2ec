from svol_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh_plan,
    param_partition_spec,
)
from svol_tpu.parallel.pipeline import (
    microbatch_merge,
    microbatch_split,
    stack_transformer_layers,
    unstack_transformer_layers,
)

__all__ = [
    "MeshPlan",
    "make_mesh_plan",
    "param_partition_spec",
    "microbatch_merge",
    "microbatch_split",
    "stack_transformer_layers",
    "unstack_transformer_layers",
]
