from svol_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh_plan,
    param_partition_spec,
)

__all__ = ["MeshPlan", "make_mesh_plan", "param_partition_spec"]
