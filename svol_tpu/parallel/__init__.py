from svol_tpu.parallel.mesh import MeshPlan, make_mesh_plan

__all__ = ["MeshPlan", "make_mesh_plan"]
