from levelsetfusion_tpu.models.params import SolverParams, HierarchicalParams
from levelsetfusion_tpu.models.single_level import solve_single_level, SolveResult
from levelsetfusion_tpu.models.hierarchical import solve_hierarchical
from levelsetfusion_tpu.models.rigid import Sdf2SdfResult, solve_rigid_2d

__all__ = [
    "SolverParams",
    "HierarchicalParams",
    "solve_single_level",
    "SolveResult",
    "solve_hierarchical",
    "Sdf2SdfResult",
    "solve_rigid_2d",
]
