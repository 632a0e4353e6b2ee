from levelsetfusion_tpu.parallel.hierarchical import solve_hierarchical_sharded
from levelsetfusion_tpu.parallel.mesh import make_mesh
from levelsetfusion_tpu.parallel.schur import solve_single_level_schur
from levelsetfusion_tpu.parallel.schur2d import solve_single_level_schur2d
from levelsetfusion_tpu.parallel.sharded import solve_single_level_sharded

__all__ = [
    "make_mesh",
    "solve_hierarchical_sharded",
    "solve_single_level_schur",
    "solve_single_level_schur2d",
    "solve_single_level_sharded",
]
