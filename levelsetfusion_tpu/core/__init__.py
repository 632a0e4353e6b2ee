from levelsetfusion_tpu.core.grid import GridSpec, voxel_center_coordinates
from levelsetfusion_tpu.core.camera import PinholeCamera, Camera2d

__all__ = ["GridSpec", "voxel_center_coordinates", "PinholeCamera", "Camera2d"]
