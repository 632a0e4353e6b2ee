from levelsetfusion_tpu.io import synthetic, datasets, depth

__all__ = ["synthetic", "datasets", "depth"]
