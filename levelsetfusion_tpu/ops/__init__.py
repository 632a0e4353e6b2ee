from levelsetfusion_tpu.ops import derivatives, interpolation, sobolev, terms, tsdf, pyramid

__all__ = ["derivatives", "interpolation", "sobolev", "terms", "tsdf", "pyramid"]
