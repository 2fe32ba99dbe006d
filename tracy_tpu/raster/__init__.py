from tracy_tpu.raster.rasterizer import render_raster

__all__ = ["render_raster"]
