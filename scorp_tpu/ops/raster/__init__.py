from .common import TILE, Preprocessed, RasterConfig, TileBins, bin_gaussians, grid_dims, preprocess  # noqa: F401
from .xla import RasterOutput, rasterize_naive, rasterize_xla  # noqa: F401
