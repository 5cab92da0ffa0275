from . import knn, losses, raster  # noqa: F401
