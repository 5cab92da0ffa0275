from . import graphic, gs_transform, image_utils, mask3d, matching, sh_rotation, solvers, views  # noqa: F401
