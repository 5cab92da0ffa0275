from . import sh, quat, camera, plyio, colmap  # noqa: F401
