from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
from .render_dp import dp_render  # noqa: F401
from .train_dp import dp_train_step, dp_train_step_2d  # noqa: F401
