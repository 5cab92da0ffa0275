from .common import (  # noqa: F401
    TILE,
    Preprocessed,
    RasterConfig,
    StreamBins,
    TileBins,
    bin_gaussians,
    bin_stream,
    grid_dims,
    preprocess,
)
from .xla import RasterOutput, rasterize_naive, rasterize_xla  # noqa: F401


def rasterize(*args, backend: str = "auto", **kwargs):
    """Backend-dispatching differentiable rasterizer.

    "pallas" = production TPU kernels (custom VJP); "xla" = pure-XLA golden
    path (autodiff; the only option on CPU); "auto" picks by platform.
    """
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        from .pallas import rasterize_pallas

        return rasterize_pallas(*args, **kwargs)
    kwargs.pop("interpret", None)
    return rasterize_xla(*args, **kwargs)


def rasterize_surfel(*args, backend: str = "auto", **kwargs):
    """Backend-dispatching differentiable 2DGS surfel rasterizer.

    "pallas" = TPU fwd+bwd kernels (custom VJP, pallas_surfel_train);
    "xla" = pure-JAX autodiff path (the golden reference, only option on CPU).
    """
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        from .pallas_surfel_train import rasterize_surfel_pallas

        return rasterize_surfel_pallas(*args, **kwargs)
    from .surfel import rasterize_surfel_xla

    kwargs.pop("interpret", None)
    return rasterize_surfel_xla(*args, **kwargs)
