"""Self-contained perceptual image distance (LPIPS-style proxy).

The reference environment ships LPIPS via the `lpips` torch package + VGG
weights (environment.yml: stlpips-pytorch/pyiqa; SURVEY.md §5.5). Neither the
package nor any pretrained weights exist in this container and there is no
network egress, so this module provides a deterministic stand-in:

an LPIPS-shaped distance over a multi-scale pyramid of RANDOM (seeded,
fixed) convolutional features with per-channel unit normalization — the
"randomly initialized networks are surprisingly good perceptual metrics"
construction (Amir & Weiss, 2021-style). It is monotone with perceptual
degradation and suitable for RELATIVE comparisons between renders of the
same scene, but its absolute scale is NOT calibrated LPIPS — reports label
it `lpips_proxy`, never `lpips`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LEVELS = 4
_CHANNELS = (16, 32, 64, 64)


@functools.lru_cache(maxsize=1)
def _filters():
    """Fixed random 3x3 conv banks, seeded — identical on every run."""
    rng = np.random.default_rng(1234)
    banks = []
    cin = 3
    for cout in _CHANNELS:
        w = rng.normal(0, 1, size=(cout, cin, 3, 3)).astype(np.float32)
        w -= w.mean(axis=(1, 2, 3), keepdims=True)
        w /= np.sqrt((w**2).sum(axis=(1, 2, 3), keepdims=True))
        banks.append(w)  # numpy: jnp conversion inside jit would cache tracers
        cin = cout
    return tuple(banks)


def _conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
    )


def _unit_normalize(f, eps=1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=1, keepdims=True) + eps)


@jax.jit
def lpips_proxy(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between two [3, H, W] images in [0, 1].

    0 for identical images; grows with structural/perceptual difference.
    """
    x = (img1[None] * 2.0 - 1.0).astype(jnp.float32)
    y = (img2[None] * 2.0 - 1.0).astype(jnp.float32)
    total = jnp.float32(0.0)
    for w in _filters():
        w = jnp.asarray(w)
        x = jax.nn.leaky_relu(_conv(x, w), 0.2)
        y = jax.nn.leaky_relu(_conv(y, w), 0.2)
        d = _unit_normalize(x) - _unit_normalize(y)
        total = total + jnp.mean(jnp.sum(d * d, axis=1))
        # stride-2 average pool between levels
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) * 0.25
        y = jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) * 0.25
    return total / _LEVELS
