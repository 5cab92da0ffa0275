"""Perceptual image distance: real LPIPS (VGG-16) + a self-contained proxy.

The reference environment ships LPIPS via the `lpips` torch package + VGG
weights (environment.yml: stlpips-pytorch/pyiqa; SURVEY.md §5.5). This module
provides:

1. `lpips` — the standard LPIPS-VGG metric (Zhang et al. 2018) implemented
   in JAX: VGG-16 features at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-
   normalized, squared-diff, learned 1x1 linear heads, spatial average,
   summed over layers. Weights are LOADED from a user-supplied file
   (`load_lpips_weights`): either an .npz in our own layout or a torch
   state_dict combining torchvision VGG-16 `features.*` weights with the
   official `lpips` package's `lin*.model.1.weight` heads. No weights ship
   in this container (zero egress), so on a weightless machine callers fall
   back to (2).

2. `lpips_proxy` — a deterministic stand-in: an LPIPS-shaped distance over a
   multi-scale pyramid of RANDOM (seeded, fixed) convolutional features with
   per-channel unit normalization — the "randomly initialized networks are
   surprisingly good perceptual metrics" construction (Amir & Weiss,
   2021-style). Monotone with perceptual degradation and suitable for
   RELATIVE comparisons between renders of the same scene, but its absolute
   scale is NOT calibrated LPIPS — reports label it `lpips_proxy`, never
   `lpips`.
"""

from __future__ import annotations

import functools
import os

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


# ---------------------------------------------------------------------------
# Real LPIPS (VGG-16 backbone, learned linear heads) — weights loaded from
# disk. Architecture per Zhang et al. 2018 / the `lpips` package's
# LPIPS(net='vgg'): torchvision VGG-16 config-D features, taps after the
# ReLU of conv{1_2,2_2,3_3,4_3,5_3}.
# ---------------------------------------------------------------------------

# (out_channels, in_channels) of VGG-16's 13 convs; `M` pools sit before
# convs 2, 4, 7, 10 (0-indexed positions in _VGG_POOL_BEFORE).
_VGG_CHANNELS = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]
_VGG_POOL_BEFORE = {2, 4, 7, 10}       # maxpool precedes these conv indices
_VGG_TAPS = (1, 3, 6, 9, 12)           # conv indices whose ReLU output is tapped
_LPIPS_TAP_CHANNELS = (64, 128, 256, 512, 512)
# torchvision `features.{idx}` indices of the 13 convs
_TORCHVISION_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

# the lpips package's input ScalingLayer constants
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_torch_lpips(state: dict) -> dict:
    """Build our weight dict from a torch-style state_dict mapping.

    Accepts torchvision VGG-16 naming (`features.{i}.weight/bias`, possibly
    under a `net.` prefix) merged with the `lpips` package's linear heads
    (`lin{j}.model.1.weight`, possibly under `lins.{j}.` naming). Values may
    be torch tensors or numpy arrays.
    """
    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    flat = {k.removeprefix("net."): v for k, v in state.items()}
    out = {}
    for i, tv_idx in enumerate(_TORCHVISION_CONV_IDX):
        for suffix, name in (("weight", f"conv{i}_w"), ("bias", f"conv{i}_b")):
            key = f"features.{tv_idx}.{suffix}"
            if key not in flat:
                raise KeyError(f"LPIPS weight file missing {key}")
            out[name] = to_np(flat[key])
    for j in range(5):
        for key in (f"lin{j}.model.1.weight", f"lins.{j}.model.1.weight",
                    f"lin{j}.weight"):
            if key in flat:
                out[f"lin{j}"] = to_np(flat[key]).reshape(-1)
                break
        else:
            raise KeyError(f"LPIPS weight file missing lin{j}")
    _check_lpips_shapes(out)
    return out


def _check_lpips_shapes(w: dict):
    for i, (cout, cin) in enumerate(_VGG_CHANNELS):
        assert w[f"conv{i}_w"].shape == (cout, cin, 3, 3), (
            f"conv{i}_w shape {w[f'conv{i}_w'].shape} != {(cout, cin, 3, 3)}")
        assert w[f"conv{i}_b"].shape == (cout,)
    for j, c in enumerate(_LPIPS_TAP_CHANNELS):
        assert w[f"lin{j}"].shape == (c,), (
            f"lin{j} shape {w[f'lin{j}'].shape} != ({c},)")


def load_lpips_weights(path: str) -> dict:
    """Load LPIPS-VGG weights from `.npz` (keys conv{i}_w/conv{i}_b for the
    13 VGG convs in OIHW + lin0..lin4 per-channel head weights) or a torch
    checkpoint (`.pt`/`.pth` state_dict, see `convert_torch_lpips`)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            w = {k: np.asarray(z[k], np.float32) for k in z.files}
        if "lin0" not in w or "conv0_w" not in w:
            raise KeyError("npz missing conv{i}_w/lin{j} keys")
        w = {k: (v.reshape(-1) if k.startswith("lin") else v)
             for k, v in w.items()}
        _check_lpips_shapes(w)
        return w
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state:
        state = state["state_dict"]
    return convert_torch_lpips(state)


def default_lpips_weights_path() -> str | None:
    """Weight-file discovery: $SCORP_LPIPS_WEIGHTS, else the conventional
    cache location if present."""
    env = os.environ.get("SCORP_LPIPS_WEIGHTS")
    if env:
        return env
    cached = os.path.expanduser("~/.cache/scorp_tpu/lpips_vgg.npz")
    return cached if os.path.exists(cached) else None


@jax.jit
def _lpips_jit(x, y, weights):
    def features(img):                     # img: [1, 3, H, W] in [-1, 1]
        h = (img - jnp.asarray(_LPIPS_SHIFT)[None, :, None, None]) / \
            jnp.asarray(_LPIPS_SCALE)[None, :, None, None]
        taps = []
        for i in range(len(_VGG_CHANNELS)):
            if i in _VGG_POOL_BEFORE:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
            h = jax.nn.relu(
                _conv(h, weights[f"conv{i}_w"])
                + weights[f"conv{i}_b"][None, :, None, None])
            if i in _VGG_TAPS:
                taps.append(h)
        return taps

    total = jnp.float32(0.0)
    for j, (fx, fy) in enumerate(zip(features(x), features(y))):
        d = _unit_normalize(fx) - _unit_normalize(fy)
        lin = weights[f"lin{j}"][None, :, None, None]
        total = total + jnp.mean(jnp.sum(lin * d * d, axis=1))
    return total


def lpips(img0: jnp.ndarray, img1: jnp.ndarray, weights: dict) -> jnp.ndarray:
    """Calibrated LPIPS-VGG distance between two [3, H, W] images in [0, 1].

    `weights` from `load_lpips_weights`. Matches the `lpips` package's
    LPIPS(net='vgg') computation graph (scaling layer, VGG-16 taps, unit
    normalization, 1x1 linear heads, spatial average, layer sum).
    """
    x = (jnp.asarray(img0)[None] * 2.0 - 1.0).astype(jnp.float32)
    y = (jnp.asarray(img1)[None] * 2.0 - 1.0).astype(jnp.float32)
    return _lpips_jit(x, y, {k: jnp.asarray(v) for k, v in weights.items()})
