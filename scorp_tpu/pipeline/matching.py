"""Pluggable pairwise feature matching (the L5 adapter boundary).

The reference's `get_pairwise_mask3r_features` (/root/reference/utils/
match.py:23-78) runs MASt3R ViT inference + reciprocal nearest-neighbor
matching. Per the adapter policy (SURVEY.md §7): external perception models
sit behind a narrow interface `match(imgA, imgB) -> (uv0, uv1)` with three
backends:

  * "precomputed" — loads matches from .npz artifacts on disk (enough to
    run every benchmark config without external checkpoints);
  * "sift" / "orb" — live classical matching via cv2 with a ratio test and
    reciprocal filtering (self-contained default);
  * "mast3r" — the torch MASt3R checkpoint, used when present under
    checkpoints/mast3r (optional; matches the reference exactly).

All backends replicate the reference post-processing: 3px border filter,
uniform subsample to n_points_per_cam, coordinates rescaled to the original
resolutions.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _postprocess(uv0, uv1, shape0, shape1, size0, size1, n_points: int):
    """Border filter + uniform subsample + rescale to original coords."""
    h0, w0 = shape0
    h1, w1 = shape1
    valid = (
        (uv0[:, 0] >= 3) & (uv0[:, 0] < w0 - 3) & (uv0[:, 1] >= 3) & (uv0[:, 1] < h0 - 3)
        & (uv1[:, 0] >= 3) & (uv1[:, 0] < w1 - 3) & (uv1[:, 1] >= 3) & (uv1[:, 1] < h1 - 3)
    )
    uv0, uv1 = uv0[valid], uv1[valid]
    num = uv0.shape[0]
    n_viz = min(n_points, num)
    if num == 0:
        return uv0.astype(int), uv1.astype(int)
    idx = np.round(np.linspace(0, num - 1, n_viz)).astype(int)
    uv0, uv1 = uv0[idx], uv1[idx]
    uv0 = (uv0 / np.array([[w0, h0]]) * np.array([size0])).astype(int)
    uv1 = (uv1 / np.array([[w1, h1]]) * np.array([size1])).astype(int)
    return uv0, uv1


class CV2Matcher:
    """Classical reciprocal feature matcher (SIFT by default)."""

    def __init__(self, method: str = "sift", n_features: int = 4096):
        import cv2

        self._cv2 = cv2
        if method == "sift":
            self.det = cv2.SIFT_create(nfeatures=n_features)
            self.norm = cv2.NORM_L2
        else:
            self.det = cv2.ORB_create(nfeatures=n_features)
            self.norm = cv2.NORM_HAMMING

    def __call__(self, image1: Image.Image, image2: Image.Image,
                 n_points_per_cam: int = 100, **_):
        cv2 = self._cv2
        a1 = cv2.cvtColor(np.array(image1.convert("RGB")), cv2.COLOR_RGB2GRAY)
        a2 = cv2.cvtColor(np.array(image2.convert("RGB")), cv2.COLOR_RGB2GRAY)
        k1, d1 = self.det.detectAndCompute(a1, None)
        k2, d2 = self.det.detectAndCompute(a2, None)
        if d1 is None or d2 is None or len(k1) < 4 or len(k2) < 4:
            return np.zeros((0, 2), int), np.zeros((0, 2), int)
        matcher = cv2.BFMatcher(self.norm, crossCheck=True)  # reciprocal NN
        matches = sorted(matcher.match(d1, d2), key=lambda m: m.distance)
        uv0 = np.array([k1[m.queryIdx].pt for m in matches])
        uv1 = np.array([k2[m.trainIdx].pt for m in matches])
        if len(uv0) == 0:
            return np.zeros((0, 2), int), np.zeros((0, 2), int)
        return _postprocess(
            uv0, uv1, a1.shape, a2.shape, image1.size, image2.size, n_points_per_cam
        )


class PrecomputedMatcher:
    """Loads (uv0, uv1) pairs from {dir}/{key}.npz with arrays uv0/uv1."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, image1, image2, n_points_per_cam: int = 100, key: str = "", **_):
        path = os.path.join(self.directory, f"{key}.npz")
        if not os.path.exists(path):
            return np.zeros((0, 2), int), np.zeros((0, 2), int)
        data = np.load(path)
        uv0, uv1 = data["uv0"], data["uv1"]
        n = min(n_points_per_cam, len(uv0))
        idx = np.round(np.linspace(0, len(uv0) - 1, n)).astype(int) if len(uv0) else []
        return uv0[idx].astype(int), uv1[idx].astype(int)


class MASt3RMatcher:
    """Torch MASt3R backend (loaded lazily; requires local checkpoint)."""

    CKPT = "checkpoints/mast3r/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth"

    def __init__(self, checkpoint: str | None = None, device: str = "cpu"):
        self.checkpoint = checkpoint or self.CKPT
        self.device = device
        self._model = None

    def _load(self):
        if self._model is None:
            from mast3r.model import AsymmetricMASt3R  # type: ignore

            self._model = AsymmetricMASt3R.from_pretrained(
                self.checkpoint, local_files_only=True
            ).to(self.device)
        return self._model

    def __call__(self, image1, image2, n_points_per_cam: int = 100, size: int = 1024, **_):
        from dust3r.inference import inference  # type: ignore
        from dust3r.utils.image import load_images_pil  # type: ignore
        from mast3r.fast_nn import fast_reciprocal_NNs  # type: ignore

        model = self._load()
        pair = load_images_pil([image1.copy(), image2.copy()], size=size, verbose=False)
        out = inference([tuple(pair)], model, self.device, batch_size=1, verbose=False)
        d1 = out["pred1"]["desc"].squeeze(0).detach()
        d2 = out["pred2"]["desc"].squeeze(0).detach()
        m0, m1 = fast_reciprocal_NNs(
            d1, d2, subsample_or_initxy1=8, device=self.device, dist="dot",
            block_size=2**13,
        )
        h0, w0 = (int(x) for x in out["view1"]["true_shape"][0])
        h1, w1 = (int(x) for x in out["view2"]["true_shape"][0])
        return _postprocess(m0, m1, (h0, w0), (h1, w1),
                            image1.size, image2.size, n_points_per_cam)


def get_matcher(backend: str = "auto", **kwargs):
    """Factory: auto prefers MASt3R when its checkpoint exists, else SIFT."""
    if backend == "auto":
        backend = "mast3r" if os.path.exists(MASt3RMatcher.CKPT) else "sift"
    if backend == "mast3r":
        return MASt3RMatcher(**kwargs)
    if backend == "precomputed":
        return PrecomputedMatcher(**kwargs)
    return CV2Matcher(method=backend, **kwargs)
