"""Image-quality evaluation harness: PSNR / SSIM / LPIPS over rendered vs
ground-truth image directories.

The reference implements PSNR/MSE (gs3dgs/utils/image_utils.py:15-20) and
SSIM (loss_utils.py:43-73) and lists LPIPS parity in its benchmark gate
without an in-repo LPIPS call (SURVEY.md §5.5) — this harness closes that
gap. LPIPS uses the `lpips` torch package when available; otherwise it
falls back to `ops.perceptual.lpips_proxy` — a deterministic random-feature
perceptual distance (reported as `lpips_proxy`, not `lpips`: useful for
relative comparisons, not calibrated to the published LPIPS scale).

Usage: python -m scorp_tpu.apps.metrics --pred <dir> --gt <dir> [--use_alpha]
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ..ops.losses import psnr as psnr_fn
from ..ops.losses import ssim as ssim_fn


def _load(path: str, size=None) -> tuple[np.ndarray, np.ndarray | None]:
    with Image.open(path) as img:
        if size is not None and img.size != size:
            img = img.resize(size)
        arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    alpha = arr[..., 3] if arr.shape[-1] == 4 else None
    return arr[..., :3].transpose(2, 0, 1), alpha


class LPIPSBackend:
    """Calibrated LPIPS when weights are reachable, proxy otherwise.

    Resolution order: (1) a weight file (--lpips_weights flag, else
    $SCORP_LPIPS_WEIGHTS / ~/.cache/scorp_tpu/lpips_vgg.npz) driving the
    in-repo JAX LPIPS-VGG (`ops.perceptual.lpips`); (2) the `lpips` torch
    package if installed with its weights; (3) the bundled `lpips_proxy`
    (reported under that name — never conflated with real LPIPS)."""

    def __init__(self, weights_path: str | None = None):
        self._fn = None
        self.name = None
        from ..ops import perceptual

        path = weights_path or perceptual.default_lpips_weights_path()
        if path:
            weights = perceptual.load_lpips_weights(path)  # raises on bad file

            def run(a, b):
                return float(perceptual.lpips(a, b, weights))

            self._fn = run
            self.name = "lpips"
            return
        try:
            import lpips  # type: ignore
            import torch

            net = lpips.LPIPS(net="vgg")

            def run(a, b):
                ta = torch.from_numpy(a[None] * 2 - 1)
                tb = torch.from_numpy(b[None] * 2 - 1)
                with torch.no_grad():
                    return float(net(ta, tb).item())

            self._fn = run
            self.name = "lpips"
        except Exception:
            def run(a, b):
                return float(perceptual.lpips_proxy(jnp.asarray(a), jnp.asarray(b)))

            self._fn = run
            self.name = "lpips_proxy"

    @property
    def available(self):
        return self._fn is not None

    def __call__(self, a: np.ndarray, b: np.ndarray):
        if not self.available:
            return None
        return self._fn(a.astype(np.float32), b.astype(np.float32))


def evaluate_dirs(pred_dir: str, gt_dir: str, use_alpha: bool = False,
                  lpips_weights: str | None = None) -> dict:
    names = sorted(
        n for n in os.listdir(pred_dir) if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise FileNotFoundError(f"no images in {pred_dir}")
    lp = LPIPSBackend(lpips_weights)
    psnrs, ssims, lpipss = [], [], []
    for name in names:
        gt_path = os.path.join(gt_dir, name)
        if not os.path.exists(gt_path):
            base = name.rsplit(".", 1)[0]
            cands = [f for f in os.listdir(gt_dir) if f.rsplit(".", 1)[0] == base]
            if not cands:
                print(f"skipping {name}: no ground truth")
                continue
            gt_path = os.path.join(gt_dir, cands[0])
        pred, pred_a = _load(os.path.join(pred_dir, name))
        gt, gt_a = _load(gt_path, size=(pred.shape[2], pred.shape[1]))
        if use_alpha and (pred_a is not None or gt_a is not None):
            alpha = pred_a if pred_a is not None else gt_a
            pred = pred * alpha[None]
            gt = gt * alpha[None]
        psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt)).mean()))
        ssims.append(float(ssim_fn(jnp.asarray(pred), jnp.asarray(gt))))
        v = lp(pred, gt)
        if v is not None:
            lpipss.append(v)
    result = {
        "n_images": len(psnrs),
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        # keyed by backend: calibrated `lpips` or the bundled random-feature
        # `lpips_proxy` stand-in — never conflated
        (lp.name or "lpips"): float(np.mean(lpipss)) if lpipss else None,
        "lpips_backend": lp.name,
    }
    return result


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--pred", type=str, required=True)
    parser.add_argument("--gt", type=str, required=True)
    parser.add_argument("--use_alpha", action="store_true",
                        help="mask both images by the prediction's alpha")
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="LPIPS-VGG weight file (.npz or torch state_dict); "
                             "default $SCORP_LPIPS_WEIGHTS or "
                             "~/.cache/scorp_tpu/lpips_vgg.npz")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    print(json.dumps(evaluate_dirs(args.pred, args.gt, args.use_alpha,
                                   lpips_weights=args.lpips_weights)))


if __name__ == "__main__":
    main()
