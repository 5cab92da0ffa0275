"""View-selection scoring and helpers.

Behavioral port of /root/reference/utils/views.py (host-side numpy/cv2 —
not on the TPU compute path): greedy selection of high-quality, mask-complete,
viewpoint-diverse object crops feeding proxy generation.

Scoring (views.py:174-199, 373-477):
  * image quality = 0.3·Laplacian-variance sharpness + 0.7·mask ratio;
  * mask ratio = fraction of alpha==255 pixels; images below the 0.3
    quantile are discarded;
  * mask completeness = contour area / convex-hull area;
  * greedy objective = 0.25·quality + 0.5·mask + 0.4·completeness +
    0.25·diversity, diversity = 0.5·min-max-normalized closest-camera
    distance + 0.5·z-axis angle difference (views.py:228-262);
  * selected crops are alpha-bbox cropped and upscaled 2x until
    >= 10000 px (views.py:39-52).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image
from scipy.spatial.distance import cdist

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg")


def get_xyxy_from_mask(mask: np.ndarray):
    """Bounding box (x1, y1, x2, y2) of the nonzero region of a mask."""
    if mask.sum() == 0:
        raise ValueError("No non-zero pixels found in the mask.")
    ys, xs = np.where(mask > 0)
    return (xs.min(), ys.min(), xs.max(), ys.max())


def post_process_rgba_imgs(rgba_imgs: list[np.ndarray]) -> list[Image.Image]:
    """Crop each RGBA image to its alpha bbox; upscale 2x until >= 10000 px."""
    out = []
    for rgba in rgba_imgs:
        rgba = np.asarray(rgba)
        left, top, right, bottom = get_xyxy_from_mask(rgba[:, :, 3])
        crop = Image.fromarray(rgba[top : bottom + 1, left : right + 1, :])
        while crop.size[0] * crop.size[1] < 10000:
            crop = crop.resize((crop.size[0] * 2, crop.size[1] * 2))
        out.append(crop)
    return out


def evaluate_mask_ratio(rgba_img: np.ndarray) -> float:
    alpha = rgba_img[:, :, 3]
    return np.count_nonzero(alpha == 255) / alpha.size


def evaluate_mask_shape_quality(alpha: np.ndarray) -> float:
    """Contour-area / convex-hull-area compactness of the mask."""
    contours, _ = cv2.findContours(
        (alpha == 255).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return 0.0
    area = sum(cv2.contourArea(c) for c in contours)
    hull_area = cv2.contourArea(cv2.convexHull(np.vstack(contours)))
    if hull_area == 0:
        return 0.0
    return area / hull_area


def calculate_image_quality(rgba_img: np.ndarray) -> float:
    gray = cv2.cvtColor(rgba_img, cv2.COLOR_RGBA2GRAY)
    sharpness = cv2.Laplacian(gray, cv2.CV_64F).var()
    return 0.3 * sharpness + 0.7 * evaluate_mask_ratio(rgba_img)


def camera_centers(t_w2c: np.ndarray, r_w2c: np.ndarray) -> np.ndarray:
    """[N,3] camera centers from W2C poses: -(Rᵀ t)."""
    return -(t_w2c[:, :, None] * r_w2c).sum(axis=1)


def viewpoint_diversity_score(t_w2c, r_w2c, current_idx, used_indices) -> float:
    """Min-max-normalized position distance + raw z-axis angle difference."""
    if not used_indices:
        return 1.0
    t_c2w = camera_centers(t_w2c, r_w2c)

    all_pos = cdist([t_c2w[current_idx]], t_c2w)[0]
    pos_raw = np.min(all_pos[used_indices])
    pos_min, pos_max = np.min(all_pos), np.max(all_pos)
    pos_score = (pos_raw - pos_min) / (pos_max - pos_min + 1e-8)

    current_z = r_w2c[current_idx][:, 2]
    all_z = r_w2c[:, :, 2]
    all_z = all_z / np.linalg.norm(all_z, axis=1)[:, None]
    current_z = current_z / np.linalg.norm(current_z)
    dot_used = np.dot(all_z, current_z)[used_indices]
    angle_score = np.min(1.0 - np.abs(dot_used))

    return 0.5 * pos_score + 0.5 * angle_score


def select_views(
    rgba_dir: str,
    image_names: list[str],
    img_num: int,
    t_w2c: np.ndarray,
    r_w2c: np.ndarray,
    quality_weight: float = 0.25,
    mask_weight: float = 0.5,
    diversity_weight: float = 0.25,
    completeness_weight: float = 0.4,
    mask_threshold: float = 0.3,
) -> tuple[list[int], list[np.ndarray]]:
    """Greedy quality/coverage/diversity view selection.

    Returns (selected indices, selected RGBA arrays).
    """
    rgba_imgs, quality, mask_scores, completeness = [], [], [], []
    for name in image_names:
        img = np.array(Image.open(os.path.join(rgba_dir, f"{name}.png")))
        rgba_imgs.append(img)
        quality.append(calculate_image_quality(img))
        mask_scores.append(evaluate_mask_ratio(img))
        completeness.append(evaluate_mask_shape_quality(img[:, :, 3]))

    quality = np.asarray(quality, np.float64)
    mask_scores = np.asarray(mask_scores, np.float64)
    quality = (quality - quality.min()) / max(quality.max() - quality.min(), 1e-12)
    mask_scores = (mask_scores - mask_scores.min()) / max(
        mask_scores.max() - mask_scores.min(), 1e-12
    )
    # drop low-coverage views (quantile threshold)
    mask_scores[mask_scores < np.quantile(mask_scores, mask_threshold)] = 0.0

    selected: list[int] = []
    remaining = {i for i in range(len(rgba_imgs)) if mask_scores[i] > 0}

    while len(selected) < img_num and remaining:
        best_score, best_idx = -np.inf, -1
        for idx in remaining:
            base = (
                quality_weight * quality[idx]
                + mask_weight * mask_scores[idx]
                + completeness_weight * completeness[idx]
            )
            div = viewpoint_diversity_score(t_w2c, r_w2c, idx, selected)
            total = base + diversity_weight * div
            if total > best_score:
                best_score, best_idx = total, idx
        selected.append(best_idx)
        remaining.remove(best_idx)

    return selected, [rgba_imgs[i] for i in selected]


def merge_to_rgba(rgb: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """[H,W,3] u8 + [H,W] bool -> [H,W,4] u8 with mask as alpha."""
    alpha = (mask > 0).astype(np.uint8) * 255
    return np.dstack([rgb, alpha])


def parse_colmap_poses(colmap_path: str):
    """COLMAP extrinsics -> (t_w2c [N,3], q_w2c [N,4], image names), sorted
    by name (the reference views.py standalone parsers, :54-172)."""
    from ..core import colmap as colmap_io

    if colmap_path.endswith(".bin"):
        images = colmap_io.read_extrinsics_binary(colmap_path)
    else:
        images = colmap_io.read_extrinsics_text(colmap_path)
    entries = sorted(images.values(), key=lambda im: im.name)
    t = np.stack([im.tvec for im in entries])
    q = np.stack([im.qvec for im in entries])
    names = [os.path.splitext(im.name)[0] for im in entries]
    return t, q, names


def parse_transforms_poses(path: str, is_opengl: bool = False):
    """transforms json -> (t_c2w, R_c2w, image names) (views.py:131-172)."""
    import json

    with open(path) as f:
        contents = json.load(f)
    t_list, r_list, names = [], [], []
    for frame in contents["frames"]:
        name = os.path.splitext(os.path.basename(frame["file_path"]))[0]
        transform = np.array(frame["transform_matrix"])
        if is_opengl:
            transform[:3, 1:3] *= -1
        r_list.append(transform[:3, :3])
        t_list.append(transform[:3, 3])
        names.append(name)
    return np.array(t_list), np.array(r_list), names


def select_views_from_colmap(rgba_dir: str, colmap_path: str, img_num: int,
                             quality_weight=0.25, mask_weight=0.25,
                             diversity_weight=0.25) -> list[np.ndarray]:
    """Standalone entry: poses straight from a COLMAP file (views.py:478-510)."""
    from ..core.quat import quat_to_rotmat
    import jax.numpy as jnp

    t_w2c, q_w2c, names = parse_colmap_poses(colmap_path)
    r_w2c = np.asarray(quat_to_rotmat(jnp.asarray(q_w2c, jnp.float32)))
    _, imgs = select_views(
        rgba_dir, names, img_num, t_w2c, r_w2c,
        quality_weight=quality_weight, mask_weight=mask_weight,
        diversity_weight=diversity_weight,
    )
    return imgs


def merge_to_rgba_dirs(img_dir: str, mask_dir: str, output_dir: str):
    """Merge RGB frames with binary masks into RGBA files (views.py:513-538)."""
    import cv2

    masks = sorted(f for f in os.listdir(mask_dir)
                   if os.path.splitext(f)[1] in IMG_EXTENSIONS)
    rgbs = sorted(f for f in os.listdir(img_dir)
                  if os.path.splitext(f)[1] in IMG_EXTENSIONS)
    os.makedirs(output_dir, exist_ok=True)
    for mask_name, rgb_name in zip(masks, rgbs):
        mask = cv2.imread(os.path.join(mask_dir, mask_name), cv2.IMREAD_UNCHANGED)
        rgb = cv2.imread(os.path.join(img_dir, rgb_name))
        alpha = np.where(mask > 0, 255, 0).astype(np.uint8)
        cv2.imwrite(os.path.join(output_dir, rgb_name), cv2.merge([rgb, alpha]))


def main(argv=None):
    """Standalone view-selection CLI (views.py:540-573)."""
    import argparse
    import cv2

    parser = argparse.ArgumentParser(description="select viewpoints")
    parser.add_argument("--rgba_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="")
    parser.add_argument("--colmap_path", type=str, default="")
    parser.add_argument("--img_num", type=int, default=4)
    args = parser.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    if not os.path.exists(args.rgba_dir):
        raise ValueError(f"RGBA directory {args.rgba_dir} does not exist")
    selected = select_views_from_colmap(args.rgba_dir, args.colmap_path, args.img_num)
    crops = post_process_rgba_imgs(selected)
    for i, crop in enumerate(crops):
        cv2.imwrite(os.path.join(args.output_dir, f"img_{i}.png"),
                    cv2.cvtColor(np.array(crop), cv2.COLOR_RGBA2BGRA))
    print(f"Saved {len(crops)} images to {args.output_dir}")


if __name__ == "__main__":
    main()
