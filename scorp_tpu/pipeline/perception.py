"""External perception adapters (L5 boundary, SURVEY.md §2.4/§7).

Narrow interfaces mirroring the observed call surfaces of the reference's
checkpoint-driven models, each with a live backend (lazy torch imports,
gated on checkpoint presence) and an offline one:

  * Detector.predict(image_rgb, caption) -> (boxes cxcywh [0,1], logits,
    phrases) — GroundingDINO SwinB (segmentation_2d.py:13,95) or a
    "boxfile" backend reading description-provided boxes from a YAML/npz;
  * VideoSegmenter — SAM2 video predictor propagation
    (segmentation_2d.py:12,94,170-195) or a "maskdir" backend that reads
    per-frame binary masks from disk.
"""

from __future__ import annotations

import os

import numpy as np


class GroundingDINODetector:
    CKPT = "checkpoints/GroundingDINO/groundingdino_swinb_cogcoor.pth"
    CFG = "submodules/GroundingDINO/groundingdino/config/GroundingDINO_SwinB_cfg.py"

    def __init__(self, checkpoint: str | None = None, cfg: str | None = None):
        self.checkpoint = checkpoint or self.CKPT
        self.cfg = cfg or self.CFG
        self._model = None

    def _load(self):
        if self._model is None:
            from groundingdino.util.inference import load_model  # type: ignore

            self._model = load_model(self.cfg, self.checkpoint)
        return self._model

    def predict(self, image_path: str, caption: str,
                box_threshold: float = 0.35, text_threshold: float = 0.25):
        from groundingdino.util.inference import load_image, predict  # type: ignore

        _, image_for_model = load_image(image_path)
        boxes, logits, phrases = predict(
            model=self._load(), image=image_for_model, caption=caption,
            box_threshold=box_threshold, text_threshold=text_threshold,
            remove_combined=True,
        )
        return np.asarray(boxes), np.asarray(logits), list(phrases)


class BoxfileDetector:
    """Offline detector: reads {prompt: [cx, cy, w, h] normalized} from the
    scene's description.yml `boxes:` section or a boxes.yml next to it."""

    def __init__(self, boxes: dict[str, list[float]]):
        self.boxes = boxes

    def predict(self, image_path: str, caption: str, box_threshold=0.35,
                text_threshold=0.25):
        prompts = [p.strip() for p in caption.split(".") if p.strip()]
        boxes, logits, phrases = [], [], []
        for p in prompts:
            if p in self.boxes:
                boxes.append(self.boxes[p])
                logits.append(1.0)
                phrases.append(p)
        return np.asarray(boxes, np.float32), np.asarray(logits, np.float32), phrases


class SAM2VideoSegmenter:
    CKPT = "checkpoints/sam2.1/sam2.1_hiera_large.pt"
    CFG = "configs/sam2.1/sam2.1_hiera_l.yaml"

    def __init__(self, checkpoint: str | None = None, cfg: str | None = None):
        self.checkpoint = checkpoint or self.CKPT
        self.cfg = cfg or self.CFG
        self._pred = None
        self._state = None

    def _load(self):
        if self._pred is None:
            from sam2.build_sam import build_sam2_video_predictor  # type: ignore

            self._pred = build_sam2_video_predictor(self.cfg, self.checkpoint)
        return self._pred

    def init(self, image_paths: list[str]):
        self._state = self._load().init_state(image_paths)

    def add_box(self, box_xyxy, frame_idx: int, obj_id: int):
        return self._pred.add_new_points_or_box(
            self._state, box=list(box_xyxy), frame_idx=frame_idx, obj_id=obj_id
        )

    def propagate(self, start_frame_idx: int, reverse: bool):
        """Yields (frame_idx, object_ids, masks [K,1,H,W] float>0)."""
        for frame_idx, object_ids, masks in self._pred.propagate_in_video(
            self._state, start_frame_idx=start_frame_idx, reverse=reverse
        ):
            yield frame_idx, [int(i) for i in object_ids], [
                np.asarray(m[0].cpu().numpy()) > 0 for m in masks
            ]


class MaskdirSegmenter:
    """Offline segmenter: per-object mask PNGs at
    {mask_dir}/{prompt}/{image_name}.png (nonzero = object)."""

    def __init__(self, mask_dir: str, prompts: list[str]):
        self.mask_dir = mask_dir
        self.prompts = prompts
        self.image_paths: list[str] = []

    def init(self, image_paths: list[str]):
        self.image_paths = image_paths

    def add_box(self, box_xyxy, frame_idx: int, obj_id: int):
        return None, list(range(len(self.prompts))), []

    def propagate(self, start_frame_idx: int, reverse: bool):
        import cv2

        indices = (
            range(start_frame_idx, -1, -1) if reverse
            else range(max(start_frame_idx, 0), len(self.image_paths))
        )
        for frame_idx in indices:
            name = os.path.basename(self.image_paths[frame_idx]).rsplit(".", 1)[0]
            masks = []
            for p in self.prompts:
                path = os.path.join(self.mask_dir, p, f"{name}.png")
                if os.path.exists(path):
                    m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                    if m.ndim == 3:
                        m = m[..., -1]
                    masks.append(m > 0)
                else:
                    masks.append(None)
            if all(m is None for m in masks):
                continue
            h = next(m.shape for m in masks if m is not None)
            masks = [m if m is not None else np.zeros(h, bool) for m in masks]
            yield frame_idx, list(range(len(self.prompts))), masks
