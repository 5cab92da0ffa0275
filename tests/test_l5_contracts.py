"""Signature-contract tests for the live L5 adapters.

The real GroundingDINO/SAM2/MASt3R/TRELLIS checkpoints are absent in this
container, so the live code paths can't run for real — these tests inject
STUB modules that reproduce the reference call shapes exactly
(/root/reference/segmentation_2d.py:12-13,94-195, utils/match.py:9-78,
trellis_img2gs.py:13,42-54) and drive the live adapters through them. Any
drift between adapter and reference call surface (argument names, return
structure, tensor layouts) fails here, shrinking the unverified-live-path
risk to weights-only.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# GroundingDINO + SAM2 (segmentation_2d live path)
# ---------------------------------------------------------------------------

def _make_groundingdino_stub(record):
    """groundingdino.util.inference with the reference surface:
    load_model(cfg, ckpt), load_image(path) -> (np_img, model_img),
    predict(model=, image=, caption=, box_threshold=, text_threshold=,
    remove_combined=) -> (boxes cxcywh[0,1] tensor, logits tensor, phrases).
    All predict args keyword-only: the reference calls them by name."""
    mod = types.ModuleType("groundingdino.util.inference")

    def load_model(cfg, ckpt):
        record["load_model"] = (cfg, ckpt)
        return {"model": "gdino"}

    def load_image(path):
        import cv2

        img = cv2.imread(path)
        assert img is not None, path
        return img[..., ::-1], torch.zeros(3, 64, 64)

    def predict(*, model, image, caption, box_threshold, text_threshold,
                remove_combined):
        assert model == {"model": "gdino"}
        assert isinstance(image, torch.Tensor)
        assert isinstance(caption, str)
        assert remove_combined is True
        record["predict"] = dict(caption=caption, box_threshold=box_threshold,
                                 text_threshold=text_threshold)
        phrases = [p.strip() for p in caption.split(".") if p.strip()]
        boxes = torch.tensor([[0.5, 0.5, 0.4, 0.4]] * len(phrases))
        logits = torch.tensor([0.9] * len(phrases))
        return boxes, logits, phrases

    mod.load_model = load_model
    mod.load_image = load_image
    mod.predict = predict
    return mod


class _StubSAM2Predictor:
    """SAM2 video predictor surface the reference drives
    (segmentation_2d.py:94,178-195): init_state(image_paths),
    add_new_points_or_box(state, box=, frame_idx=, obj_id=),
    propagate_in_video(state, start_frame_idx=, reverse=) yielding
    (frame_idx, object_ids, masks[K,1,H,W] logits)."""

    def __init__(self, record, h=32, w=48):
        self.record = record
        self.h, self.w = h, w

    def init_state(self, image_paths):
        self.record["init_state"] = list(image_paths)
        return {"paths": list(image_paths), "objs": {}}

    def add_new_points_or_box(self, state, *, box, frame_idx, obj_id):
        assert isinstance(box, list) and len(box) == 4
        state["objs"][obj_id] = (box, frame_idx)
        self.record.setdefault("boxes", []).append((obj_id, box, frame_idx))
        masks = torch.ones(len(state["objs"]), 1, self.h, self.w)
        return frame_idx, list(state["objs"]), masks

    def propagate_in_video(self, state, *, start_frame_idx, reverse):
        n = len(state["paths"])
        idxs = (range(start_frame_idx, -1, -1) if reverse
                else range(max(start_frame_idx, 0), n))
        obj_ids = list(state["objs"])
        for frame_idx in idxs:
            masks = torch.full((len(obj_ids), 1, self.h, self.w), -10.0)
            # object occupies the left half (positive logits)
            masks[:, :, :, : self.w // 2] = 10.0
            yield frame_idx, obj_ids, masks


def _make_sam2_stub(record, h, w):
    mod = types.ModuleType("sam2.build_sam")

    def build_sam2_video_predictor(cfg, ckpt):
        record["build_sam2"] = (cfg, ckpt)
        return _StubSAM2Predictor(record, h, w)

    mod.build_sam2_video_predictor = build_sam2_video_predictor
    return mod


class TestSegmentation2DLive:
    def test_live_adapters_through_stubs(self, tmp_path, monkeypatch):
        import cv2

        h, w = 32, 48
        record = {}
        gd_pkg = types.ModuleType("groundingdino")
        gd_util = types.ModuleType("groundingdino.util")
        gd_inf = _make_groundingdino_stub(record)
        sam2_pkg = types.ModuleType("sam2")
        sam2_bs = _make_sam2_stub(record, h, w)
        for name, mod in [("groundingdino", gd_pkg),
                          ("groundingdino.util", gd_util),
                          ("groundingdino.util.inference", gd_inf),
                          ("sam2", sam2_pkg), ("sam2.build_sam", sam2_bs)]:
            monkeypatch.setitem(sys.modules, name, mod)

        rng = np.random.default_rng(0)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"frame_{i}.png")
            cv2.imwrite(p, rng.integers(0, 255, (h, w, 3), np.uint8))
            paths.append(p)

        from scorp_tpu.apps.segmentation_2d import get_mask2d
        from scorp_tpu.pipeline.perception import (GroundingDINODetector,
                                                   SAM2VideoSegmenter)

        get_mask2d(
            prompt_list=["cup", "plate"], data_dir=str(tmp_path),
            image_path_list=paths, first_image_name="frame_1",
            box_threshold=0.3, text_threshold=0.2, combine_prompt=True,
            detector=GroundingDINODetector(), segmenter=SAM2VideoSegmenter(),
        )

        # detector contract: combined " . " caption, thresholds forwarded
        assert record["predict"]["caption"] == "cup . plate"
        assert record["predict"]["box_threshold"] == 0.3
        assert record["load_model"] == (GroundingDINODetector.CFG,
                                        GroundingDINODetector.CKPT)
        # segmenter contract: ckpt order (cfg, ckpt), all frames in state,
        # per-prompt boxes in PIXEL xyxy
        assert record["build_sam2"] == (SAM2VideoSegmenter.CFG,
                                        SAM2VideoSegmenter.CKPT)
        assert record["init_state"] == sorted(paths)
        assert len(record["boxes"]) == 2
        for _, box, frame_idx in record["boxes"]:
            assert frame_idx == 1
            # cxcywh (0.5,0.5,0.4,0.4) on 48x32 -> xyxy (14.4, 9.6, 33.6, 22.4)
            np.testing.assert_allclose(box, [14.4, 9.6, 33.6, 22.4], atol=1e-5)
        # propagation wrote per-object + union RGBA for every frame
        for prompt in ("cup", "plate", "masked"):
            for i in range(3):
                out = tmp_path / "masked_image_rgba" / prompt / f"frame_{i}.png"
                assert out.exists(), out
                rgba = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)
                assert rgba.shape == (h, w, 4)
                # stub mask = left half (morphology-stable rectangle)
                assert rgba[:, : w // 2 - 4, 3].min() == 255
                assert rgba[:, w // 2 + 4:, 3].max() == 0


# ---------------------------------------------------------------------------
# MASt3R (utils/match.py live path)
# ---------------------------------------------------------------------------

class TestMASt3RLive:
    def test_matcher_through_stubs(self, monkeypatch):
        from PIL import Image

        record = {}
        H0 = W0 = 64  # model-resolution true_shape

        class AsymmetricMASt3R:
            @classmethod
            def from_pretrained(cls, path, local_files_only=False):
                assert local_files_only is True  # reference passes it
                record["ckpt"] = path
                return cls()

            def to(self, device):
                record["device"] = device
                return self

        def load_images_pil(images, size, verbose):
            assert len(images) == 2 and verbose is False
            record["load_size"] = size
            return [{"img": torch.zeros(1, 3, H0, W0),
                     "true_shape": np.int32([[H0, W0]])} for _ in images]

        def inference(pairs, model, device, batch_size, verbose):
            assert len(pairs) == 1 and isinstance(pairs[0], tuple)
            assert batch_size == 1 and verbose is False
            assert isinstance(model, AsymmetricMASt3R)
            desc = torch.linspace(0, 1, H0 * W0 * 8).reshape(1, H0, W0, 8)
            view = {"true_shape": torch.tensor([[H0, W0]])}
            return {"view1": view, "view2": view,
                    "pred1": {"desc": desc}, "pred2": {"desc": desc}}

        def fast_reciprocal_NNs(d1, d2, subsample_or_initxy1, device, dist,
                                block_size):
            assert d1.shape == (H0, W0, 8)  # squeezed batch dim
            assert subsample_or_initxy1 == 8 and dist == "dot"
            record["block_size"] = block_size
            ys, xs = np.mgrid[4:H0 - 4:8, 4:W0 - 4:8]
            m = np.stack([xs.ravel(), ys.ravel()], axis=1)  # (x, y) order
            return m, m.copy()

        mods = {
            "mast3r": types.ModuleType("mast3r"),
            "mast3r.model": types.ModuleType("mast3r.model"),
            "mast3r.fast_nn": types.ModuleType("mast3r.fast_nn"),
            "dust3r": types.ModuleType("dust3r"),
            "dust3r.inference": types.ModuleType("dust3r.inference"),
            "dust3r.utils": types.ModuleType("dust3r.utils"),
            "dust3r.utils.image": types.ModuleType("dust3r.utils.image"),
        }
        mods["mast3r.model"].AsymmetricMASt3R = AsymmetricMASt3R
        mods["mast3r.fast_nn"].fast_reciprocal_NNs = fast_reciprocal_NNs
        mods["dust3r.inference"].inference = inference
        mods["dust3r.utils.image"].load_images_pil = load_images_pil
        for name, mod in mods.items():
            monkeypatch.setitem(sys.modules, name, mod)

        from scorp_tpu.pipeline.matching import MASt3RMatcher

        matcher = MASt3RMatcher(device="cpu")
        img1 = Image.new("RGB", (256, 128))
        img2 = Image.new("RGB", (512, 256))
        uv1, uv2 = matcher(img1, img2, n_points_per_cam=10)

        assert record["ckpt"] == MASt3RMatcher.CKPT
        assert record["device"] == "cpu"
        assert record["load_size"] == 1024  # reference size=1024
        assert record["block_size"] == 2**13
        # matches rescaled from model resolution to EACH original image size
        uv1, uv2 = np.asarray(uv1), np.asarray(uv2)
        assert uv1.shape == (10, 2) and uv2.shape == (10, 2)
        assert uv1[:, 0].max() < 256 and uv1[:, 1].max() < 128
        assert uv2[:, 0].max() < 512 and uv2[:, 1].max() < 256
        # same grid scaled 2x between the two image sizes
        np.testing.assert_allclose(uv2, uv1 * 2, atol=1.0)


# ---------------------------------------------------------------------------
# TRELLIS (trellis_img2gs live path)
# ---------------------------------------------------------------------------

class _StubGaussianOut:
    def __init__(self, record):
        self.record = record

    def save_ply(self, path):
        self.record.setdefault("saved", []).append(path)
        with open(path, "wb") as f:
            f.write(b"ply\n")


class _StubTrellisPipeline:
    """TrellisImageTo3DPipeline surface (reference trellis_img2gs.py:36-54):
    run(image) single-image, run_multi_image(images, seed=, ..._params=)."""

    def __init__(self, record):
        self.record = record

    def run(self, image):
        self.record["run"] = image.size
        return {"gaussian": [_StubGaussianOut(self.record)],
                "mesh": [object()]}

    def run_multi_image(self, images, *, seed, sparse_structure_sampler_params,
                        slat_sampler_params):
        self.record["multi"] = dict(
            n=len(images), seed=seed,
            sparse=sparse_structure_sampler_params, slat=slat_sampler_params)
        return {"gaussian": [_StubGaussianOut(self.record)],
                "mesh": [object()]}


class TestTrellisLive:
    def test_generate_through_stub_pipeline(self, tmp_path):
        from PIL import Image

        from scorp_tpu.apps.trellis_img2gs import generate_trellis

        record = {}
        rgba = tmp_path / "rgba"
        save = tmp_path / "generated"
        save.mkdir()
        (rgba / "cup").mkdir(parents=True)
        Image.new("RGBA", (16, 16)).save(rgba / "cup" / "v0.png")

        generate_trellis(_StubTrellisPipeline(record), str(rgba), "cup",
                         str(save), save_type="gs")
        assert record["run"] == (16, 16)
        assert (save / "cup.ply").exists()

        # multi-image path: reference sampler params exactly
        (rgba / "mug").mkdir()
        for i in range(3):
            Image.new("RGBA", (16, 16)).save(rgba / "mug" / f"v{i}.png")
        generate_trellis(_StubTrellisPipeline(record), str(rgba), "mug",
                         str(save), save_type="gs")
        assert record["multi"] == {
            "n": 3, "seed": 1,
            "sparse": {"steps": 12, "cfg_strength": 7.5},
            "slat": {"steps": 12, "cfg_strength": 3},
        }
        assert (save / "mug.ply").exists()

    def test_mesh_export_path(self, tmp_path, monkeypatch):
        from PIL import Image

        from scorp_tpu.apps.trellis_img2gs import generate_trellis

        record = {}

        class _Glb:
            def export(self, path):
                record["glb"] = path
                open(path, "wb").write(b"glb")

        post = types.ModuleType("submodules.TRELLIS.trellis.utils.postprocessing_utils")

        def to_glb(gaussian, mesh, *, simplify, texture_size):
            assert simplify == 0.95 and texture_size == 1024
            record["to_glb"] = True
            return _Glb()

        post.to_glb = to_glb
        utils_mod = types.ModuleType("submodules.TRELLIS.trellis.utils")
        utils_mod.postprocessing_utils = post
        for name, mod in [
            ("submodules", types.ModuleType("submodules")),
            ("submodules.TRELLIS", types.ModuleType("submodules.TRELLIS")),
            ("submodules.TRELLIS.trellis", types.ModuleType("submodules.TRELLIS.trellis")),
            ("submodules.TRELLIS.trellis.utils", utils_mod),
            ("submodules.TRELLIS.trellis.utils.postprocessing_utils", post),
        ]:
            monkeypatch.setitem(sys.modules, name, mod)

        rgba = tmp_path / "rgba"
        save = tmp_path / "generated"
        save.mkdir()
        (rgba / "cup").mkdir(parents=True)
        Image.new("RGBA", (16, 16)).save(rgba / "cup" / "v0.png")
        generate_trellis(_StubTrellisPipeline(record), str(rgba), "cup",
                         str(save), save_type="both")
        assert record["to_glb"] and (save / "cup.ply").exists()
        assert record["glb"].endswith("mesh.glb")
