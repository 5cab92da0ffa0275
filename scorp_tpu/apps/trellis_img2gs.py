"""Proxy generation: selected object RGBA views -> 3D Gaussian proxy (CLI
parity with /root/reference/trellis_img2gs.py:17-129).

Backends:
  * TRELLIS-image-large when the checkpoint + package are available (the
    reference runs it in a separate conda env; same sampler settings:
    12 steps, cfg 7.5/3, seed 1);
  * "precomputed" — copies <obj>.ply proxies from a directory (the adapter
    policy of SURVEY.md §7: none of the benchmark configs score the
    generative model itself).
"""

from __future__ import annotations

import os
import shutil
import sys
from argparse import ArgumentParser

TRELLIS_CKPT = "checkpoints/TRELLIS/TRELLIS-image-large"


def generate_trellis(pipeline, rgba_dir: str, object_name: str, save_dir: str,
                     save_type: str = "gs"):
    from PIL import Image

    obj_dir = os.path.join(rgba_dir, object_name)
    if not os.path.exists(obj_dir):
        raise ValueError(f"RGBA object directory {obj_dir} does not exist")
    img_files = os.listdir(obj_dir)
    if len(img_files) == 1:
        print("Processing single image")
        outputs = pipeline.run(Image.open(os.path.join(obj_dir, img_files[0])))
    else:
        print("Processing multiple images")
        images = [Image.open(os.path.join(obj_dir, f)) for f in img_files]
        outputs = pipeline.run_multi_image(
            images, seed=1,
            sparse_structure_sampler_params={"steps": 12, "cfg_strength": 7.5},
            slat_sampler_params={"steps": 12, "cfg_strength": 3},
        )
    gs_path = os.path.join(save_dir, f"{object_name}.ply")
    if save_type in ("gs", "both"):
        outputs["gaussian"][0].save_ply(gs_path)
    if save_type in ("mesh", "both"):
        from submodules.TRELLIS.trellis.utils import postprocessing_utils  # type: ignore

        glb = postprocessing_utils.to_glb(
            outputs["gaussian"][0], outputs["mesh"][0], simplify=0.95, texture_size=1024,
        )
        name = f"{object_name}.glb" if save_type == "mesh" else "mesh.glb"
        glb.export(os.path.join(save_dir, name))


def generate_precomputed(proxy_dir: str, object_name: str, save_dir: str):
    src = os.path.join(proxy_dir, f"{object_name}.ply")
    if not os.path.exists(src):
        raise FileNotFoundError(
            f"Precomputed proxy {src} not found; provide --proxy_dir with "
            f"<object>.ply files or install TRELLIS + its checkpoint"
        )
    shutil.copy(src, os.path.join(save_dir, f"{object_name}.ply"))
    print(f"Copied precomputed proxy for {object_name}")


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--save_type", type=str, default="gs", help="gs, mesh, both")
    parser.add_argument("--object_name", type=str, default=None)
    parser.add_argument("--proxy_dir", type=str, default=None,
                        help="precomputed-proxy backend: dir of <object>.ply files")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    rgba_path = os.path.join(args.model_path, "masked_image_rgba_selected")
    assert os.path.exists(rgba_path), f"RGBA path {rgba_path} does not exist"
    save_dir = os.path.join(args.model_path, "generated")
    os.makedirs(save_dir, exist_ok=True)

    objects = [args.object_name] if args.object_name else os.listdir(rgba_path)
    if args.object_name and args.object_name not in os.listdir(rgba_path):
        raise ValueError(f"Object {args.object_name} not found in {rgba_path}")

    pipeline = None
    if args.proxy_dir is None:
        if not os.path.exists(TRELLIS_CKPT):
            raise RuntimeError(
                f"TRELLIS checkpoint not found at {TRELLIS_CKPT}; either install "
                "it or pass --proxy_dir with precomputed <object>.ply proxies"
            )
        os.environ["ATTN_BACKEND"] = "xformers"
        os.environ["SPCONV_ALGO"] = "native"
        from submodules.TRELLIS.trellis.pipelines import TrellisImageTo3DPipeline  # type: ignore

        pipeline = TrellisImageTo3DPipeline.from_pretrained(TRELLIS_CKPT)
        pipeline.cuda()

    for object_name in objects:
        print(f"Processing {object_name}")
        if pipeline is not None:
            generate_trellis(pipeline, rgba_path, object_name, save_dir, args.save_type)
        else:
            generate_precomputed(args.proxy_dir, object_name, save_dir)


if __name__ == "__main__":
    main()
