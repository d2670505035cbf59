"""Blender synthetic-scene (``transforms.json``) dataset loader.

Capability addition over the reference (which only reads its fixed
``image-{i}.png`` hemisphere layout): the standard NeRF synthetic
format — ``transforms_{split}.json`` with ``camera_angle_x`` and per-
frame 4x4 ``transform_matrix`` c2w poses — needed for the 800x800 lego
configs in BASELINE.json (configs 3-4).
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import numpy as np

from .images import box_downsample, load_image


class BlenderScene(NamedTuple):
    images: np.ndarray  # (N, H, W, 4) uint8
    c2w: np.ndarray  # (N, 4, 4) float32 camera-to-world
    height: int
    width: int
    focal: float


def load_blender(
    scene_dir: str,
    split: str = "train",
    downscale: int = 1,
    max_frames: Optional[int] = None,
) -> BlenderScene:
    """Load ``{scene_dir}/transforms_{split}.json`` + its frames.

    ``downscale`` integer-decimates the frames (e.g. 800 -> 400 at 2),
    scaling focal accordingly — the standard quick-iteration knob.
    """
    meta_path = os.path.join(scene_dir, f"transforms_{split}.json")
    with open(meta_path) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if max_frames is not None:
        frames = frames[:max_frames]
    imgs, poses = [], []
    for fr in frames:
        fp = fr["file_path"]
        if not os.path.splitext(fp)[1]:
            fp = fp + ".png"
        img = load_image(os.path.join(scene_dir, fp))
        if downscale > 1:
            img = box_downsample(img, downscale)  # area-avg, no aliasing
        imgs.append(img)
        poses.append(np.asarray(fr["transform_matrix"], dtype=np.float32))
    images = np.stack(imgs, axis=0)
    c2w = np.stack(poses, axis=0)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return BlenderScene(images=images, c2w=c2w, height=h, width=w, focal=focal)
