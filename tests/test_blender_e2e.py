"""End-to-end Blender-format pipeline: a procedurally generated
transforms.json scene (train + test splits) goes through the CLI train
loop (white background, held-out eval split auto-pickup) and the eval
subcommand — the full path the lego configs will take."""

import pytest
import json
import math
import os

import numpy as np

from nerf_rs_tpu.cli import main
from nerf_rs_tpu.data.images import save_png


pytestmark = pytest.mark.slow  # e2e/subprocess drives

def _make_scene(root, n_train=3, n_test=2, size=16):
    """Flat white disk on black (view-independent gold) with look-at
    c2w poses on a circle — exercises the format, not geometry."""
    y, x = np.mgrid[0:size, 0:size]
    r = np.sqrt((x - size / 2) ** 2 + (y - size / 2) ** 2)
    inside = (r < size / 4).astype(np.float32)
    img = np.stack([inside] * 3 + [np.ones_like(inside)], -1)

    def pose(theta):
        # camera on a circle of radius 3 looking at the origin, +Y up
        eye = np.array([3 * math.sin(theta), 0.0, 3 * math.cos(theta)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        return c2w

    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i in range(n):
            save_png(os.path.join(root, split, f"r_{i}.png"), img)
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": pose(0.3 * i + (0.15 if split == "test" else 0)).tolist(),
            })
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


def test_blender_train_and_eval(tmp_path):
    scene = str(tmp_path / "scene")
    _make_scene(scene)
    common = [
        "--dataset", "blender", "--img_dir", scene,
        "--near", "1.0", "--far", "5.0",
        "--num_rays", "64", "--num_samples", "8",
        "--white_background", "true",
        "--log_dir", str(tmp_path / "logs"), "--save_dir", str(tmp_path / "ckpt"),
        "--precision", "f32",
    ]
    rc = main(["train", *common, "--num_iter", "8", "--save_steps", "6",
               "--eval_steps", "5", "--logging_steps", "100",
               "--learning_rate", "1e-3"])
    assert rc == 0  # trained, eval'd on the TEST split at iter 5, saved

    rc = main(["eval", *common, "--split", "test", "--max_views", "2"])
    assert rc == 0
