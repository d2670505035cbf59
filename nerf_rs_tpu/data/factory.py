"""Dataset factory: Config -> DeviceDataset.

Covers the reference's dataset surface (--img_dir multiview PNGs with
the hemisphere angle grid, src/cli.rs:19-32 + src/image_loading.rs) and
the additions: Blender transforms.json scenes and the file-free
synthetic sphere fixtures (SURVEY §2.6).
"""

from __future__ import annotations

import math

import numpy as np

from ..config import Config
from ..ops import rays as rays_ops
from . import blender, images, synthetic
from .device_dataset import DeviceDataset


def make_dataset(cfg: Config, split: str = "train", sharding=None) -> DeviceDataset:
    d = cfg.data
    if d.dataset in ("sphere", "flat_sphere"):
        n_views = 2 * d.num_views_per_hemisphere * (d.num_views_per_hemisphere + 1)
        imgs = np.asarray(synthetic.sphere_scene_images(cfg.camera, n_views))
        angles = np.asarray(rays_ops.view_angle_grid(d.num_views_per_hemisphere))
        return DeviceDataset(
            imgs, cfg.camera, angles=angles,
            white_background=cfg.render.white_background, sharding=sharding,
        )
    if d.dataset == "multiview_png":
        imgs, h, w = images.load_multiview_dir(
            d.img_dir, d.view_start, d.view_end, d.view_step
        )
        assert (h, w) == (cfg.camera.height, cfg.camera.width), (
            f"images are {h}x{w} but camera is "
            f"{cfg.camera.height}x{cfg.camera.width}"
        )
        angles = np.asarray(
            rays_ops.view_angle_grid(d.num_views_per_hemisphere)
        )[d.view_start : d.view_end : d.view_step]
        assert angles.shape[0] == imgs.shape[0]
        return DeviceDataset(
            imgs, cfg.camera, angles=angles,
            white_background=cfg.render.white_background, sharding=sharding,
        )
    if d.dataset == "blender":
        scene = blender.load_blender(d.img_dir, split=split)
        cam = cfg.camera
        camera = cam.__class__(
            width=scene.width,
            height=scene.height,
            fov=2.0 * math.atan(0.5 * scene.width / scene.focal),
            near=cam.near,
            far=cam.far,
            focal=float(scene.focal),
        )
        return DeviceDataset(
            scene.images, camera, c2w=scene.c2w,
            white_background=cfg.render.white_background, sharding=sharding,
        )
    raise ValueError(f"unknown dataset: {d.dataset}")
