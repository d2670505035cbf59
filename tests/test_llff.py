"""LLFF capture loader (data/llff.py): poses_bounds.npy format
decoding (the [down, right, back] -> [right, up, back] column swap),
recenter/rescale invariants, the llffhold split, and the factory ->
NDC-training path on a synthetic capture written by the test."""

import os

import jax
import numpy as np
import pytest

from nerf_rs_tpu.data import llff
from nerf_rs_tpu.data.procedural import forward_facing_poses


def _write_capture(tmp_path, n=9, h=24, w=32, focal=40.0,
                   near=2.0, far=12.0):
    """Synthesize an LLFF capture dir: forward-facing c2w poses encoded
    the way imgs2poses.py writes them (the INVERSE of the loader's
    column swap), plus distinct tiny images."""
    from nerf_rs_tpu.data.images import save_png

    c2w = forward_facing_poses(n, seed=3)  # Blender convention [r, u, b]
    rows = []
    for i in range(n):
        r, u, b, t = (c2w[i, :3, 0], c2w[i, :3, 1], c2w[i, :3, 2],
                      c2w[i, :3, 3])
        pose = np.stack([-u, r, b, t], axis=-1)  # [down, right, back | t]
        hwf = np.asarray([h, w, focal])[:, None]
        rows.append(np.concatenate(
            [np.concatenate([pose, hwf], axis=1).reshape(-1),
             [near, far]]))
    arr = np.stack(rows).astype(np.float64)
    np.save(os.path.join(tmp_path, "poses_bounds.npy"), arr)
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    for i in range(n):
        img = np.full((h, w, 3), i / max(n - 1, 1), np.float32)
        save_png(os.path.join(img_dir, f"img_{i:03d}.png"), img)
    return c2w


def test_pose_convention_roundtrip(tmp_path):
    c2w = _write_capture(tmp_path)
    got, hwf, bounds = llff.load_poses_bounds(
        os.path.join(tmp_path, "poses_bounds.npy"))
    np.testing.assert_allclose(got[:, :3, :4], c2w[:, :3, :4], atol=1e-6)
    np.testing.assert_allclose(hwf[0], [24, 32, 40.0])
    np.testing.assert_allclose(bounds[:, 0], 2.0)
    np.testing.assert_allclose(bounds[:, 1], 12.0)


def test_load_llff_rescale_recenter_and_split(tmp_path):
    c2w = _write_capture(tmp_path, n=9)
    scene = llff.load_llff(str(tmp_path), split="all", holdout=0)
    # rescale: min near bound lands at 1/scale_near = 1.333 -> nearest
    # content just BEYOND the ndc_near=1 plane (the canonical LLFF
    # sc = 1/(bd_factor*min(near)) normalization)
    np.testing.assert_allclose(scene.near, 1.0 / 0.75, rtol=1e-6)
    np.testing.assert_allclose(scene.far, 12.0 / (0.75 * 2.0), rtol=1e-6)
    # recenter: a global rigid transform — pairwise camera distances
    # are preserved up to the rescale factor
    sc = 1.0 / (0.75 * 2.0)
    d_in = np.linalg.norm(
        c2w[:, :3, 3][None] - c2w[:, :3, 3][:, None], axis=-1)
    d_out = np.linalg.norm(
        scene.c2w[:, :3, 3][None] - scene.c2w[:, :3, 3][:, None], axis=-1)
    np.testing.assert_allclose(d_out, d_in * sc, atol=1e-5)
    # the average camera is the identity after recentering
    mean_t = scene.c2w[:, :3, 3].mean(0)
    np.testing.assert_allclose(mean_t, 0.0, atol=1e-5)
    # rotations stay orthonormal
    RtR = np.einsum("nij,nik->njk", scene.c2w[:, :3, :3],
                    scene.c2w[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (9, 1, 1)),
                               atol=1e-5)

    train = llff.load_llff(str(tmp_path), split="train", holdout=3)
    test = llff.load_llff(str(tmp_path), split="test", holdout=3)
    assert train.images.shape[0] == 6 and test.images.shape[0] == 3
    # images pair with their poses: view i's constant gray level
    lv = test.images[1, 0, 0, 0] / 255.0  # second test view = index 3
    assert abs(lv - 3 / 8) < 2 / 255.0


def test_load_llff_factor_decimation(tmp_path):
    _write_capture(tmp_path, h=24, w=32, focal=40.0)
    scene = llff.load_llff(str(tmp_path), split="all", factor=2)
    assert (scene.height, scene.width) == (12, 16)
    np.testing.assert_allclose(scene.focal, 20.0, rtol=1e-6)


def test_load_llff_shape_errors(tmp_path):
    np.save(os.path.join(tmp_path, "poses_bounds.npy"),
            np.zeros((4, 16)))
    with pytest.raises(ValueError, match="17"):
        llff.load_poses_bounds(os.path.join(tmp_path, "poses_bounds.npy"))


def test_llff_factory_ndc_training_path(tmp_path):
    """dataset=llff through the factory in NDC mode: camera picks up
    the capture intrinsics, the sampler emits NDC rays, and a train
    step runs finite."""
    from nerf_rs_tpu.config import (
        CameraConfig, Config, DataConfig, ModelConfig, RenderConfig,
        TrainConfig,
    )
    from nerf_rs_tpu.data.factory import make_dataset
    from nerf_rs_tpu.train import init_state, train_step

    _write_capture(tmp_path, n=6, h=16, w=16, focal=20.0)
    cfg = Config(
        camera=CameraConfig(width=16, height=16, near=0.0, far=1.0,
                            ndc=True),
        model=ModelConfig(net_depth=2, net_width=32, skip_layer=1,
                          feature_width=32, view_head_width=16,
                          pos_enc_levels=4, dir_enc_levels=2),
        render=RenderConfig(num_samples=8),
        train=TrainConfig(num_rays=32, precision="f32"),
        data=DataConfig(dataset="llff", img_dir=str(tmp_path),
                        llff_holdout=0),
    )
    ds = make_dataset(cfg)
    assert ds.camera.ndc and ds.camera.focal == pytest.approx(20.0)
    import dataclasses

    cfg = dataclasses.replace(cfg, camera=ds.camera)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 32)
    np.testing.assert_allclose(np.asarray(batch.origins[:, 2]), -1.0,
                               atol=1e-5)  # NDC near plane
    state = init_state(jax.random.PRNGKey(1), cfg)
    state, aux = train_step(state, batch, jax.random.PRNGKey(2), cfg)
    assert np.isfinite(float(aux["loss"]))
