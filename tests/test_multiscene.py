"""Multi-scene scene-parallel training tests on the virtual CPU mesh:
each scene's trajectory must match an independently-trained
single-scene run bit-for-bit (same keys), since scene training shares
nothing."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig, Config, ModelConfig, RenderConfig, TrainConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays
from nerf_rs_tpu.parallel import mesh as mesh_mod, multiscene
from nerf_rs_tpu.train import init_state
from nerf_rs_tpu.train.step import train_step_core


pytestmark = pytest.mark.slow  # e2e/subprocess drives

def _cfg():
    return Config(
        camera=CameraConfig(width=16, height=16),
        model=ModelConfig(net_depth=2, net_width=16, skip_layer=9,
                          feature_width=16, view_head_width=8,
                          pos_enc_levels=2, dir_enc_levels=1),
        render=RenderConfig(num_samples=8, randomized=False),
        train=TrainConfig(num_rays=32, precision="f32"),
    )


def _datasets(cfg, n):
    out = []
    for s in range(n):
        img = np.asarray(synthetic.sphere_scene_images(cfg.camera, 4))
        # make scenes distinct: scale brightness per scene
        img = (img.astype(np.float32) * (0.5 + 0.5 * (s + 1) / n)).astype(np.uint8)
        angles = np.asarray(rays.view_angle_grid(1))[:4]
        out.append(DeviceDataset(img, cfg.camera, angles=angles))
    return out


def test_multiscene_matches_independent_training():
    cfg = _cfg()
    n_scenes = 2
    mesh = mesh_mod.make_mesh(2)
    key = jax.random.PRNGKey(0)

    ms = multiscene.init_multiscene_state(key, cfg, n_scenes)
    step_fn = multiscene.make_multiscene_train_step(cfg, mesh, n_scenes)
    sampler = multiscene.MultiSceneSampler(_datasets(cfg, n_scenes))

    # record the exact per-scene keys the sharded step derives
    batches = []
    for it in range(3):
        k = jax.random.fold_in(key, it)
        batch = sampler.sample(k, 32)
        batches.append(batch)
        ms, aux = step_fn(ms, batch, k)
    assert aux["loss"].shape == (n_scenes,)
    assert np.isfinite(np.asarray(aux["loss"])).all()

    # independent single-scene training with the same init + batch + key
    # derivation (shard s, scene-in-shard 0 -> fold_in(fold_in(k, s), 0))
    keys = jax.random.split(key, n_scenes)
    for s in range(n_scenes):
        st = init_state(keys[s], cfg)
        for it in range(3):
            k = jax.random.fold_in(key, it)
            b = jax.tree_util.tree_map(lambda x: x[s], batches[it])
            kk = jax.random.fold_in(jax.random.fold_in(k, s), 0)
            st, _ = train_step_core(st, b, kk, cfg)
        got = np.asarray(multiscene.scene_state(ms, s).params["trunk"][0]["w"])
        want = np.asarray(st.params["trunk"][0]["w"])
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_multiscene_more_scenes_than_devices():
    cfg = _cfg()
    mesh = mesh_mod.make_mesh(2)
    n_scenes = 4  # 2 scenes per device
    ms = multiscene.init_multiscene_state(jax.random.PRNGKey(0), cfg, n_scenes)
    step_fn = multiscene.make_multiscene_train_step(cfg, mesh, n_scenes)
    sampler = multiscene.MultiSceneSampler(_datasets(cfg, n_scenes))
    batch = sampler.sample(jax.random.PRNGKey(1), 32)
    ms, aux = step_fn(ms, batch, jax.random.PRNGKey(2))
    assert aux["loss"].shape == (4,)
    assert int(jax.device_get(ms.step)[0]) == 1
    # scenes diverge (different data)
    p = np.asarray(jax.device_get(ms.params["trunk"][0]["w"]))
    assert not np.allclose(p[0], p[1])


def test_scene_mesh_2d_matches_independent_training():
    """2-D (scene, data) mesh: 2 scenes over 8 devices -> each scene
    gets a 4-chip DP group. Per-scene trajectories must match
    independent single-scene training exactly (randomized=False makes
    sampling key-independent; pmean over equal-ray shards == full mean)."""
    cfg = _cfg()
    n_scenes = 2
    mesh = mesh_mod.make_scene_mesh(n_scenes, 8)
    assert dict(mesh.shape) == {"scene": 2, "data": 4}
    key = jax.random.PRNGKey(0)

    ms = multiscene.init_multiscene_state(key, cfg, n_scenes)
    step_fn = multiscene.make_multiscene_train_step(cfg, mesh, n_scenes)
    sampler = multiscene.MultiSceneSampler(_datasets(cfg, n_scenes))

    batches = []
    for it in range(3):
        k = jax.random.fold_in(key, it)
        batch = sampler.sample(k, 32)
        batches.append(batch)
        ms, aux = step_fn(ms, batch, k)
    assert aux["loss"].shape == (n_scenes,)

    keys = jax.random.split(key, n_scenes)
    from nerf_rs_tpu.train.step import train_step
    for s in range(n_scenes):
        st = init_state(keys[s], cfg)
        for it in range(3):
            k = jax.random.fold_in(key, it)
            b = jax.tree_util.tree_map(lambda x: x[s], batches[it])
            st, _ = train_step_core(st, b, jax.random.PRNGKey(0), cfg)
        got = np.asarray(
            jax.device_get(multiscene.scene_state(ms, s).params["trunk"][0]["w"])
        )
        want = np.asarray(st.params["trunk"][0]["w"])
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_multiscene_cli_e2e(tmp_path):
    """Driver surface (VERDICT r2 next #5): the CLI trains 2 scenes on
    the 8-virtual-device mesh and evals each per-scene."""
    from nerf_rs_tpu.cli import main

    log_dir = str(tmp_path / "logs")
    save_dir = str(tmp_path / "ckpt")
    rc = main([
        "train", "--scenes", "sphere,flat_sphere",
        "--width", "24", "--height", "24",
        "--num_rays", "64", "--num_samples", "8",
        "--num_views_per_hemisphere", "2",
        "--log_dir", log_dir, "--save_dir", save_dir,
        "--precision", "f32", "--num_iter", "11",
        "--eval_steps", "5", "--logging_steps", "5", "--save_steps", "8",
    ])
    assert rc == 0
    import os
    assert any(c.startswith("checkpoint-") for c in os.listdir(save_dir))

    # per-scene inference from the STACKED checkpoint (--scene_index)
    out_dir = str(tmp_path / "renders")
    rc = main([
        "render", "--scenes", "sphere,flat_sphere", "--scene_index", "1",
        "--dataset", "sphere",
        "--width", "24", "--height", "24", "--num_samples", "8",
        "--num_views_per_hemisphere", "2",
        "--save_dir", save_dir, "--precision", "f32",
        "--view", "0", "--out_dir", out_dir,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "view-0.png"))
