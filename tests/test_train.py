"""End-to-end training tests: tiny-fit convergence on the analytic
flat-sphere scene (the oracle fixture the reference left commented out,
src/dataset.rs:141-188) — loss must drop and PSNR rise within a few
hundred steps. This is the 'minimum end-to-end slice' of SURVEY.md §7
step 6."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import (
    CameraConfig,
    Config,
    ModelConfig,
    RenderConfig,
    TrainConfig,
    reference_compat_config,
)
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.ops import rays
from nerf_rs_tpu.train import Batch, eval_step, init_state, train_step


def _tiny_cfg(**render_kw):
    return Config(
        camera=CameraConfig(width=32, height=32),
        model=ModelConfig(
            net_depth=4,
            net_width=64,
            skip_layer=2,
            feature_width=64,
            view_head_width=32,
            pos_enc_levels=6,
            dir_enc_levels=2,
        ),
        render=RenderConfig(num_samples=32, **render_kw),
        train=TrainConfig(num_rays=256, learning_rate=5e-3, precision="f32"),
    )


def _sphere_batch(key, cfg, n):
    """Random rays at random hemisphere views against the flat-sphere
    gold image (view-independent disk)."""
    kc, kv = jax.random.split(key)
    coords = jax.random.uniform(kc, (n, 2)) * jnp.asarray(
        [cfg.camera.width - 1, cfg.camera.height - 1], jnp.float32
    )
    angles = rays.view_angle_grid(3)
    idx = jax.random.randint(kv, (n,), 0, angles.shape[0])
    pose = rays.pose_from_yaw_pitch(angles[idx, 0], angles[idx, 1])
    o, d = rays.rays_for_coords(coords, pose, cfg.camera)
    img = synthetic.sphere_image(cfg.camera)
    xi = jnp.clip(coords[:, 0].astype(jnp.int32), 0, cfg.camera.width - 1)
    yi = jnp.clip(coords[:, 1].astype(jnp.int32), 0, cfg.camera.height - 1)
    gold = img[yi, xi, :3]
    return Batch(origins=o, dirs=d, gold=gold)


def _run_training(cfg, steps=150, seed=0):
    key = jax.random.PRNGKey(seed)
    state = init_state(key, cfg)
    losses = []
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        batch = _sphere_batch(k, cfg, cfg.train.num_rays)
        state, aux = train_step(state, batch, jax.random.fold_in(k, 7), cfg)
        losses.append(float(aux["loss"]))
    return state, losses


@pytest.mark.slow
def test_training_converges_on_sphere():
    cfg = _tiny_cfg()
    state, losses = _run_training(cfg)
    assert int(state.step) == len(losses)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < first * 0.5, f"loss did not halve: {first:.4f} -> {last:.4f}"


@pytest.mark.slow
def test_eval_step_psnr_improves():
    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(1)
    state0 = init_state(key, cfg)
    batch = _sphere_batch(jax.random.PRNGKey(99), cfg, 512)
    before = float(eval_step(state0, batch, key, cfg)["psnr"])
    state, _ = _run_training(cfg, steps=200, seed=1)
    after = float(eval_step(state, batch, key, cfg)["psnr"])
    assert after > before + 3.0, f"PSNR {before:.2f} -> {after:.2f}"


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch_direction():
    """accumulation_steps=4 over the same data produces a finite,
    loss-reducing trajectory (the reference's dead grad-accum capability,
    src/model.rs:327-336, made real)."""
    cfg = _tiny_cfg().replace(
        train=TrainConfig(num_rays=256, learning_rate=5e-3, precision="f32", accumulation_steps=4)
    )
    state, losses = _run_training(cfg, steps=100)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


@pytest.mark.slow
def test_hierarchical_training_runs():
    cfg = _tiny_cfg(num_fine_samples=32)
    state, losses = _run_training(cfg, steps=30)
    assert np.isfinite(losses).all()
    assert state.fine_params is not None


@pytest.mark.slow
def test_compat_config_trains():
    """The reference-compat path (8x100 raw-xyz MLP, sigma-grayscale
    compositing, t*far sampling) optimizes without NaNs."""
    cfg = reference_compat_config()
    cfg = cfg.replace(
        camera=CameraConfig(width=32, height=32),
        train=TrainConfig(num_rays=84, precision="f32", learning_rate=5e-4),
    )
    state, losses = _run_training(cfg, steps=50, seed=2)
    assert np.isfinite(losses).all()


def test_error_resampling_trains_and_concentrates():
    """Highest-error resampling: training runs, the error store updates,
    and sampling favors high-error pixels."""
    import jax.numpy as jnp
    from nerf_rs_tpu.data.device_dataset import DeviceDataset, update_error_store

    cfg = _tiny_cfg()
    img = np.asarray(synthetic.sphere_scene_images(cfg.camera, 4))
    angles = np.asarray(rays.view_angle_grid(1))[:4]
    ds = DeviceDataset(img, cfg.camera, angles=angles)
    store = ds.init_error_store()
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    for i in range(5):
        k = jax.random.fold_in(key, i)
        batch = ds.sample_batch_error_weighted(k, 128, store, error_frac=0.5)
        assert batch.idx.shape == (128,)
        state, aux = train_step(state, batch, k, cfg)
        assert aux["ray_err"].shape == (128,)
        store = update_error_store(store, batch.idx, aux["ray_err"])
    assert np.isfinite(np.asarray(store)).all()
    # concentrate all mass on one pixel; >= half the batch must hit it
    hot = jnp.zeros_like(store).at[7].set(1.0)
    b = ds.sample_batch_error_weighted(jax.random.PRNGKey(9), 64, hot, error_frac=0.5)
    assert int((np.asarray(b.idx) == 7).sum()) >= 32
