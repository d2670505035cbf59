"""End-to-end wiring of the data-path config and multi-host gating:
batch_mode=multiview routes reference batch semantics
(src/dataset.rs:63-139) through train(), batch_mode=host feeds the
async PrefetchPipeline, non-primary processes write nothing, and the
error-resampling store survives checkpoint/resume."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import (
    CameraConfig,
    Config,
    DataConfig,
    ModelConfig,
    RenderConfig,
    TrainConfig,
)
from nerf_rs_tpu.train import checkpoint as ckpt
from nerf_rs_tpu.train.loop import train
from nerf_rs_tpu.train.step import init_state


pytestmark = pytest.mark.slow  # e2e/subprocess drives

def _cfg(tmp_path, name, **data_kw):
    return Config(
        camera=CameraConfig(width=16, height=16),
        model=ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                          feature_width=16, view_head_width=8,
                          pos_enc_levels=2, dir_enc_levels=1),
        render=RenderConfig(num_samples=8),
        train=TrainConfig(num_rays=64, num_iter=5, precision="f32",
                          eval_steps=3, logging_steps=2, save_steps=4),
        data=DataConfig(dataset="sphere", num_views_per_hemisphere=2,
                        **data_kw),
        log_dir=str(tmp_path / f"logs_{name}"),
        save_dir=str(tmp_path / f"ckpt_{name}"),
        eval_on_train=True,
    )


def test_multiview_batch_mode_trains(tmp_path):
    cfg = _cfg(tmp_path, "mv", batch_mode="multiview", views_per_batch=4)
    state = train(cfg)
    assert int(state.step) == 5


def test_host_pipeline_batch_mode_trains(tmp_path):
    cfg = _cfg(tmp_path, "host", batch_mode="host", prefetch=2,
               use_native_loader=False)
    state = train(cfg)
    assert int(state.step) == 5
    # and with the native C++ assembler when it builds on this machine
    from nerf_rs_tpu.data import native_loader

    if native_loader.load() is not None:
        cfg = _cfg(tmp_path, "host_native", batch_mode="host",
                   use_native_loader=True)
        state = train(cfg)
        assert int(state.step) == 5


def test_cli_flags_reach_data_config():
    from nerf_rs_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        "train", "--batch_mode", "multiview", "--views_per_batch", "7",
        "--prefetch", "3", "--use_native_loader", "false",
    ])
    cfg = config_from_args(args)
    assert cfg.data.batch_mode == "multiview"
    assert cfg.data.views_per_batch == 7
    assert cfg.data.prefetch == 3
    assert cfg.data.use_native_loader is False


def test_non_primary_process_writes_nothing(tmp_path, monkeypatch):
    """SURVEY §5.8 multi-host plan: checkpoint/TB writes gate on
    dist_init.is_primary — a non-primary process must not double-write."""
    from nerf_rs_tpu.parallel import dist_init

    monkeypatch.setattr(dist_init, "is_primary", lambda: False)
    cfg = _cfg(tmp_path, "nonprimary")
    state = train(cfg)
    assert int(state.step) == 5  # training itself ran
    assert not os.path.exists(cfg.save_dir), "non-primary wrote a checkpoint"
    assert not os.path.exists(cfg.log_dir), "non-primary created a TB run dir"


def test_primary_process_writes(tmp_path):
    cfg = _cfg(tmp_path, "primary")
    train(cfg)
    assert ckpt.latest_checkpoint(cfg.save_dir) is not None
    assert os.path.isdir(cfg.log_dir)


def test_err_store_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, "err")
    state = init_state(jax.random.PRNGKey(0), cfg)
    err = jnp.arange(16 * 16 * 12, dtype=jnp.float32)
    path = ckpt.save(state, cfg.save_dir, err_store=err)
    got = ckpt.load_err_store(path)
    np.testing.assert_array_equal(got, np.asarray(err))
    # checkpoints without a sidecar return None (backward compatible)
    path2 = ckpt.save(state, cfg.save_dir, ts=999)
    assert ckpt.load_err_store(path2) is None


def test_err_store_resumes_through_train(tmp_path):
    """The error distribution must survive a restart (round-1 weakness:
    resume reset it to optimistic-uniform)."""
    cfg = _cfg(tmp_path, "errtrain").replace(
        train=TrainConfig(num_rays=64, num_iter=5, precision="f32",
                          eval_steps=100, logging_steps=100, save_steps=100,
                          error_resample_frac=0.5),
    )
    train(cfg)
    path = ckpt.latest_checkpoint(cfg.save_dir)
    err1 = ckpt.load_err_store(path)
    assert err1 is not None
    # trained errors concentrate: no longer the uniform init
    assert float(np.std(err1)) > 0.0
    # resume for a few more steps; the store must seed from the sidecar
    cfg2 = cfg.replace(train=cfg.train.__class__(
        num_rays=64, num_iter=8, precision="f32", eval_steps=100,
        logging_steps=100, save_steps=100, error_resample_frac=0.5))
    train(cfg2)
    path2 = ckpt.latest_checkpoint(cfg2.save_dir)
    assert path2 != path
    err2 = ckpt.load_err_store(path2)
    assert err2 is not None and not np.allclose(err2, 1.0)
