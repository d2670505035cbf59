"""Weight EMA (--ema_decay): update rule exactness, eval swap,
checkpoint round-trip + pre-EMA back-compat, CLI e2e. The reference
has no EMA anywhere (its Trainer is bare Adam, src/model.rs:301-346);
this is a rebuild extension in the Instant-NGP lineage."""

import os

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
)
from nerf_rs_tpu.train import Batch, init_state, train_step
from nerf_rs_tpu.train import checkpoint as ckpt
from nerf_rs_tpu.train.step import with_ema_params

from test_train import _sphere_batch, _tiny_cfg


def _ema_cfg(decay, **render_kw):
    cfg = _tiny_cfg(**render_kw)
    return Config(
        camera=cfg.camera, model=cfg.model, render=cfg.render,
        train=TrainConfig(num_rays=256, learning_rate=5e-3,
                          precision="f32", ema_decay=decay),
    )


@pytest.mark.slow
def test_ema_update_rule_exact():
    """The stored EMA is DEBIASED: after one step it equals params_1
    exactly (no init-weight leakage — a raw EMA carries d^t of the
    init, which renders garbage on short runs); after two steps it is
    (d*p1 + p2) / (1 + d)."""
    d = 0.9
    cfg = _ema_cfg(d)
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    batch = _sphere_batch(jax.random.fold_in(key, 1), cfg, 256)
    state, _ = train_step(state, batch, jax.random.fold_in(key, 2), cfg)
    p1 = jax.tree_util.tree_map(np.asarray, state.params)
    for w, g in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, state.ema))):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    state, _ = train_step(state, batch, jax.random.fold_in(key, 3), cfg)
    p2 = jax.tree_util.tree_map(np.asarray, state.params)
    want = jax.tree_util.tree_map(
        lambda a, b: (d * a + b) / (1.0 + d), p1, p2)
    got = jax.tree_util.tree_map(np.asarray, state.ema)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_ema_off_by_default():
    cfg = _tiny_cfg()
    state = init_state(jax.random.PRNGKey(0), cfg)
    assert state.ema is None
    batch = _sphere_batch(jax.random.PRNGKey(1), cfg, 256)
    state, _ = train_step(state, batch, jax.random.PRNGKey(2), cfg)
    assert state.ema is None
    # identity swap
    assert with_ema_params(state) is state


def test_with_ema_params_swaps():
    cfg = _ema_cfg(0.5)
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    batch = _sphere_batch(jax.random.fold_in(key, 1), cfg, 256)
    for i in range(3):
        state, _ = train_step(
            state, batch, jax.random.fold_in(key, 2 + i), cfg)
    ev = with_ema_params(state)
    # eval state's params are the EMA, not the raw weights
    raw0 = jax.tree_util.tree_leaves(state.params)[0]
    ema0 = jax.tree_util.tree_leaves(ev.params)[0]
    assert not np.allclose(np.asarray(raw0), np.asarray(ema0))
    np.testing.assert_allclose(
        np.asarray(ema0),
        np.asarray(jax.tree_util.tree_leaves(state.ema)[0]),
    )


@pytest.mark.slow
def test_ema_covers_second_net():
    """With a separate fine MLP the EMA tracks the (params, fine)
    TUPLE, and with_ema_params swaps both."""
    cfg = _ema_cfg(0.9, num_fine_samples=16)
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    assert isinstance(state.ema, tuple) and len(state.ema) == 2
    batch = _sphere_batch(jax.random.fold_in(key, 1), cfg, 256)
    state, _ = train_step(state, batch, jax.random.fold_in(key, 2), cfg)
    ev = with_ema_params(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ev.fine_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema[1])[0]),
    )


def test_dp_step_updates_ema():
    """REGRESSION: the DP step wrappers (what the CLI loop actually
    runs) must update the EMA too. The first real-chip drive of
    --ema_decay trained fine but eval rendered the init weights
    forever: dp.py's hand-rolled optimizer tails skipped the EMA
    update. All step bodies now share step.apply_grads."""
    from nerf_rs_tpu.parallel import dp
    from nerf_rs_tpu.parallel import mesh as mesh_mod

    cfg = _ema_cfg(0.9)
    m = mesh_mod.make_mesh()
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), m)
    step_fn = dp.make_dp_train_step(cfg, m)
    batch = dp.place_batch(_sphere_batch(jax.random.PRNGKey(1), cfg, 256), m)
    e0 = np.asarray(jax.tree_util.tree_leaves(state.ema)[0]).copy()
    state, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema)[0])
    assert np.abs(e1 - e0).max() > 0, "DP step left the EMA at init"
    # debiased EMA == params exactly after the first step
    np.testing.assert_allclose(
        e1, np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        rtol=1e-5, atol=1e-6)


def test_ema_checkpoint_roundtrip(tmp_path):
    """Full restore preserves the EMA; weight-only restore surfaces it
    even when the eval template was built WITHOUT --ema_decay."""
    cfg = _ema_cfg(0.9)
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    batch = _sphere_batch(jax.random.fold_in(key, 1), cfg, 256)
    state, _ = train_step(state, batch, jax.random.fold_in(key, 2), cfg)
    path = ckpt.save(state, str(tmp_path))

    full = ckpt.restore(path, init_state(key, cfg))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(full.ema)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema)[0]),
    )

    # eval-side template: no ema_decay -> template.ema is None, but the
    # checkpoint's EMA must still be restored for inference
    eval_tpl = init_state(key, _tiny_cfg())
    assert eval_tpl.ema is None
    w = ckpt.restore_weights(path, eval_tpl)
    assert w.ema is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(w.ema)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema)[0]),
    )


def test_pre_ema_checkpoint_still_loads(tmp_path):
    """Checkpoints saved without EMA restore into both plain and
    EMA-enabled templates (the round-2 grid-field lesson: a new
    TrainState field must not break old checkpoints)."""
    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    path = ckpt.save(state, str(tmp_path))
    # plain template
    r = ckpt.restore(path, init_state(key, cfg))
    assert r.ema is None
    # EMA-enabled template: backfilled from the template (EMA restarts)
    r2 = ckpt.restore(path, init_state(key, _ema_cfg(0.9)))
    assert r2.ema is not None
    # weight-only restore into a plain template
    r3 = ckpt.restore_weights(path, init_state(key, cfg))
    assert r3.ema is None


@pytest.mark.slow
def test_cli_ema_end_to_end(tmp_path, capsys):
    """train --ema_decay, then eval: inference announces and uses the
    EMA weights."""
    from nerf_rs_tpu.cli import main

    save_dir = str(tmp_path / "ckpt")
    common = [
        "--dataset", "sphere",
        "--width", "24", "--height", "24",
        "--num_rays", "128", "--num_samples", "8",
        "--num_views_per_hemisphere", "2",
        "--log_dir", str(tmp_path / "logs"), "--save_dir", save_dir,
        "--precision", "f32",
    ]
    rc = main(["train", *common, "--num_iter", "12", "--save_steps", "10",
               "--eval_steps", "100", "--logging_steps", "100",
               "--learning_rate", "5e-3", "--ema_decay", "0.9"])
    assert rc == 0
    rc = main(["eval", *common, "--max_views", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "using EMA weights for inference" in out
