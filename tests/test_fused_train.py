"""Whole-ray fused TRAIN kernel (kernels/fused_train.py): gradients and
forward outputs must match jax.grad of the equivalent jnp pipeline.
Runs in Mosaic interpret mode on CPU."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig, ModelConfig, RenderConfig
from nerf_rs_tpu.kernels.fused_render import pack_weights
from nerf_rs_tpu.kernels.fused_train import (
    fused_train_grads,
    pack_weights_t,
    unpack_grads,
)
from nerf_rs_tpu.models.mlp import init_nerf_params
from nerf_rs_tpu.ops import render, sampling

CFG = ModelConfig(net_depth=4, net_width=32, skip_layer=2,
                  feature_width=32, view_head_width=16,
                  pos_enc_levels=3, dir_enc_levels=1)
S, N, R = 8, 16, 8
FAR = 2.0


def _data(key):
    ko, kd, kt, kg = jax.random.split(key, 4)
    o = jax.random.normal(ko, (N, 3)) * 0.1
    o = o.at[:, 2].add(-1.0)
    d = jax.random.normal(kd, (N, 3)) * 0.05
    d = d.at[:, 2].add(1.0)
    vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ts = jnp.sort(jax.random.uniform(kt, (N, S)) * 1.8 + 0.05, axis=-1)
    deltas = sampling.deltas_from_ts(ts, FAR)
    gold = jax.random.uniform(kg, (N, 3))
    return o, d, vd, ts, deltas, gold


def _jnp_loss(params, o, d, vd, ts, deltas, gold, white_bg):
    """The exact math the kernel implements, in plain jnp (f32)."""
    from nerf_rs_tpu.models.mlp import apply_nerf

    pts = sampling.points_from_ts(o, d, ts)
    sigma, rgb = apply_nerf(params, pts, vd[:, None, :], CFG,
                            dtype=jnp.bfloat16)
    out = render.composite(sigma, rgb[..., :3], deltas,
                           white_background=white_bg)
    return jnp.mean((out.rgb - gold) ** 2), out


@pytest.mark.slow
def test_forward_and_grads_match_autodiff():
    for white_bg in (False, True):
        params = init_nerf_params(jax.random.PRNGKey(0), CFG)
        o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(1))
        packed = pack_weights(params, CFG)
        packedT = pack_weights_t(packed, CFG)
        tg = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                               CFG, S, white_bg=white_bg, rays_per_block=R,
                               interpret=True)
        (loss_ref, out_ref), grads_ref = jax.value_and_grad(
            _jnp_loss, has_aux=True
        )(params, o, d, vd, ts, deltas, gold, white_bg)

        # forward parity: per-ray rgb and loss
        np.testing.assert_allclose(np.asarray(tg.diag[:, :3]),
                                   np.asarray(out_ref.rgb), atol=2e-2)
        loss_kernel = float(jnp.mean(tg.diag[:, 4]))
        assert abs(loss_kernel - float(loss_ref)) < 2e-3, (
            loss_kernel, float(loss_ref), white_bg)

        # gradient parity, leaf by leaf (bf16 matmuls both sides)
        grads = unpack_grads(tg, params, CFG)
        flat_k, _ = jax.tree_util.tree_flatten(grads)
        flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
        assert len(flat_k) == len(flat_r)
        for gk, gr in zip(flat_k, flat_r):
            gk, gr = np.asarray(gk), np.asarray(gr)
            assert gk.shape == gr.shape
            scale = max(np.abs(gr).max(), 1e-8)
            np.testing.assert_allclose(gk / scale, gr / scale, atol=4e-2)


def test_grad_direction_descends():
    """One SGD step along the kernel's gradient must reduce the jnp loss."""
    params = init_nerf_params(jax.random.PRNGKey(2), CFG)
    o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(3))
    packed = pack_weights(params, CFG)
    tg = fused_train_grads(packed, pack_weights_t(packed, CFG),
                           o, d, vd, ts, deltas, gold, CFG, S,
                           rays_per_block=R, interpret=True)
    grads = unpack_grads(tg, params, CFG)
    loss0, _ = _jnp_loss(params, o, d, vd, ts, deltas, gold, False)
    lr = 1e-1
    stepped = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    loss1, _ = _jnp_loss(stepped, o, d, vd, ts, deltas, gold, False)
    assert float(loss1) < float(loss0)


def test_grad_accumulates_across_blocks():
    """N=2R must equal the ray-mean of two independent R-blocks (the
    VMEM accumulation across grid steps)."""
    params = init_nerf_params(jax.random.PRNGKey(4), CFG)
    o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(5))
    packed = pack_weights(params, CFG)
    packedT = pack_weights_t(packed, CFG)
    tg_all = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                               CFG, S, rays_per_block=R, interpret=True)
    halves = []
    for sl in (slice(0, R), slice(R, None)):
        halves.append(fused_train_grads(
            packed, packedT, o[sl], d[sl], vd[sl], ts[sl], deltas[sl],
            gold[sl], CFG, S, rays_per_block=R, interpret=True))
    g_all = unpack_grads(tg_all, params, CFG)
    g_mean = jax.tree_util.tree_map(
        lambda a, b: 0.5 * (a + b),
        unpack_grads(halves[0], params, CFG),
        unpack_grads(halves[1], params, CFG),
    )
    for ga, gm in zip(jax.tree_util.tree_leaves(g_all),
                      jax.tree_util.tree_leaves(g_mean)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gm),
                                   atol=1e-5, rtol=1e-4)


def test_whole_ray_train_step_converges():
    """Config.use_whole_ray_train routes train_step through the kernel
    (interpret mode on CPU) and the loss must descend."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.train.step import (
        Batch, init_state, train_step, whole_ray_supported,
    )

    cfg = Config(
        camera=CameraConfig(),
        model=CFG,
        render=RenderConfig(num_samples=S),
        train=TrainConfig(num_rays=N, precision="mixed",
                          learning_rate=1e-2, whole_ray_block=R),
        use_whole_ray_train=True,
    )
    assert whole_ray_supported(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg)
    # bump the sigma bias so the field is not transparent at init — a
    # fully relu-dead sigma has an EXACTLY zero gradient (the known
    # transparent local optimum), for the kernel and autodiff alike
    state.params["sigma"]["b"] = state.params["sigma"]["b"] + 0.5
    o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(1))
    batch = Batch(origins=o, dirs=d, gold=gold)
    losses = []
    for i in range(20):
        state, aux = train_step(state, batch, jax.random.PRNGKey(i), cfg)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::5]
    assert aux["ray_err"].shape == (N,)


def test_kernel_weights_match_jnp_compositing():
    """The kernel's per-ray weights output (the hierarchical PDF input)
    must match composite()'s weights."""
    params = init_nerf_params(jax.random.PRNGKey(6), CFG)
    o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(7))
    packed = pack_weights(params, CFG)
    tg = fused_train_grads(packed, pack_weights_t(packed, CFG),
                           o, d, vd, ts, deltas, gold, CFG, S,
                           rays_per_block=R, interpret=True)
    _, out_ref = _jnp_loss(params, o, d, vd, ts, deltas, gold, False)
    assert tg.weights.shape == (N, S)
    np.testing.assert_allclose(np.asarray(tg.weights),
                               np.asarray(out_ref.weights), atol=2e-2)


def test_hierarchical_chain_matches_autodiff():
    """whole_ray_grads' coarse-kernel -> PDF-resample -> fine-kernel
    chain (shared network, standalone fine mode) must match jax.grad of
    the equivalent two-pass jnp loss evaluated at the same sample sets."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.train.step import Batch, whole_ray_grads

    cfg = Config(
        camera=CameraConfig(),
        model=CFG,
        render=RenderConfig(num_samples=S, num_fine_samples=S,
                            share_network=True, fine_mode="standalone",
                            randomized=False),
        train=TrainConfig(num_rays=N, precision="mixed", whole_ray_block=R),
        use_whole_ray_train=True,
    )
    params = init_nerf_params(jax.random.PRNGKey(8), CFG)
    params["sigma"]["b"] = params["sigma"]["b"] + 0.5  # non-transparent
    ko, kd, kg = jax.random.split(jax.random.PRNGKey(9), 3)
    o = (jax.random.normal(ko, (N, 3)) * 0.1).at[:, 2].add(-1.0)
    d = (jax.random.normal(kd, (N, 3)) * 0.05).at[:, 2].add(1.0)
    vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    gold = jax.random.uniform(kg, (N, 3))
    batch = Batch(origins=o, dirs=d, gold=gold)

    grads, aux = whole_ray_grads(params, batch, jax.random.PRNGKey(10), cfg)
    assert set(aux) >= {"loss", "loss_coarse", "loss_fine", "psnr", "ray_err"}

    # reproduce the chain's sample sets: midpoint coarse ts, then the
    # deterministic inverse-CDF resample of the KERNEL's coarse weights
    ts = sampling.stratified_ts(jax.random.PRNGKey(0), N, S,
                                cfg.camera.near, cfg.camera.far, False)
    deltas = sampling.deltas_from_ts(ts, cfg.camera.far)
    packed = pack_weights(params, CFG)
    tg_c = fused_train_grads(packed, pack_weights_t(packed, CFG),
                             o, d, vd, ts, deltas, gold, CFG, S,
                             rays_per_block=R, interpret=True)
    mids = 0.5 * (ts[..., 1:] + ts[..., :-1])
    bins = jnp.concatenate([ts[..., :1], mids, ts[..., -1:]], axis=-1)
    fine_ts = jnp.sort(sampling.sample_pdf(
        jax.random.PRNGKey(0), bins, tg_c.weights, S, False), axis=-1)

    def two_pass_loss(p):
        lc, _ = _jnp_loss(p, o, d, vd, ts, deltas, gold, False)
        lf, _ = _jnp_loss(p, o, d, vd, fine_ts,
                          sampling.deltas_from_ts(fine_ts, cfg.camera.far),
                          gold, False)
        return lc + lf

    loss_ref, grads_ref = jax.value_and_grad(two_pass_loss)(params)
    assert abs(float(aux["loss"]) - float(loss_ref)) < 4e-3
    for gk, gr in zip(jax.tree_util.tree_leaves(grads),
                      jax.tree_util.tree_leaves(grads_ref)):
        scale = max(np.abs(np.asarray(gr)).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(gk) / scale,
                                   np.asarray(gr) / scale, atol=5e-2)


@pytest.mark.slow
def test_hierarchical_whole_ray_train_converges():
    """End-to-end: hierarchical train_step through the kernel chain
    descends, for the shared-net and separate-fine-net variants."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.train.step import (
        Batch, init_state, train_step, whole_ray_supported,
    )

    for share in (True, False):
        cfg = Config(
            camera=CameraConfig(),
            model=CFG,
            render=RenderConfig(num_samples=S, num_fine_samples=S,
                                share_network=share,
                                fine_mode="standalone" if share else "union"),
            train=TrainConfig(num_rays=N, precision="mixed",
                              learning_rate=1e-2, whole_ray_block=R),
            use_whole_ray_train=True,
        )
        assert whole_ray_supported(cfg)
        state = init_state(jax.random.PRNGKey(0), cfg)
        state.params["sigma"]["b"] = state.params["sigma"]["b"] + 0.5
        if state.fine_params is not None:
            state.fine_params["sigma"]["b"] = (
                state.fine_params["sigma"]["b"] + 0.5
            )
        o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(1))
        batch = Batch(origins=o, dirs=d, gold=gold)
        losses = []
        for i in range(20):
            state, aux = train_step(state, batch, jax.random.PRNGKey(i), cfg)
            losses.append(float(aux["loss"]))
        assert losses[-1] < losses[0] * 0.8, (share, losses[::5])
        assert "loss_fine" in aux


@pytest.mark.slow
def test_whole_ray_dp_step_matches_single_device():
    """The DP wrapper routes through the kernel per shard; the 8-way
    sharded step must track the single-device step numerically."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
    from nerf_rs_tpu.train.step import Batch, init_state, train_step

    cfg = Config(
        camera=CameraConfig(),
        model=CFG,
        render=RenderConfig(num_samples=S, randomized=False),
        train=TrainConfig(num_rays=64, precision="f32", whole_ray_block=8),
        use_whole_ray_train=True,
    )
    mesh = mesh_mod.make_mesh(8)
    key = jax.random.PRNGKey(0)
    state_1 = init_state(key, cfg)
    state_8 = dp.place_state(init_state(key, cfg), mesh)
    ko, kd, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    o = (jax.random.normal(ko, (64, 3)) * 0.1).at[:, 2].add(-1.0)
    d = (jax.random.normal(kd, (64, 3)) * 0.05).at[:, 2].add(1.0)
    gold = jax.random.uniform(kg, (64, 3))
    batch = Batch(origins=o, dirs=d, gold=gold)
    step8 = dp.make_dp_train_step(cfg, mesh)
    state_8, aux8 = step8(state_8, dp.place_batch(batch, mesh),
                          jax.random.PRNGKey(2))
    state_1, aux1 = train_step(state_1, batch, jax.random.PRNGKey(2), cfg)
    # randomized=False makes sampling key-independent, so the per-shard
    # key folds don't matter: 8 shard means pmean'd == the 64-ray mean,
    # and the post-Adam params must agree to f32 summation-order noise
    # (the recipe of test_parallel.py's XLA-path parity test)
    np.testing.assert_allclose(
        float(aux8["loss"]), float(aux1["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="sharded whole-ray step diverged from single-device",
        )


@pytest.mark.slow
def test_halves_interleaving_matches_single_stream():
    """halves=2 (MXU/VPU sub-block interleaving) computes the same
    forward outputs and gradients as the single-stream kernel — only
    the dW summation order differs (register-sum before the VMEM
    accumulate), so agreement is to f32 noise."""
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    o, d, vd, ts, deltas, gold = _data(jax.random.PRNGKey(1))
    packed = pack_weights(params, CFG)
    packedT = pack_weights_t(packed, CFG)
    tg1 = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                            CFG, S, rays_per_block=R, interpret=True,
                            halves=1)
    tg2 = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                            CFG, S, rays_per_block=R, interpret=True,
                            halves=2)
    for a, b in zip(jax.tree_util.tree_leaves(tg1),
                    jax.tree_util.tree_leaves(tg2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


@pytest.mark.slow
def test_unaligned_sample_count_pads_exactly():
    """S % 8 != 0 (the union fine pass's S + S_f + 1 shape) triggers the
    Mosaic compile-guard padding (round 5): zero-length intervals at the
    far end must leave forward outputs, weights shape, and every
    gradient leaf identical to the same rays evaluated at their true S
    via autodiff."""
    S_odd = 13
    params = init_nerf_params(jax.random.PRNGKey(4), CFG)
    o, d, vd, _, _, gold = _data(jax.random.PRNGKey(5))
    ts = jnp.sort(jax.random.uniform(jax.random.PRNGKey(6), (N, S_odd))
                  * 1.8 + 0.05, axis=-1)
    deltas = sampling.deltas_from_ts(ts, FAR)
    packed = pack_weights(params, CFG)
    tg = fused_train_grads(packed, pack_weights_t(packed, CFG),
                           o, d, vd, ts, deltas, gold, CFG, S_odd,
                           white_bg=True, rays_per_block=R, interpret=True)
    assert tg.weights.shape == (N, S_odd)  # pad intervals dropped
    (loss_ref, out_ref), grads_ref = jax.value_and_grad(
        _jnp_loss, has_aux=True
    )(params, o, d, vd, ts, deltas, gold, True)
    np.testing.assert_allclose(np.asarray(tg.diag[:, :3]),
                               np.asarray(out_ref.rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(tg.weights),
                               np.asarray(out_ref.weights), atol=2e-2)
    assert abs(float(jnp.mean(tg.diag[:, 4])) - float(loss_ref)) < 2e-3
    grads = unpack_grads(tg, params, CFG)
    flat_k, _ = jax.tree_util.tree_flatten(grads)
    flat_r, _ = jax.tree_util.tree_flatten(grads_ref)
    for gk, gr in zip(flat_k, flat_r):
        gk, gr = np.asarray(gk), np.asarray(gr)
        scale = max(np.abs(gr).max(), 1e-8)
        np.testing.assert_allclose(gk / scale, gr / scale, atol=4e-2)


def test_unaligned_render_kernel_pads_exactly():
    """fused_ray_render at S % 8 != 0: padded intervals contribute zero
    weight; rgb/acc/weights match the composite oracle at true S."""
    from nerf_rs_tpu.kernels.fused_ray import fused_ray_render

    S_odd = 11
    params = init_nerf_params(jax.random.PRNGKey(7), CFG)
    o, d, vd, _, _, _ = _data(jax.random.PRNGKey(8))
    ts = jnp.sort(jax.random.uniform(jax.random.PRNGKey(9), (N, S_odd))
                  * 1.8 + 0.05, axis=-1)
    deltas = sampling.deltas_from_ts(ts, FAR)
    packed = pack_weights(params, CFG)
    rgb_k, acc_k, _, w_k, sig_k = fused_ray_render(
        packed, o, d, vd, ts, deltas, CFG, S_odd,
        rays_per_block=R, interpret=True)
    assert w_k.shape == (N, S_odd) and sig_k.shape == (N, S_odd)
    _, out_ref = _jnp_loss(params, o, d, vd, ts, deltas,
                           jnp.zeros((N, 3)), False)
    np.testing.assert_allclose(np.asarray(rgb_k),
                               np.asarray(out_ref.rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(w_k),
                               np.asarray(out_ref.weights), atol=2e-2)
