"""Scene contraction inside the whole-ray fused kernels
(kernels/fused_render._contract_points/_contract_gaussian): TRAIN-kernel
gradients and RENDER-kernel outputs must match the XLA path (apply_nerf
applies ops/contract before the encoder) for contracted configs, the
point path AND the IPE Gaussian path; plus the disparity-normalized
in-kernel distortion loss vs ops/render.distortion_loss(space=
"disparity"), and the full unbounded recipe riding whole_ray_supported.
Runs in Mosaic interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.config import (
    CameraConfig, Config, ModelConfig, ProposalConfig, RenderConfig,
    TrainConfig,
)
from nerf_rs_tpu.kernels.fused_ray import fused_ray_render
from nerf_rs_tpu.kernels.fused_render import pack_weights
from nerf_rs_tpu.kernels.fused_train import (
    fused_train_grads, pack_weights_t, unpack_grads,
)
from nerf_rs_tpu.models.mlp import apply_nerf, init_nerf_params
from nerf_rs_tpu.ops import render, sampling

CFG = ModelConfig(net_depth=4, net_width=32, skip_layer=2,
                  feature_width=32, view_head_width=16,
                  pos_enc_levels=3, dir_enc_levels=1, contract=True)
CFG_IPE = ModelConfig(net_depth=4, net_width=32, skip_layer=2,
                      feature_width=32, view_head_width=16,
                      pos_enc_levels=3, dir_enc_levels=1, contract=True,
                      ipe=True, sigma_activation="softplus")
S, N, R = 8, 16, 8
NEAR, FAR = 0.3, 12.0  # spans the unit ball: both contraction branches


def _data(key, edges=False):
    """Rays from near the origin, samples from inside AND far outside
    the unit ball (disparity spacing over [0.3, 12])."""
    ko, kd, kt, kg = jax.random.split(key, 4)
    o = jax.random.normal(ko, (N, 3)) * 0.2
    d = jax.random.normal(kd, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    vd = d
    n_t = S + 1 if edges else S
    u = jnp.sort(jax.random.uniform(kt, (N, n_t)), axis=-1)
    ts = 1.0 / (1.0 / NEAR + u * (1.0 / FAR - 1.0 / NEAR))
    gold = jax.random.uniform(kg, (N, 3))
    return o, d, vd, ts, gold


def _jnp_loss(params, o, d, vd, ts, deltas, gold, cfg):
    pts = sampling.points_from_ts(o, d, ts)
    sigma, rgb = apply_nerf(params, pts, vd[:, None, :], cfg,
                            dtype=jnp.bfloat16)
    out = render.composite(sigma, rgb[..., :3], deltas)
    return jnp.mean((out.rgb - gold) ** 2), out


def _assert_grads_close(grads, grads_ref, atol=4e-2):
    flat_k = jax.tree_util.tree_leaves(grads)
    flat_r = jax.tree_util.tree_leaves(grads_ref)
    assert len(flat_k) == len(flat_r)
    for gk, gr in zip(flat_k, flat_r):
        gk, gr = np.asarray(gk), np.asarray(gr)
        assert gk.shape == gr.shape
        scale = max(np.abs(gr).max(), 1e-8)
        np.testing.assert_allclose(gk / scale, gr / scale, atol=atol)


@pytest.mark.slow
def test_train_kernel_contract_point_matches_autodiff():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    o, d, vd, ts, gold = _data(jax.random.PRNGKey(1))
    deltas = sampling.deltas_from_ts(ts, FAR)
    packed = pack_weights(params, CFG)
    packedT = pack_weights_t(packed, CFG)
    tg = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                           CFG, S, rays_per_block=R, interpret=True)
    (loss_ref, out_ref), grads_ref = jax.value_and_grad(
        _jnp_loss, has_aux=True
    )(params, o, d, vd, ts, deltas, gold, CFG)
    np.testing.assert_allclose(np.asarray(tg.diag[:, :3]),
                               np.asarray(out_ref.rgb), atol=2e-2)
    assert abs(float(jnp.mean(tg.diag[:, 4])) - float(loss_ref)) < 2e-3
    _assert_grads_close(unpack_grads(tg, params, CFG), grads_ref)

    # the contraction must actually matter at these (unbounded) shapes:
    # same inputs through the UNcontracted kernel give different rgb
    import dataclasses

    cfg_flat = dataclasses.replace(CFG, contract=False)
    tg_flat = fused_train_grads(
        pack_weights(params, cfg_flat),
        pack_weights_t(pack_weights(params, cfg_flat), cfg_flat),
        o, d, vd, ts, deltas, gold, cfg_flat, S, rays_per_block=R,
        interpret=True)
    assert float(jnp.abs(tg.diag[:, :3] - tg_flat.diag[:, :3]).max()) > 1e-3


def _jnp_loss_ipe(params, o, d, vd, edges, radii, gold, cfg):
    mean, var, t_mids, deltas = sampling.conical_gaussians(
        o, d, edges, radii[:, None])
    sigma, rgb = apply_nerf(params, mean, vd[:, None, :], cfg,
                            dtype=jnp.bfloat16, pos_var=var)
    out = render.composite(sigma, rgb[..., :3], deltas, ts=t_mids)
    return jnp.mean((out.rgb - gold) ** 2), out


def test_train_kernel_contract_ipe_matches_autodiff():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG_IPE)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.0
    o, d, vd, edges, gold = _data(jax.random.PRNGKey(1), edges=True)
    radii = jnp.full((N,), 0.02, jnp.float32)
    t_mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
    deltas = edges[..., 1:] - edges[..., :-1]
    packed = pack_weights(params, CFG_IPE)
    packedT = pack_weights_t(packed, CFG_IPE)
    tg = fused_train_grads(packed, packedT, o, d, vd, t_mids, deltas,
                           gold, CFG_IPE, S, rays_per_block=R,
                           interpret=True, radii=radii)
    (loss_ref, out_ref), grads_ref = jax.value_and_grad(
        _jnp_loss_ipe, has_aux=True
    )(params, o, d, vd, edges, radii, gold, CFG_IPE)
    np.testing.assert_allclose(np.asarray(tg.diag[:, :3]),
                               np.asarray(out_ref.rgb), atol=2e-2)
    assert abs(float(jnp.mean(tg.diag[:, 4])) - float(loss_ref)) < 2e-3
    _assert_grads_close(unpack_grads(tg, params, CFG_IPE), grads_ref)


def test_render_kernel_contract_matches_xla():
    """fused_ray_render with contract=True vs the jnp composite path,
    point AND IPE variants."""
    for cfg, ipe in ((CFG, False), (CFG_IPE, True)):
        params = init_nerf_params(jax.random.PRNGKey(3), cfg)
        params["sigma"]["b"] = params["sigma"]["b"] + 1.0
        o, d, vd, ts_e, gold = _data(jax.random.PRNGKey(4), edges=ipe)
        packed = pack_weights(params, cfg)
        if ipe:
            radii = jnp.full((N,), 0.02, jnp.float32)
            t_mids = 0.5 * (ts_e[..., :-1] + ts_e[..., 1:])
            deltas = ts_e[..., 1:] - ts_e[..., :-1]
            rgb_k, acc_k, _, w_k, _ = fused_ray_render(
                packed, o, d, vd, t_mids, deltas, cfg, S,
                rays_per_block=R, interpret=True, radii=radii)
            _, out_ref = _jnp_loss_ipe(params, o, d, vd, ts_e, radii,
                                       gold, cfg)
        else:
            deltas = sampling.deltas_from_ts(ts_e, FAR)
            rgb_k, acc_k, _, w_k, _ = fused_ray_render(
                packed, o, d, vd, ts_e, deltas, cfg, S,
                rays_per_block=R, interpret=True)
            _, out_ref = _jnp_loss(params, o, d, vd, ts_e, deltas, gold,
                                   cfg)
        np.testing.assert_allclose(np.asarray(rgb_k),
                                   np.asarray(out_ref.rgb), atol=2e-2)
        np.testing.assert_allclose(np.asarray(w_k),
                                   np.asarray(out_ref.weights), atol=2e-2)


DIST_W = 0.05


def _jnp_loss_dist_disparity(params, o, d, vd, ts, deltas, gold, cfg):
    pts = sampling.points_from_ts(o, d, ts)
    sigma, rgb = apply_nerf(params, pts, vd[:, None, :], cfg,
                            dtype=jnp.bfloat16)
    out = render.composite(sigma, rgb[..., :3], deltas, ts=ts)
    photo = jnp.mean((out.rgb - gold) ** 2)
    dist = render.distortion_loss(out.weights, ts, NEAR, FAR,
                                  space="disparity")
    return photo + DIST_W * dist, (out, dist)


def test_kernel_disparity_distortion_matches_autodiff():
    """The in-kernel distortion with dist_space='disparity' reproduces
    ops/render.distortion_loss's disparity normalization — value and
    gradients."""
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5
    o, d, vd, ts, gold = _data(jax.random.PRNGKey(1))
    deltas = sampling.deltas_from_ts(ts, FAR)
    packed = pack_weights(params, CFG)
    packedT = pack_weights_t(packed, CFG)
    tg = fused_train_grads(packed, packedT, o, d, vd, ts, deltas, gold,
                           CFG, S, rays_per_block=R, interpret=True,
                           dist_weight=DIST_W, near=NEAR, far=FAR,
                           dist_space="disparity")
    (_, (out_ref, dist_ref)), grads_ref = jax.value_and_grad(
        _jnp_loss_dist_disparity, has_aux=True
    )(params, o, d, vd, ts, deltas, gold, CFG)
    np.testing.assert_allclose(float(jnp.mean(tg.diag[:, 5])),
                               float(dist_ref), atol=2e-3)
    _assert_grads_close(unpack_grads(tg, params, CFG), grads_ref)


@pytest.mark.slow
def test_unbounded_recipe_rides_whole_ray_kernel():
    """The full mip-NeRF 360 recipe (contract + disparity sampling +
    proposal + disparity-s distortion) passes whole_ray_supported and
    the fused step runs finite and descends (interpret mode)."""
    from nerf_rs_tpu.train import step as step_mod
    from nerf_rs_tpu.train.step import Batch

    cfg = Config(
        camera=CameraConfig(width=16, height=16, near=NEAR, far=FAR),
        model=CFG,
        render=RenderConfig(num_samples=S, sampling_space="disparity"),
        train=TrainConfig(num_rays=N, distortion_weight=0.01,
                          precision="mixed", whole_ray_block=R),
        proposal=ProposalConfig(enabled=True, num_samples=4,
                                net_depth=2, net_width=16),
        use_whole_ray_train=True,
    )
    assert step_mod.whole_ray_supported(cfg)
    key = jax.random.PRNGKey(0)
    from nerf_rs_tpu.train import init_state

    state = init_state(key, cfg)
    params = dict(state.params)
    params["sigma"] = dict(params["sigma"])
    params["sigma"]["b"] = params["sigma"]["b"] + 1.5  # escape the
    # transparent local optimum (fresh init relus all weights to zero)
    trainable = (params, state.fine_params)  # prop net rides the
    # fine_params slot (step._two_nets)
    o, d, vd, ts, gold = _data(jax.random.PRNGKey(1))
    b = Batch(origins=o, dirs=d, gold=gold,
              idx=jnp.zeros((N,), jnp.int32))
    grads, aux = step_mod.whole_ray_grads(
        trainable, b, jax.random.PRNGKey(2), cfg, step=jnp.int32(2000))
    assert "loss_dist" in aux and np.isfinite(float(aux["loss_dist"]))
    assert np.isfinite(float(aux["loss"]))
    lr = 1e-2
    cur, cur_aux = trainable, aux
    for _ in range(5):  # SGD descends the photometric term
        g, cur_aux = step_mod.whole_ray_grads(
            cur, b, jax.random.PRNGKey(2), cfg, step=jnp.int32(2000))
        cur = jax.tree_util.tree_map(lambda p, gg: p - lr * gg, cur, g)
    _, aux2 = step_mod.whole_ray_grads(
        cur, b, jax.random.PRNGKey(2), cfg, step=jnp.int32(2000))
    assert float(aux2["loss_coarse"]) < float(aux["loss_coarse"])
