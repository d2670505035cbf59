"""mip-NeRF 360 unbounded-scene support: scene contraction
(ops/contract.py), disparity-spaced sampling
(ops/sampling.stratified_ts(space="disparity")), disparity-space
distortion loss, config validation, the CLI `unbounded` preset, and an
end-to-end fit on the unbounded procedural lego360 scene."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.config import (
    CameraConfig, Config, DataConfig, ModelConfig, ProposalConfig,
    RenderConfig, TrainConfig,
)
from nerf_rs_tpu.ops import sampling
from nerf_rs_tpu.ops.contract import contract, contract_gaussian


def _pts(key, n=256, lo=0.0, hi=30.0):
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r = jax.random.uniform(k2, (n, 1), minval=lo, maxval=hi)
    return d * r


def test_contract_identity_inside_unit_ball():
    x = _pts(jax.random.PRNGKey(0), hi=0.999)
    np.testing.assert_allclose(np.asarray(contract(x)), np.asarray(x),
                               rtol=0, atol=0)


def test_contract_maps_into_radius2_ball_monotonically():
    x = _pts(jax.random.PRNGKey(1), lo=0.01, hi=1e4)
    y = np.asarray(contract(x))
    r_in = np.linalg.norm(np.asarray(x), axis=-1)
    r_out = np.linalg.norm(y, axis=-1)
    assert (r_out < 2.0).all()
    # direction preserved, radius monotone: 2 - 1/r is increasing
    np.testing.assert_allclose(y / r_out[:, None],
                               np.asarray(x) / r_in[:, None], atol=1e-5)
    order = np.argsort(r_in)
    assert (np.diff(r_out[order]) > -1e-4).all()  # f32 noise at large r


def test_contract_finite_gradient_at_origin():
    """A sample landing exactly at the origin must not NaN the step:
    norm's 0/0 gradient leaks through jnp.where (0*NaN=NaN) unless the
    clamp sits UNDER the sqrt."""
    x = jnp.zeros((4, 3))
    g = jax.grad(lambda p: jnp.sum(contract(p)))(x)
    assert np.isfinite(np.asarray(g)).all()
    gm, gv = jax.grad(
        lambda p: jnp.sum(sum(contract_gaussian(p, jnp.ones_like(p))))
    )(x), None
    assert np.isfinite(np.asarray(gm)).all()
    m, v = contract_gaussian(x, jnp.full((4, 3), 0.1))
    assert np.isfinite(np.asarray(m)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_contract_continuous_at_unit_sphere():
    d = np.array(_pts(jax.random.PRNGKey(2), n=32, lo=1.0, hi=1.0))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    inner = contract(jnp.asarray(d * (1.0 - 1e-6)))
    outer = contract(jnp.asarray(d * (1.0 + 1e-6)))
    np.testing.assert_allclose(np.asarray(inner), np.asarray(outer),
                               atol=1e-5)


def test_contract_gaussian_matches_autodiff_linearization():
    """The closed-form diag(J Sigma J^T) must equal the full-Jacobian
    computation via jacfwd, inside AND outside the unit ball."""
    key = jax.random.PRNGKey(3)
    x = np.asarray(_pts(key, n=64, lo=0.2, hi=20.0), np.float64)
    var = np.abs(np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (64, 3)))) * 0.1

    mean_c, var_c = contract_gaussian(jnp.asarray(x, jnp.float32),
                                      jnp.asarray(var, jnp.float32))
    np.testing.assert_allclose(np.asarray(mean_c),
                               np.asarray(contract(jnp.asarray(x))),
                               atol=1e-6)
    J = np.asarray(jax.vmap(jax.jacfwd(contract))(jnp.asarray(x)))
    want = np.einsum("nij,nj,nkj->nik", J, var, J)  # J diag(var) J^T
    np.testing.assert_allclose(np.asarray(var_c),
                               np.diagonal(want, axis1=1, axis2=2),
                               rtol=2e-4, atol=1e-6)


def test_disparity_stratified_ts_spacing():
    near, far, S = 0.5, 50.0, 64
    ts = sampling.stratified_ts(jax.random.PRNGKey(0), 128, S, near, far,
                                randomized=False, space="disparity")
    t = np.asarray(ts)
    assert t.shape == (128, S)
    assert (np.diff(t, axis=-1) > 0).all()
    assert (t > near).all() and (t < far).all()
    # deterministic midpoints sit at the metric centers of 1/t-even bins
    bins = 1.0 / np.linspace(1.0 / near, 1.0 / far, S + 1)
    np.testing.assert_allclose(t[0], 0.5 * (bins[:-1] + bins[1:]),
                               rtol=1e-5)
    # randomized draws stay inside their bins (sorted by construction)
    tr = np.asarray(sampling.stratified_ts(
        jax.random.PRNGKey(1), 128, S, near, far, randomized=True,
        space="disparity"))
    assert (np.diff(tr, axis=-1) > 0).all()
    assert (tr >= bins[:-1] - 1e-6).all() and (tr <= bins[1:] + 1e-6).all()


def test_distortion_loss_disparity_space():
    from nerf_rs_tpu.ops.render import distortion_loss

    near, far = 0.5, 50.0
    ts = sampling.stratified_ts(jax.random.PRNGKey(0), 8, 32, near, far,
                                randomized=False, space="disparity")
    # concentrated weights must score lower than spread-out weights
    w_spread = jnp.full((8, 32), 1.0 / 32)
    w_tight = jnp.zeros((8, 32)).at[:, 10].set(1.0)
    l_spread = float(distortion_loss(w_spread, ts, near, far,
                                     space="disparity"))
    l_tight = float(distortion_loss(w_tight, ts, near, far,
                                    space="disparity"))
    assert np.isfinite(l_spread) and np.isfinite(l_tight)
    assert 0.0 <= l_tight < l_spread


def test_config_validation():
    cam = CameraConfig(near=0.3, far=60.0)
    ok = Config(camera=cam, model=ModelConfig(contract=True),
                render=RenderConfig(sampling_space="disparity"))
    assert ok.model.contract
    with pytest.raises(ValueError, match="near must be > 0"):
        Config(camera=CameraConfig(near=0.0, far=60.0),
               render=RenderConfig(sampling_space="disparity"))
    with pytest.raises(ValueError, match="reparameterization"):
        Config(camera=CameraConfig(ndc=True, near=0.0, far=1.0),
               model=ModelConfig(contract=True))
    with pytest.raises(ValueError, match="occ"):
        Config(camera=cam, model=ModelConfig(contract=True),
               render=RenderConfig(occ_res=32))
    with pytest.raises(ValueError, match="compat"):
        Config(camera=cam, model=ModelConfig(contract=True, compat=True))
    with pytest.raises(ValueError, match="linear.*disparity|disparity"):
        RenderConfig(sampling_space="banana")


def _tiny_model(**kw):
    return ModelConfig(net_depth=2, net_width=32, skip_layer=1,
                       feature_width=32, view_head_width=16,
                       pos_enc_levels=4, dir_enc_levels=2, **kw)


def test_render_rays_contract_disparity_smoke():
    """Contracted + disparity-sampled rendering is finite and actually
    changes the output vs the uncontracted field (same params/key)."""
    from nerf_rs_tpu.models.mlp import init_nerf_params
    from nerf_rs_tpu.ops.render import render_rays

    cam = CameraConfig(width=16, height=16, near=0.3, far=60.0)
    key = jax.random.PRNGKey(0)
    params = init_nerf_params(key, _tiny_model())
    o = jnp.zeros((32, 3)) + jnp.asarray([0.0, 0.0, 4.0])
    d = np.asarray(_pts(jax.random.fold_in(key, 1), n=32, lo=1.0, hi=1.0))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    outs = {}
    for name, (c, s) in {
        "plain": (False, "linear"),
        "unbounded": (True, "disparity"),
    }.items():
        coarse, fine = render_rays(
            params, o, d, jax.random.PRNGKey(2), _tiny_model(contract=c),
            RenderConfig(num_samples=24, randomized=False,
                         sampling_space=s),
            cam,
        )
        assert fine is None
        assert np.isfinite(np.asarray(coarse.rgb)).all()
        assert float(jnp.max(coarse.ts)) < 60.0
        outs[name] = np.asarray(coarse.rgb)
    assert np.abs(outs["plain"] - outs["unbounded"]).max() > 1e-6


def test_contract_ipe_composition():
    """IPE + contract: the Gaussian path must route through
    contract_gaussian (finite, and distinct from the uncontracted IPE)."""
    from nerf_rs_tpu.models.mlp import apply_nerf, init_nerf_params

    key = jax.random.PRNGKey(0)
    cfg_c = _tiny_model(ipe=True, contract=True)
    params = init_nerf_params(key, cfg_c)
    pts = _pts(jax.random.fold_in(key, 1), n=16, lo=0.5, hi=10.0)[:, None, :]
    var = jnp.full(pts.shape, 0.01)
    vd = jnp.asarray([[0.0, 0.0, 1.0]])[:, None, :]
    sig_c, rgb_c = apply_nerf(params, pts, vd, cfg_c, pos_var=var)
    sig_u, rgb_u = apply_nerf(params, pts, vd,
                              _tiny_model(ipe=True), pos_var=var)
    assert np.isfinite(np.asarray(sig_c)).all()
    assert np.isfinite(np.asarray(rgb_c)).all()
    assert np.abs(np.asarray(rgb_c) - np.asarray(rgb_u)).max() > 1e-6


def test_proposal_resample_contracted():
    """The proposal MLP must see contracted points (finite resample) —
    the main-field/proposal coordinate charts agree."""
    from nerf_rs_tpu.models.proposal import init_proposal_params
    from nerf_rs_tpu.ops.proposal import proposal_resample

    pcfg = ProposalConfig(enabled=True, num_samples=16, num_levels=2,
                          net_depth=2, net_width=16, pos_enc_levels=4)
    cam = CameraConfig(near=0.3, far=60.0)
    key = jax.random.PRNGKey(0)
    pp = init_proposal_params(key, pcfg)
    o = jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, 4.0])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
    ts, hists = proposal_resample(
        key, o, d, pp, pcfg, 12, cam, True, space="disparity",
        contract=True,
    )
    assert ts.shape == (8, 12)
    t = np.asarray(ts)
    assert np.isfinite(t).all() and (np.diff(t, axis=-1) >= 0).all()
    assert len(hists) == 2


def test_contract_covered_by_fused_kernels():
    """Round 4: contraction + disparity-s distortion both live inside
    the whole-ray kernels (tests/test_contract_kernel.py has the parity
    proofs), so the whole unbounded family rides the fused path."""
    from nerf_rs_tpu.ops.render import fused_supported, train_fused_supported
    from nerf_rs_tpu.train.step import whole_ray_supported

    m = ModelConfig(contract=True)
    assert train_fused_supported(m) and fused_supported(m)
    cfg = Config(camera=CameraConfig(near=0.3, far=60.0), model=m,
                 use_whole_ray_train=True)
    assert whole_ray_supported(cfg)
    # disparity sampling + the in-kernel disparity-s distortion loss
    cfg2 = Config(camera=CameraConfig(near=0.3, far=60.0),
                  render=RenderConfig(sampling_space="disparity"),
                  train=TrainConfig(distortion_weight=0.01),
                  use_whole_ray_train=True)
    assert whole_ray_supported(cfg2)


def test_unbounded_preset_cli():
    import nerf_rs_tpu.cli as cli

    args = cli.build_parser().parse_args(
        ["train", "--preset", "unbounded", "--dataset", "sphere"])
    args._explicit = {"preset"}
    cfg = cli.config_from_args(args)
    assert cfg.model.contract
    assert cfg.render.sampling_space == "disparity"
    assert cfg.proposal.enabled and cfg.proposal.num_levels == 2
    assert cfg.train.distortion_weight == 0.01
    assert cfg.camera.near == 0.3 and cfg.camera.far == 60.0
    # explicit user flags still beat the preset
    args2 = cli.build_parser().parse_args(
        ["train", "--preset", "unbounded", "--far", "120",
         "--dataset", "sphere"])
    args2._explicit = {"preset", "far"}
    cfg2 = cli.config_from_args(args2)
    assert cfg2.camera.far == 120.0


@pytest.mark.slow
def test_unbounded_training_fits_lego360(tmp_path):
    """End-to-end: tiny unbounded procedural scene, contract + disparity
    through the plain train step — the loss must collapse, proving the
    whole chain (scene gen, sampler, contraction, distortion) learns."""
    from nerf_rs_tpu.data.factory import make_dataset
    from nerf_rs_tpu.data.procedural import make_blender_scene
    from nerf_rs_tpu.train import init_state, train_step

    scene_dir = str(tmp_path / "lego360")
    make_blender_scene(scene_dir, size=32, n_train=6, n_val=1, n_test=2,
                       num_samples=256, verbose=False, scene="lego360")
    cfg = Config(
        camera=CameraConfig(width=32, height=32, near=0.3, far=60.0),
        model=ModelConfig(net_depth=3, net_width=48, skip_layer=2,
                          feature_width=48, view_head_width=24,
                          pos_enc_levels=6, dir_enc_levels=2,
                          contract=True),
        render=RenderConfig(num_samples=48, sampling_space="disparity"),
        train=TrainConfig(num_rays=256, precision="f32",
                          learning_rate=2e-3, distortion_weight=0.005),
        data=DataConfig(dataset="blender", img_dir=scene_dir),
    )
    ds = make_dataset(cfg)
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    losses = []
    for i in range(200):
        batch = ds.sample_batch(jax.random.fold_in(key, i), 256)
        state, aux = train_step(state, batch,
                                jax.random.fold_in(key, 10_000 + i), cfg)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # the unbounded scene's photometric floor is higher than the bounded
    # fixtures' (far content at a tiny MLP's capacity limit): measured
    # ratio ~0.42 at 200 steps, still strictly decreasing beyond
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])
