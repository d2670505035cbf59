"""Volume rendering tests: golden hand-computed compositing, O(N) vs
the reference's O(N^2) formulation, white background, and the full
render_rays pipeline."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig, ModelConfig, RenderConfig
from nerf_rs_tpu.models.mlp import init_nerf_params
from nerf_rs_tpu.ops import rays, render


def _reference_composite_numpy(sigma, colors, deltas):
    """The reference's math verbatim (src/model.rs:221-249):
    T_i = exp(-sum_{j<i} sigma_j*delta_j) re-reduced per i (O(N^2)),
    w_i = T_i*(1-exp(-sigma_i*delta_i)), C = sum w_i c_i."""
    n_rays, n_pts = sigma.shape
    T = np.ones((n_rays, n_pts))
    for i in range(1, n_pts):
        T[:, i] = np.exp(-(sigma[:, :i] * deltas[:, :i]).sum(-1))
    w = T * (1.0 - np.exp(-sigma * deltas))
    return (w[..., None] * colors).sum(1), w


def test_composite_matches_reference_formula():
    rng = np.random.RandomState(0)
    sigma = rng.uniform(-0.5, 2.0, (8, 16)).astype(np.float32)  # incl. negative (compat)
    colors = rng.uniform(0, 1, (8, 16, 3)).astype(np.float32)
    deltas = rng.uniform(0.01, 0.2, (8, 16)).astype(np.float32)
    want_rgb, want_w = _reference_composite_numpy(sigma, colors, deltas)
    out = render.composite(jnp.asarray(sigma), jnp.asarray(colors), jnp.asarray(deltas))
    np.testing.assert_allclose(np.asarray(out.rgb), want_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights), want_w, atol=1e-5)


def test_composite_golden_hand_computed():
    # 1 ray, 3 samples, hand-computed transmittance
    sigma = jnp.array([[1.0, 2.0, 0.5]])
    deltas = jnp.array([[0.1, 0.2, 0.3]])
    colors = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    T1, T2, T3 = 1.0, np.exp(-0.1), np.exp(-0.1 - 0.4)
    a1, a2, a3 = 1 - np.exp(-0.1), 1 - np.exp(-0.4), 1 - np.exp(-0.15)
    want = np.array([[T1 * a1, T2 * a2, T3 * a3]])
    out = render.composite(sigma, colors, deltas)
    np.testing.assert_allclose(np.asarray(out.weights), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb), want, atol=1e-5)  # identity colors


def test_white_background():
    sigma = jnp.zeros((2, 4))
    colors = jnp.zeros((2, 4, 3))
    deltas = jnp.full((2, 4), 0.25)
    out = render.composite(sigma, colors, deltas, white_background=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-6)  # empty -> white
    assert float(out.acc.max()) == 0.0


def test_opaque_wall_depth():
    # huge density at sample 2 => depth ~ t2, acc ~ 1
    ts = jnp.array([[0.5, 1.0, 1.5, 2.0]])
    sigma = jnp.array([[0.0, 1000.0, 0.0, 0.0]])
    deltas = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    colors = jnp.ones((1, 4, 3)) * 0.5
    out = render.composite(sigma, colors, deltas, ts=ts)
    assert abs(float(out.depth[0]) - 1.0) < 1e-3
    assert abs(float(out.acc[0]) - 1.0) < 1e-5


@pytest.mark.slow
def test_render_rays_shapes_and_fine():
    cam = CameraConfig()
    mcfg = ModelConfig(net_width=32, net_depth=3, skip_layer=2, feature_width=32, view_head_width=16)
    rcfg = RenderConfig(num_samples=8, num_fine_samples=16)
    params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
    pose = rays.pose_from_yaw_pitch(jnp.float32(0.2), jnp.float32(0.1))
    o, d = rays.rays_for_coords(jnp.array([[1.0, 2.0], [3.0, 4.0]]), pose, cam)
    coarse, fine = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), mcfg, rcfg, cam
    )
    assert coarse.rgb.shape == (2, 3)
    assert coarse.weights.shape == (2, 8)
    assert fine.rgb.shape == (2, 3)
    assert fine.weights.shape == (2, 24)  # coarse+fine merged
    assert np.isfinite(np.asarray(fine.rgb)).all()


def test_render_rays_grid_input():
    cam = CameraConfig(width=8, height=8)
    mcfg = ModelConfig(net_width=16, net_depth=2, skip_layer=99, feature_width=16, view_head_width=8)
    rcfg = RenderConfig(num_samples=4)
    params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
    o, d = rays.ray_grid(None, cam)
    coarse, fine = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), mcfg, rcfg, cam, randomized=False
    )
    assert coarse.rgb.shape == (8, 8, 3)
    assert fine is None


def test_psnr():
    m = jnp.float32(0.01)
    assert abs(float(render.psnr_from_mse(m)) - 20.0) < 1e-4


def test_sigma_noise_is_pre_activation():
    """Paper appendix: noise perturbs RAW sigma BEFORE relu. With the
    sigma bias pinned at -3 and noise_std=0.2, relu(raw + noise) is zero
    everywhere (P(noise > 3) ~ 1e-50); the old post-activation bug
    (relu(relu(raw)) + noise re-relu'd) would leave ~half the samples
    positive."""
    cfg = ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                      feature_width=16, view_head_width=8,
                      pos_enc_levels=2, dir_enc_levels=1)
    rcfg = RenderConfig(num_samples=16, raw_noise_std=0.2)
    cam = CameraConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    # pin raw sigma to -3: zero weights, negative bias
    params["sigma"]["w"] = jnp.zeros_like(params["sigma"]["w"])
    params["sigma"]["b"] = jnp.full_like(params["sigma"]["b"], -3.0)
    o = jnp.zeros((32, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((32, 3)).at[:, 2].set(1.0)
    out, _ = render.render_rays(params, o, d, jax.random.PRNGKey(1),
                                cfg, rcfg, cam, randomized=True)
    assert float(jnp.max(out.sigma)) == 0.0


def test_sigma_noise_coarse_fine_keys_differ():
    """Coarse and fine passes must draw INDEPENDENT noise. Evaluate the
    same params/ts through both passes (fine_params=params, fine ts
    include the coarse ts) and check the coarse-sample sigmas differ
    between the two passes — identical keys (round-1 bug) made them
    equal on shared sample points."""
    cfg = ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                      feature_width=16, view_head_width=8,
                      pos_enc_levels=2, dir_enc_levels=1)
    rcfg = RenderConfig(num_samples=8, num_fine_samples=8,
                        raw_noise_std=5.0)
    cam = CameraConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    # zero sigma head => raw sigma == 0, so sigma == relu(noise) exactly
    params["sigma"]["w"] = jnp.zeros_like(params["sigma"]["w"])
    params["sigma"]["b"] = jnp.zeros_like(params["sigma"]["b"])
    o = jnp.zeros((4, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    coarse, fine = render.render_rays(
        params, o, d, jax.random.PRNGKey(3), cfg, rcfg, cam,
        fine_params=params, randomized=True,
    )
    assert fine is not None
    # both passes saw noise (not all-zero after relu)
    assert float(jnp.max(coarse.sigma)) > 0.0
    assert float(jnp.max(fine.sigma)) > 0.0
    # noise fields are independent draws: the sigma populations differ
    assert not np.allclose(
        np.sort(np.asarray(coarse.sigma), axis=-1),
        np.sort(np.asarray(fine.sigma), axis=-1)[:, -8:],
    )


def test_train_step_with_sigma_noise():
    """raw_noise_std > 0 end-to-end training coverage (untested in
    round 1): hierarchical step runs, loss finite, grads applied."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.train.step import Batch, init_state, train_step

    cfg = Config(
        camera=CameraConfig(width=16, height=16),
        model=ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                          feature_width=16, view_head_width=8,
                          pos_enc_levels=2, dir_enc_levels=1),
        render=RenderConfig(num_samples=8, num_fine_samples=8,
                            raw_noise_std=1.0),
        train=TrainConfig(num_rays=16, precision="f32"),
    )
    state = init_state(jax.random.PRNGKey(0), cfg)
    o = jnp.zeros((16, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((16, 3)).at[:, 2].set(1.0)
    batch = Batch(origins=o, dirs=d, gold=jnp.full((16, 3), 0.5))
    p0 = np.asarray(state.params["sigma"]["w"])  # copy: step donates state
    state, aux = train_step(state, batch, jax.random.PRNGKey(1), cfg)
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 1
    assert not np.allclose(np.asarray(state.params["sigma"]["w"]),
                           np.asarray(p0))


def test_share_network_fast_path_matches_union_eval():
    """share_network=True evaluates only the NEW fine samples and
    composites the union from cached coarse evals; with one network and
    deterministic sampling this must equal the baseline that re-runs
    the full union through the MLP."""
    cfg = ModelConfig(net_depth=2, net_width=32, skip_layer=1,
                      feature_width=32, view_head_width=16,
                      pos_enc_levels=4, dir_enc_levels=2)
    cam = CameraConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(2)
    o = jax.random.normal(key, (64, 3)) * 0.1
    o = o.at[:, 2].add(-1.0)
    d = jnp.zeros((64, 3)).at[:, 2].set(1.0)
    base = RenderConfig(num_samples=16, num_fine_samples=16)
    fast = RenderConfig(num_samples=16, num_fine_samples=16,
                        share_network=True)
    c0, f0 = render.render_rays(params, o, d, key, cfg, base, cam,
                                randomized=False)
    c1, f1 = render.render_rays(params, o, d, key, cfg, fast, cam,
                                randomized=False)
    np.testing.assert_allclose(np.asarray(c1.rgb), np.asarray(c0.rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1.rgb), np.asarray(f0.rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1.depth), np.asarray(f0.depth),
                               atol=1e-4)


def test_share_network_trains():
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.train.step import Batch, init_state, train_step

    cfg = Config(
        camera=CameraConfig(width=16, height=16),
        model=ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                          feature_width=16, view_head_width=8,
                          pos_enc_levels=2, dir_enc_levels=1),
        render=RenderConfig(num_samples=8, num_fine_samples=8,
                            share_network=True),
        train=TrainConfig(num_rays=32, precision="f32", learning_rate=1e-2),
    )
    state = init_state(jax.random.PRNGKey(0), cfg)
    assert state.fine_params is None  # one network
    o = jnp.zeros((32, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((32, 3)).at[:, 2].set(1.0)
    batch = Batch(origins=o, dirs=d, gold=jnp.full((32, 3), 0.25))
    losses = []
    for i in range(30):
        state, aux = train_step(state, batch, jax.random.PRNGKey(i), cfg)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert "loss_fine" in aux


@pytest.mark.slow
def test_fine_mode_standalone_shapes_and_finite():
    cfg = ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                      feature_width=16, view_head_width=8,
                      pos_enc_levels=2, dir_enc_levels=1)
    rcfg = RenderConfig(num_samples=8, num_fine_samples=16,
                        share_network=True, fine_mode="standalone")
    cam = CameraConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    o = jnp.zeros((8, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((8, 3)).at[:, 2].set(1.0)
    coarse, fine = render.render_rays(params, o, d, jax.random.PRNGKey(1),
                                      cfg, rcfg, cam)
    assert fine.weights.shape == (8, 16)  # fine samples ONLY, no union
    assert np.isfinite(np.asarray(fine.rgb)).all()
    # standalone fine ts are sorted per ray (compositing requires order)
    # weights positive only where sigma>0; depth finite
    assert np.isfinite(float(fine.depth.sum()))


@pytest.mark.slow
def test_fine_mode_standalone_converges_like_union():
    """Proposal-style fine pass must reach comparable quality: fit the
    white-disk scene both ways, compare eval PSNR."""
    from nerf_rs_tpu.config import Config, TrainConfig
    from nerf_rs_tpu.data import synthetic
    from nerf_rs_tpu.train.step import Batch, init_state, train_step

    def fit(fine_mode):
        cfg = Config(
            camera=CameraConfig(width=32, height=32),
            model=ModelConfig(net_depth=3, net_width=48, skip_layer=2,
                              feature_width=48, view_head_width=24,
                              pos_enc_levels=5, dir_enc_levels=2),
            render=RenderConfig(num_samples=12, num_fine_samples=12,
                                share_network=True, fine_mode=fine_mode),
            train=TrainConfig(num_rays=256, precision="f32",
                              learning_rate=3e-3),
        )
        img = synthetic.sphere_image(cfg.camera)
        state = init_state(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(1)
        for i in range(150):
            k = jax.random.fold_in(key, i)
            kc, kv = jax.random.split(k)
            coords = jax.random.randint(kc, (256, 2), 0, 32)
            pose = rays.pose_from_yaw_pitch(jnp.float32(0.0), jnp.float32(0.0))
            o, d = rays.rays_for_coords(coords.astype(jnp.float32), pose,
                                        cfg.camera)
            gold = img[coords[:, 1], coords[:, 0], :3]
            state, aux = train_step(state, Batch(o, d, gold),
                                    jax.random.fold_in(k, 7), cfg)
        return float(aux["psnr"])

    p_union = fit("union")
    p_alone = fit("standalone")
    assert p_alone > 14.0, (p_alone, p_union)
    assert p_alone > p_union - 4.0, (p_alone, p_union)
