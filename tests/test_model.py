"""MLP architecture tests: shapes, param counts, skip connection,
compat architecture parity with the reference's layer dims."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import ModelConfig
from nerf_rs_tpu.models import encoding
from nerf_rs_tpu.models.mlp import apply_nerf, count_params, init_nerf_params


def test_posenc_dims_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = encoding.posenc(x, levels=10)
    assert enc.shape == (1, 63)  # 3 + 3*2*10
    np.testing.assert_allclose(np.asarray(enc[0, :3]), [0.5, -0.25, 1.0])
    # level 0: sin(x), cos(x)
    np.testing.assert_allclose(np.asarray(enc[0, 3:6]), np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc[0, 6:9]), np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    # level 3: sin(8x)
    np.testing.assert_allclose(np.asarray(enc[0, 3 + 3 * 6 : 6 + 3 * 6]), np.sin([4.0, -2.0, 8.0]), atol=1e-5)
    assert encoding.posenc_dim(3, 10) == 63
    assert encoding.posenc_dim(3, 4) == 27
    assert encoding.posenc_dim(3, 0) == 3


def test_paper_model_shapes_and_count():
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.zeros((4, 64, 3))
    dirs = jnp.zeros((4, 1, 3)).at[..., 2].set(1.0)
    sigma, rgb = apply_nerf(params, pts, dirs, cfg)
    assert sigma.shape == (4, 64)
    assert rgb.shape == (4, 64, 3)
    assert float(jnp.min(sigma)) >= 0.0  # relu sigma
    assert 0.0 <= float(jnp.min(rgb)) and float(jnp.max(rgb)) <= 1.0
    n = count_params(params)
    # 8x256 trunk + skip + heads: ~595k params
    assert 550_000 < n < 650_000
    # skip layer consumes width+63 inputs
    assert params["trunk"][4]["w"].shape == (256 + 63, 256)


def test_compat_model_matches_reference_dims():
    # DensityNet 3->100x7->101, RadianceNet 100->50->4
    # (src/model.rs:45-67,86-93); ~81k params
    cfg = ModelConfig(compat=True, sigma_activation="none", use_viewdirs=False)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    assert params["trunk"][0]["w"].shape == (3, 100)
    assert params["trunk"][7]["w"].shape == (100, 101)
    assert params["head1"]["w"].shape == (100, 50)
    assert params["head2"]["w"].shape == (50, 4)
    n = count_params(params)
    assert n == 76_455  # exact: 71,201 trunk + 5,254 head
    sigma, rgba = apply_nerf(params, jnp.ones((84, 64, 3)), None, cfg)
    assert sigma.shape == (84, 64)
    assert rgba.shape == (84, 64, 4)
    # raw sigma: can be negative (no activation), rgba sigmoid-bounded
    assert 0.0 <= float(rgba.min()) and float(rgba.max()) <= 1.0


def test_viewdir_affects_rgb_not_sigma():
    cfg = ModelConfig(net_width=32, net_depth=3, skip_layer=2, feature_width=32, view_head_width=16)
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 3))
    d1 = jnp.zeros((8, 1, 3)).at[..., 2].set(1.0)
    d2 = jnp.zeros((8, 1, 3)).at[..., 0].set(1.0)
    s1, c1 = apply_nerf(params, pts, d1, cfg)
    s2, c2 = apply_nerf(params, pts, d2, cfg)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    assert float(jnp.max(jnp.abs(c1 - c2))) > 1e-4


@pytest.mark.slow
def test_mixed_precision_close_to_f32():
    cfg = ModelConfig(net_width=64, net_depth=4, skip_layer=2, feature_width=64, view_head_width=32)
    params = init_nerf_params(jax.random.PRNGKey(3), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(4), (16, 8, 3)) * 0.5
    dirs = jnp.zeros((16, 1, 3)).at[..., 2].set(1.0)
    s32, c32 = apply_nerf(params, pts, dirs, cfg, dtype=None)
    sbf, cbf = apply_nerf(params, pts, dirs, cfg, dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(c32 - cbf))) < 0.05


def test_screen_encodings_shapes():
    e = jnp.array([[3, 5], [100, 20]])
    assert encoding.screen_coconet(e, 128, 128).shape == (2, 6)
    f = encoding.screen_fourier(e, 128, 128, out_dim=16)
    assert f.shape == (2, 16)
    # only first half filled (reference quirk, src/input_transforms.rs:48-59)
    assert np.abs(np.asarray(f[:, 8:])).max() == 0.0
