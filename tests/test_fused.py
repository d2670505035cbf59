"""Fused Pallas kernel tests (interpret mode on CPU; the same kernel is
compiled by Mosaic on TPU — parity there was verified on hardware, see
kernels/fused_render.py docstring)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig, ModelConfig, RenderConfig
from nerf_rs_tpu.kernels.fused_render import enc_dims, pack_weights
from nerf_rs_tpu.models.encoding import posenc
from nerf_rs_tpu.models.mlp import apply_nerf, init_nerf_params
from nerf_rs_tpu.ops import rays, render

CFG = ModelConfig(
    net_depth=4, net_width=128, skip_layer=2, feature_width=128,
    view_head_width=64, pos_enc_levels=6, dir_enc_levels=4,
)


def _inputs(n):
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.7
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    return pts, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_enc_dims():
    pos, pos_pad, dird, dir_pad = enc_dims(ModelConfig())
    assert (pos, pos_pad, dird, dir_pad) == (63, 64, 27, 32)


def test_pe_layout_matches_posenc():
    """The kernel's iota-derived PE must match models.encoding.posenc
    column-for-column (pack_weights maps weight rows 1:1)."""
    from nerf_rs_tpu.kernels.fused_render import _pe_encode

    p = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    pos, pos_pad, _, _ = enc_dims(CFG)
    got = np.asarray(_pe_encode(p, pos_pad))[:, :pos]
    want = np.asarray(posenc(p, CFG.pos_enc_levels))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_render_rays_fused_path():
    cam = CameraConfig(width=16, height=16)
    rcfg = RenderConfig(num_samples=8)
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    o, d = rays.ray_grid(None, cam)
    coarse_f, _ = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), CFG, rcfg, cam,
        randomized=False, use_fused=True,
    )
    coarse_r, _ = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), CFG, rcfg, cam,
        randomized=False, dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(coarse_f.rgb), np.asarray(coarse_r.rgb), atol=2e-2
    )


def test_fused_unsupported_falls_back():
    compat = ModelConfig(compat=True, sigma_activation="none", use_viewdirs=False)
    assert not render.fused_supported(compat)
    assert render.fused_supported(ModelConfig())
