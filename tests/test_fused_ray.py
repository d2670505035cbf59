"""Whole-ray fused kernel tests (interpret mode): full parity against
the jnp sample->MLP->composite pipeline, including weights/sigma
outputs, odd ray counts (padding), and white background."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig, ModelConfig, RenderConfig
from nerf_rs_tpu.kernels.fused_ray import fused_ray_render
from nerf_rs_tpu.kernels.fused_render import pack_weights
from nerf_rs_tpu.models.mlp import apply_nerf, init_nerf_params
from nerf_rs_tpu.ops import render, sampling

CFG = ModelConfig(net_depth=4, net_width=128, skip_layer=2, feature_width=128,
                  view_head_width=64, pos_enc_levels=6, dir_enc_levels=4)


def _rays(n, key=1):
    k = jax.random.PRNGKey(key)
    o = jax.random.normal(k, (n, 3)) * 0.2
    d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ts = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 2), (n, 32)) * 2, -1)
    return o, d, vd, ts


def test_whole_ray_kernel_full_parity():
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    packed = pack_weights(params, CFG)
    o, d, vd, ts = _rays(64)
    deltas = sampling.deltas_from_ts(ts, 2.0)
    rgb, acc, depth, w, sig = fused_ray_render(
        packed, o, d, vd, ts, deltas, CFG, 32, rays_per_block=16, interpret=True
    )
    pts = sampling.points_from_ts(o, d, ts)
    s_ref, c_ref = apply_nerf(params, pts, vd[:, None, :], CFG, dtype=jnp.bfloat16)
    out = render.composite(s_ref, c_ref, deltas, ts=ts)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(out.rgb), atol=3e-3)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(out.acc), atol=3e-3)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(out.depth), atol=5e-3)
    np.testing.assert_allclose(np.asarray(w), np.asarray(out.weights), atol=3e-3)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(out.sigma), atol=2e-2)


def test_render_rays_whole_ray_path():
    """render_rays(use_fused=True) now routes inference through the
    whole-ray kernel — including non-multiple-of-32 ray counts and
    white background."""
    cam = CameraConfig(width=16, height=16)
    rcfg = RenderConfig(num_samples=8, white_background=True)
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    from nerf_rs_tpu.ops import rays as rays_ops

    coords = jnp.stack([jnp.arange(7.0), jnp.arange(7.0)], -1)  # 7 rays (pad)
    o, d = rays_ops.rays_for_coords(coords, None, cam)
    fused, _ = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), CFG, rcfg, cam,
        randomized=False, use_fused=True,
    )
    ref, _ = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), CFG, rcfg, cam,
        randomized=False, dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(np.asarray(fused.rgb), np.asarray(ref.rgb), atol=5e-3)
    np.testing.assert_allclose(np.asarray(fused.weights), np.asarray(ref.weights), atol=3e-3)


def test_hierarchical_through_whole_ray_kernel():
    """Coarse weights from the kernel feed the fine-sampling PDF."""
    cam = CameraConfig(width=8, height=8)
    rcfg = RenderConfig(num_samples=8, num_fine_samples=8)
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    from nerf_rs_tpu.ops import rays as rays_ops

    o, d = rays_ops.ray_grid(None, cam)
    coarse, fine = render.render_rays(
        params, o, d, jax.random.PRNGKey(1), CFG, rcfg, cam,
        randomized=False, use_fused=True,
    )
    assert fine is not None
    assert fine.rgb.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(fine.rgb)).all()


def test_render_kernel_interpret_override():
    """RenderConfig.kernel_interpret=True must force interpret mode in
    the fused render path regardless of default_backend() (the
    multichip-dryrun condition: CPU mesh + a live TPU backend also
    registered). On the CPU test backend both settings take the same
    interpret path, so this asserts the override plumbs through and
    produces the same image as auto."""
    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    o, d, vd, ts = _rays(32)
    cam = CameraConfig(width=8, height=8, near=0.05, far=2.0)
    outs = []
    for ki in (None, True):
        rc = RenderConfig(num_samples=16, kernel_interpret=ki)
        out, _ = render.render_rays(params, o, d, jax.random.PRNGKey(3),
                                    CFG, rc, cam, randomized=False)
        outs.append(np.asarray(out.rgb))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
