"""Ray-intersection + view-consistency probe tests, porting the
reference's hand-built intersection cases (test_intersection,
src/ray_sampling.rs:222-269 — which asserted nothing; these do)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import ModelConfig
from nerf_rs_tpu.models.mlp import init_nerf_params
from nerf_rs_tpu.ops import intersect, rays


def test_crossing_rays_intersect():
    o_a = jnp.array([0.0, 0.0, -1.0])
    d_a = jnp.array([0.0, 0.0, 1.0])
    o_b = jnp.array([-1.0, 0.0, 0.5])
    d_b = jnp.array([1.0, 0.0, 0.0])
    out = intersect.ray_intersection(o_a, d_a, o_b, d_b, t_max=4.0)
    assert bool(out.valid)
    np.testing.assert_allclose(np.asarray(out.point_a), [0.0, 0.0, 0.5], atol=1e-5)
    assert abs(float(out.s) - 1.5) < 1e-5
    assert abs(float(out.t) - 1.0) < 1e-5


def test_skew_rays_do_not_intersect():
    # skew: closest approach 0.5 apart
    out = intersect.ray_intersection(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 0.5, 1.0]), jnp.array([0.0, 0.0, -1.0]),
        t_max=4.0,
    )
    assert not bool(out.valid)


def test_parallel_rays_invalid():
    out = intersect.ray_intersection(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]),
        t_max=4.0,
    )
    assert not bool(out.valid)


def test_behind_origin_invalid():
    # intersection exists geometrically but at negative parameter
    out = intersect.ray_intersection(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, 0.0, -2.0]), jnp.array([1.0, 0.0, 0.0]),
        t_max=4.0,
    )
    assert not bool(out.valid)


def test_pairwise_shapes_and_counts():
    # two camera views whose central rays all pass near the origin region
    pose_a = rays.pose_from_yaw_pitch(jnp.float32(0.0), jnp.float32(0.0))
    pose_b = rays.pose_from_yaw_pitch(jnp.float32(math.pi / 2), jnp.float32(0.0))
    from nerf_rs_tpu.config import CameraConfig

    cam = CameraConfig()
    coords = jnp.array([[64.0, 64.0], [60.0, 64.0], [70.0, 64.0]])
    o_a, d_a = rays.rays_for_coords(coords, pose_a, cam)
    o_b, d_b = rays.rays_for_coords(coords, pose_b, cam)
    out = intersect.pairwise_view_intersections(o_a, d_a, o_b, d_b, t_max=4.0, tol=5e-2)
    assert out.valid.shape == (3, 3)
    # central rays of orthogonal views meet near the origin
    assert bool(out.valid[0, 0])
    img = intersect.trace_intersections_to_screen(out, 128, 128)
    assert img.shape == (100, 100)
    assert float(img.max()) == 1.0


def test_density_consistency_zero_for_identity_poses():
    cfg = ModelConfig(net_depth=2, net_width=16, skip_layer=9, feature_width=16,
                      view_head_width=8, pos_enc_levels=2, dir_enc_levels=1)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    eye = jnp.eye(3)
    err = intersect.density_consistency(params, cfg, pts, eye, eye)
    assert float(err) == 0.0
    # different poses query different world points -> nonzero in general
    rot = rays.rotation_yaw(jnp.float32(0.8))
    err2 = intersect.density_consistency(params, cfg, pts, eye, rot)
    assert float(err2) > 0.0
