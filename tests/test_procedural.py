"""Procedural lego-class benchmark scene (data/procedural.py): analytic
field sanity, gold rendering, and the full Blender-format directory
round-tripping through the standard loader."""

import math

import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.data import procedural


def test_field_density_localized():
    # inside the slab: dense; far outside the scene: empty
    inside = jnp.asarray([[0.0, 0.0, -0.15]])
    outside = jnp.asarray([[3.0, 3.0, 3.0]])
    s_in, rgb_in = procedural.field(inside)
    s_out, _ = procedural.field(outside)
    assert float(s_in[0]) > 30.0
    assert float(s_out[0]) < 1e-3
    assert 0.0 <= float(rgb_in.min()) and float(rgb_in.max()) <= 1.0


def test_render_gold_frame():
    size = 32
    focal = 0.5 * size / math.tan(0.5 * procedural.CAMERA_ANGLE_X)
    pose = procedural.hemisphere_poses(1, 7)[0]
    img = procedural.render_gold(pose, size, size, focal,
                                 num_samples=64, chunk=512)
    assert img.shape == (size, size, 4)
    assert np.isfinite(img).all()
    # the object covers a substantial center region; corners are empty
    assert img[..., 3].mean() > 0.2
    assert img[0, 0, 3] < 0.05


def test_scene_roundtrips_through_blender_loader(tmp_path):
    from nerf_rs_tpu.data.blender import load_blender

    out = str(tmp_path / "scene")
    procedural.make_blender_scene(out, size=24, n_train=2, n_val=1,
                                  n_test=1, num_samples=32, verbose=False)
    scene = load_blender(out, split="train")
    assert scene.images.shape == (2, 24, 24, 4)
    assert scene.c2w.shape == (2, 4, 4)
    test = load_blender(out, split="test")
    assert test.images.shape[0] == 1
    # held-out poses differ from training poses
    assert not np.allclose(test.c2w[0], scene.c2w[0])
    # cameras sit on the lego-radius sphere
    np.testing.assert_allclose(
        np.linalg.norm(scene.c2w[:, :3, 3], axis=-1),
        procedural.CAMERA_RADIUS, rtol=1e-5,
    )


def test_helix_field_and_gold_frame():
    """Second record scene (round-2 verdict next #7): distinct geometry
    + texture family, same density law and camera layout."""
    inside = jnp.asarray([[0.0, 0.0, -0.18]])   # base plate body
    hole = jnp.asarray([[0.0, 0.0, 1.10]])      # octahedron center
    outside = jnp.asarray([[3.0, 3.0, 3.0]])
    s_in, rgb_in = procedural.field_helix(inside)
    s_oct, _ = procedural.field_helix(hole)
    s_out, _ = procedural.field_helix(outside)
    assert float(s_in[0]) > 30.0 and float(s_oct[0]) > 30.0
    assert float(s_out[0]) < 1e-3
    assert 0.0 <= float(rgb_in.min()) and float(rgb_in.max()) <= 1.0

    size = 32
    focal = 0.5 * size / math.tan(0.5 * procedural.CAMERA_ANGLE_X)
    pose = procedural.hemisphere_poses(1, 7)[0]
    img = procedural.render_gold(pose, size, size, focal, num_samples=64,
                                 chunk=512, field_fn=procedural.field_helix)
    assert img.shape == (size, size, 4)
    assert np.isfinite(img).all()
    assert img[..., 3].mean() > 0.15
    assert img[0, 0, 3] < 0.05
    # and it is a genuinely different image than the lego field's
    img_lego = procedural.render_gold(pose, size, size, focal,
                                      num_samples=64, chunk=512)
    assert np.abs(img - img_lego).mean() > 0.05


def test_deep_field_three_decades():
    """field_deep (the deep360 contraction testbed, VERDICT r4 task 3):
    content at t ~ 3 (central object), ~100 (landmarks), ~350 (ring),
    and an enclosing sky shell at 1300-2500 — and EVERY ray terminates
    on the shell, so gold frames have acc ~ 1 with no background
    convention."""
    # central object (field_360's slab) is still there
    s_in, _ = procedural.field_deep(jnp.asarray([[0.0, 0.0, -0.15]]))
    assert float(s_in[0]) > 30.0
    # landmark sphere at (110, 40, 30) r=24
    s_lm, _ = procedural.field_deep(jnp.asarray([[110.0, 40.0, 30.0]]))
    assert float(s_lm[0]) > 30.0
    # ring torus at radius 350
    s_ring, _ = procedural.field_deep(jnp.asarray([[350.0, 0.0, 40.0]]))
    assert float(s_ring[0]) > 30.0
    # inside the sky shell: dense; in the voids between layers: empty
    s_sky, rgb_sky = procedural.field_deep(jnp.asarray([[1900.0, 0.0, 0.0]]))
    s_void, _ = procedural.field_deep(jnp.asarray([[700.0, 0.0, 0.0]]))
    assert float(s_sky[0]) > 30.0
    assert float(s_void[0]) < 1.0
    assert 0.0 <= float(rgb_sky.min()) and float(rgb_sky.max()) <= 1.0
    # the shell is angularly textured (an environment, not a constant)
    pts = jnp.stack([1900.0 * jnp.cos(jnp.linspace(0, 2, 16)),
                     1900.0 * jnp.sin(jnp.linspace(0, 2, 16)),
                     jnp.zeros(16)], axis=-1)
    _, rgb_tex = procedural.field_deep(pts)
    assert float(rgb_tex.std(axis=0).max()) > 0.05

    # gold frame: disparity integration over three decades; every ray
    # hits the shell -> acc ~ 1 everywhere
    size = 16
    focal = 0.5 * size / math.tan(0.5 * procedural.CAMERA_ANGLE_X)
    pose = procedural.hemisphere_poses(1, 7)[0]
    img = procedural.render_gold(pose, size, size, focal, near=1.0,
                                 far=2500.0, num_samples=1024, chunk=256,
                                 field_fn=procedural.field_deep,
                                 space="disparity")
    assert np.isfinite(img).all()
    assert img[..., 3].min() > 0.98
