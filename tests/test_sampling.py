"""Sampling property tests — ports of the reference's randomized
property tests (points on ray, monotone t; src/ray_sampling.rs:382-441)
plus stratified/compat/hierarchical semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import CameraConfig
from nerf_rs_tpu.ops import rays, sampling

CAM = CameraConfig()


def test_stratified_in_bins_and_sorted():
    key = jax.random.PRNGKey(0)
    ts = sampling.stratified_ts(key, 256, 64, CAM.near, CAM.far)
    assert ts.shape == (256, 64)
    t = np.asarray(ts)
    assert (np.diff(t, axis=-1) >= 0).all()  # sorted by construction
    assert t.min() >= CAM.near and t.max() <= CAM.far
    # each sample lies in its own bin (true stratification, paper eq. 2)
    bins = np.linspace(CAM.near, CAM.far, 65)
    assert (t >= bins[:-1]).all() and (t <= bins[1:]).all()


def test_compat_ts_matches_reference_quirk():
    # effective range [0, far), no near offset (src/ray_sampling.rs:114)
    key = jax.random.PRNGKey(1)
    ts = sampling.compat_ts(key, 512, 64, CAM.far)
    t = np.asarray(ts)
    assert (np.diff(t, axis=-1) >= 0).all()
    assert t.min() < CAM.near  # near plane NOT enforced, by design
    assert t.max() < CAM.far
    # deterministic mode: i/n * far
    td = np.asarray(sampling.compat_ts(key, 2, 4, 2.0, randomized=False))
    np.testing.assert_allclose(td[0], [0.0, 0.5, 1.0, 1.5])


def test_points_lie_on_ray_and_monotone():
    # ports points_sampled_lie_on_ray + points_sampled_ordered_by_t
    # (src/ray_sampling.rs:382-441)
    key = jax.random.PRNGKey(2)
    coords = jax.random.uniform(key, (16, 2)) * 127.0
    pose = rays.pose_from_yaw_pitch(jnp.float32(0.9), jnp.float32(-0.3))
    o, d = rays.rays_for_coords(coords, pose, CAM)
    ts = sampling.stratified_ts(key, 16, 32, CAM.near, CAM.far)
    pts = sampling.points_from_ts(o, d, ts)
    rel = np.asarray(pts) - np.asarray(o)[:, None, :]
    norms = np.linalg.norm(rel, axis=-1)
    unit = rel / norms[..., None]
    np.testing.assert_allclose(unit, np.broadcast_to(np.asarray(d)[:, None, :], unit.shape), atol=1e-5)
    assert (np.diff(norms, axis=-1) > 0).all()  # monotone in t => in distance


def test_deltas():
    ts = jnp.array([[0.1, 0.5, 1.0]])
    d = sampling.deltas_from_ts(ts, far=2.0)
    np.testing.assert_allclose(np.asarray(d[0]), [0.4, 0.5, 1.0], atol=1e-6)


def test_sample_pdf_concentrates_mass():
    key = jax.random.PRNGKey(3)
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    # all weight in bin [0.5, 0.625)
    weights = jnp.zeros((4, 8)).at[:, 4].set(1.0)
    s = sampling.sample_pdf(key, bins, weights, 128)
    s = np.asarray(s)
    assert s.shape == (4, 128)
    frac_in = ((s >= 0.5) & (s <= 0.625)).mean()
    assert frac_in > 0.95


def test_sample_pdf_uniform_weights_cover_range():
    key = jax.random.PRNGKey(4)
    bins = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 17), (2, 17))
    weights = jnp.ones((2, 16))
    s = np.asarray(sampling.sample_pdf(key, bins, weights, 256))
    assert s.min() >= 0.0 and s.max() <= 2.0
    assert abs(s.mean() - 1.0) < 0.1


def test_merge_ts_sorted():
    # both inputs sorted per ray (the production precondition: stratified
    # coarse ts and stratified-CDF sample_pdf output are each sorted)
    a = jnp.array([[0.1, 0.7]])
    b = jnp.array([[0.2, 0.4]])
    m = np.asarray(sampling.merge_ts(a, b))
    np.testing.assert_allclose(m[0], [0.1, 0.2, 0.4, 0.7])


def test_merge_ts_matches_sort():
    """The gather-free 2-way merge must equal sort-of-concat exactly,
    including duplicated values within and across the two arrays."""
    key = jax.random.PRNGKey(11)
    ka, kb = jax.random.split(key)
    # quantized values force ties across AND within rows
    a = jnp.sort(jnp.round(jax.random.uniform(ka, (64, 17)) * 8) / 8, axis=-1)
    b = jnp.sort(jnp.round(jax.random.uniform(kb, (64, 31)) * 8) / 8, axis=-1)
    merged = np.asarray(sampling.merge_ts(a, b))
    gold = np.sort(np.concatenate([np.asarray(a), np.asarray(b)], -1), -1)
    np.testing.assert_array_equal(merged, gold)
    # still exact under jit + bf16-adjacent shapes used in production
    m2 = np.asarray(jax.jit(sampling.merge_ts)(a, b))
    np.testing.assert_array_equal(m2, gold)
