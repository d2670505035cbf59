"""Synthetic debug scenes — the reference's (commented-out) analytic
fixtures, promoted to first-class dataset oracles (SURVEY.md §2.6, §4).

  * analytic sphere density: gold sigma = 1 inside radius 0.5
    (get_sphere_density_batch, src/dataset.rs:35-61) — a perfect
    oracle for the sampler+MLP+loss loop with a known optimum.
  * flat-sphere images: procedural angle-keyed gold pixels — a disk of
    radius H/4 centered on screen, white-inside/black-outside
    (get_sphere_train_batch, src/dataset.rs:141-188) — renders without
    any image files on disk.

Both generate entirely on-device from explicit keys.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import CameraConfig


def sphere_density(points: jnp.ndarray, radius: float = 0.5) -> jnp.ndarray:
    """Analytic gold density: 1 inside ||p|| < radius, else 0
    (the reference's dist<0.5 => sigma=1 rule, src/dataset.rs:35-61)."""
    d = jnp.linalg.norm(points, axis=-1)
    return (d < radius).astype(jnp.float32)


def sphere_image(camera: CameraConfig, radius_frac: float = 0.25) -> jnp.ndarray:
    """Procedural flat-disk gold image (H, W, 4): white inside a disk of
    radius H*radius_frac centered on screen, black outside, alpha 1 —
    view-independent (the reference keys a small offset off the view
    angle; the constant-disk core is the useful oracle)."""
    y = jnp.arange(camera.height, dtype=jnp.float32)
    x = jnp.arange(camera.width, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    cy, cx = camera.height / 2.0, camera.width / 2.0
    r = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    inside = (r < camera.height * radius_frac).astype(jnp.float32)
    rgb = jnp.stack([inside, inside, inside], axis=-1)
    alpha = jnp.ones_like(inside)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def sphere_scene_images(
    camera: CameraConfig, num_views: int = 84
) -> jnp.ndarray:
    """A stack of identical flat-sphere gold frames, one per view —
    the no-files-on-disk multiview dataset (N, H, W, 4)."""
    img = sphere_image(camera)
    return jnp.broadcast_to(img, (num_views,) + img.shape)


def render_sphere_gold(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    ts: jnp.ndarray,
    radius: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gold (per-sample sigma, per-ray hit mask) for rays against the
    analytic sphere — used by convergence tests to compare the learned
    field against the oracle at identical world points."""
    pts = origins[..., None, :] + ts[..., :, None] * dirs[..., None, :]
    sigma = sphere_density(pts, radius)
    hit = (jnp.max(sigma, axis=-1) > 0).astype(jnp.float32)
    return sigma, hit
