"""Multiview PNG dataset loading (host side, startup only).

Equivalent of the reference's image_loading.rs: PNG -> float32 RGBA
normalized /255 (load_image_as_array, src/image_loading.rs:6-24), path
generation ``{dir}/image-{i}.png`` over ``start..end step`` with the
same divisibility asserts (get_image_paths, src/image_loading.rs:37-54),
and the hemisphere view-angle grid lives in ops/rays.view_angle_grid
(src/image_loading.rs:67-80).

Images are loaded once at startup into one (N, H, W, 4) uint8 host
array that is then device_put as the resident pixel store
(data/device_dataset.py) — per-step batches never touch these files.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def get_image_paths(dir: str, start: int, end: int, step: int = 1) -> List[str]:
    """``{dir}/image-{i}.png`` for i in start..end by step, with the
    reference's asserts (src/image_loading.rs:37-44)."""
    assert start < end, "view_start must be < view_end"
    assert (end - start) % step == 0, "(end - start) must be divisible by step"
    assert (end - start) // step > 0
    return [os.path.join(dir, f"image-{i}.png") for i in range(start, end, step)]


def load_image(path: str) -> np.ndarray:
    """One PNG -> (H, W, 4) uint8 RGBA (the /255 normalization happens
    on-device at gather time, keeping the pixel store 4x smaller than
    the reference's f32 Vec<[f32;4]>)."""
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable; cannot load PNG datasets")
    img = Image.open(path).convert("RGBA")
    return np.asarray(img, dtype=np.uint8)


def box_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Area-averaged (box-filter) decimation by an integer factor —
    each output pixel is the mean of its factor x factor source block
    (trailing rows/cols beyond a whole block are cropped). Strided
    subsampling (img[::f, ::f]) aliases high-frequency capture content;
    the pixel-footprint argument is mip-NeRF's own (arXiv 2103.13415
    §1) and this matches eval's box-downsampled gold pyramid
    (data/device_dataset.build_pyramid)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    a = img[: h2 * factor, : w2 * factor].astype(np.float32)
    a = a.reshape(h2, factor, w2, factor, -1).mean(axis=(1, 3))
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.rint(a), 0, 255).astype(img.dtype)
    return a.astype(img.dtype)


def load_images(paths: List[str]) -> np.ndarray:
    """All views as one (N, H, W, 4) uint8 stack
    (load_multiple_images_as_arrays, src/image_loading.rs:56-65)."""
    imgs = [load_image(p) for p in paths]
    shapes = {im.shape for im in imgs}
    assert len(shapes) == 1, f"inconsistent view shapes: {shapes}"
    return np.stack(imgs, axis=0)


def load_multiview_dir(
    dir: str, start: int, end: int, step: int = 1
) -> Tuple[np.ndarray, int, int]:
    """Load the reference's dataset layout; returns (images, H, W)."""
    imgs = load_images(get_image_paths(dir, start, end, step))
    return imgs, imgs.shape[1], imgs.shape[2]


def save_png(path: str, rgb: np.ndarray) -> None:
    """Write a float [0,1] (H, W, 3|4) array as PNG — the headless
    replacement for the reference's live minifb window (SURVEY §2.17)."""
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable")
    arr = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)
