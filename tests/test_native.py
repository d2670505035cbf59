"""Native C++ batch assembler tests: builds the shared library with the
in-repo toolchain and checks gather/assembly parity with the numpy
path. Skips cleanly if no compiler is available."""

import numpy as np
import pytest

from nerf_rs_tpu.config import CameraConfig
from nerf_rs_tpu.data import native_loader
from nerf_rs_tpu.data.pipeline import HostSampler, PrefetchPipeline

lib = native_loader.load()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


def _imgs(n=5, h=17, w=23):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (n, h, w, 4), dtype=np.uint8)


def test_gather_matches_numpy():
    imgs = _imgs()
    rng = np.random.RandomState(1)
    n = 1000
    view = rng.randint(0, 5, n).astype(np.int32)
    xi = rng.randint(0, 23, n).astype(np.int32)
    yi = rng.randint(0, 17, n).astype(np.int32)
    for wb in (False, True):
        got = native_loader.gather_gold(imgs, view, xi, yi, wb)
        px = imgs[view, yi, xi].astype(np.float32) / 255.0
        want = px[:, :3]
        if wb:
            a = px[:, 3:4]
            want = want * a + (1.0 - a)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_assemble_batch_deterministic_and_in_range():
    imgs = _imgs()
    v1, x1, y1, g1 = native_loader.assemble_batch(imgs, seed=7, step=3, n=512, white_background=False)
    v2, x2, y2, g2 = native_loader.assemble_batch(imgs, seed=7, step=3, n=512, white_background=False)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(g1, g2)
    v3, _, _, _ = native_loader.assemble_batch(imgs, seed=7, step=4, n=512, white_background=False)
    assert not np.array_equal(v1, v3)
    assert v1.min() >= 0 and v1.max() < 5
    assert x1.min() >= 0 and x1.max() < 23
    assert y1.min() >= 0 and y1.max() < 17
    # gold matches a manual gather of the same indices
    want = imgs[v1, y1, x1, :3].astype(np.float32) / 255.0
    np.testing.assert_allclose(g1, want, atol=1e-6)


def test_pipeline_with_native_gather():
    imgs = _imgs(4, 16, 16)
    cam = CameraConfig(width=16, height=16)
    angles = np.stack([np.linspace(0, 1, 4), np.zeros(4)], -1)
    with PrefetchPipeline(
        imgs, cam, angles=angles, num_rays=64, use_native=True, seed=0
    ) as pipe:
        assert pipe.sampler._gather is native_loader.gather_gold
        b = next(pipe)
        assert b.gold.shape == (64, 3)
        g = np.asarray(b.gold)
        assert g.min() >= 0.0 and g.max() <= 1.0
