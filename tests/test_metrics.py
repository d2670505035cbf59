"""SSIM (ops/metrics.py): properties + parity vs an independent
nested-loop numpy oracle. The reference computes no quality metric
(src/model.rs:296-299); SSIM is this framework's addition next to PSNR.
"""

import jax
import numpy as np
import pytest

from nerf_rs_tpu.ops.metrics import ssim


def _oracle_ssim(a, b, max_val=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Direct per-window double-loop SSIM, no shared code with the
    implementation under test."""
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    w2d = np.outer(g, g)
    w2d /= w2d.sum()
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    h, wdt, c = a.shape
    vals = []
    for ch in range(c):
        for i in range(h - size + 1):
            for j in range(wdt - size + 1):
                pa = a[i:i + size, j:j + size, ch]
                pb = b[i:i + size, j:j + size, ch]
                mua = (w2d * pa).sum()
                mub = (w2d * pb).sum()
                va = (w2d * pa * pa).sum() - mua * mua
                vb = (w2d * pb * pb).sum() - mub * mub
                cov = (w2d * pa * pb).sum() - mua * mub
                vals.append(
                    ((2 * mua * mub + c1) * (2 * cov + c2))
                    / ((mua * mua + mub * mub + c1) * (va + vb + c2))
                )
    return float(np.mean(vals))


def test_ssim_identical_is_one():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (48, 48, 3))
    k2, k3 = jax.random.split(key)
    small = img + 0.02 * jax.random.normal(k2, img.shape)
    big = img + 0.2 * jax.random.normal(k3, img.shape)
    s_small = float(ssim(img, small))
    s_big = float(ssim(img, big))
    assert 1.0 > s_small > s_big


def test_ssim_matches_independent_oracle():
    rng = np.random.RandomState(7)
    a = rng.rand(20, 20, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(20, 20, 3), 0, 1).astype(np.float32)
    got = float(ssim(a, b))
    want = _oracle_ssim(a, b)
    assert got == pytest.approx(want, abs=1e-4)


def test_ssim_symmetry_and_range():
    rng = np.random.RandomState(3)
    a = rng.rand(24, 24, 3).astype(np.float32)
    b = rng.rand(24, 24, 3).astype(np.float32)
    s_ab = float(ssim(a, b))
    s_ba = float(ssim(b, a))
    assert s_ab == pytest.approx(s_ba, abs=1e-6)
    assert -1.0 <= s_ab <= 1.0
