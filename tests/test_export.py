"""Field export (utils/export.py + `export` subcommand): grid sampler
properties against the analytic model, .ply/.npz round-trips, CLI e2e.
"""

import os

import jax
import numpy as np

from nerf_rs_tpu.cli import main
from nerf_rs_tpu.config import ModelConfig
from nerf_rs_tpu.models.mlp import init_nerf_params
from nerf_rs_tpu.utils import export as ex

CFG = ModelConfig(net_depth=2, net_width=32, feature_width=32,
                  view_head_width=16)


def test_grid_matches_direct_apply():
    """Slab-chunked grid sampling equals a direct apply_nerf call at
    the same points (the chunking must not change values)."""
    from nerf_rs_tpu.models.mlp import apply_nerf

    params = init_nerf_params(jax.random.PRNGKey(0), CFG)
    res, aabb = 8, 1.0
    sigma, rgb = ex.sample_density_grid(
        params, CFG, res=res, aabb=aabb, dtype=None, slab=3
    )
    assert sigma.shape == (res, res, res)
    assert rgb.shape == (res, res, res, 3)
    cell = 2.0 * aabb / res
    c1d = np.linspace(-aabb + cell / 2, aabb - cell / 2, res,
                      dtype=np.float32)
    gx, gy, gz = np.meshgrid(c1d, c1d, c1d, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(res * res, res, 3)
    vd = np.zeros_like(pts)
    vd[..., 2] = 1.0
    s2, c2 = apply_nerf(params, pts, vd, CFG, None)
    np.testing.assert_allclose(
        sigma, np.asarray(s2).reshape(res, res, res), atol=1e-5
    )
    np.testing.assert_allclose(
        rgb, np.asarray(c2).reshape(res, res, res, 3), atol=1e-5
    )


def test_occupied_points_threshold():
    res, aabb = 4, 1.0
    sigma = np.zeros((res, res, res), np.float32)
    sigma[1, 2, 3] = 10.0
    sigma[0, 0, 0] = 0.5
    rgb = np.full((res, res, res, 3), 0.25, np.float32)
    xyz, rgb8 = ex.occupied_points(sigma, rgb, aabb, threshold=5.0)
    assert xyz.shape == (1, 3)
    cell = 2 * aabb / res
    want = np.array([-aabb + cell / 2 + cell * i for i in (1, 2, 3)],
                    np.float32)
    np.testing.assert_allclose(xyz[0], want, atol=1e-6)
    assert (rgb8 == int(0.25 * 255)).all()


def test_ply_and_npz_roundtrip(tmp_path):
    xyz = np.array([[0.0, 1.0, -1.0], [0.5, 0.5, 0.5]], np.float32)
    rgb8 = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    ply = str(tmp_path / "pc.ply")
    ex.save_ply(ply, xyz, rgb8)
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 2" in lines
    assert len(lines) == lines.index("end_header") + 3

    npz = str(tmp_path / "f.npz")
    sigma = np.zeros((2, 2, 2), np.float32)
    rgb = np.zeros((2, 2, 2, 3), np.float32)
    ex.save_npz(npz, sigma, rgb, 1.5)
    loaded = np.load(npz)
    assert loaded["sigma"].shape == (2, 2, 2)
    assert float(loaded["aabb"]) == 1.5


def test_export_subcommand_end_to_end(tmp_path):
    save_dir = str(tmp_path / "ckpt")
    common = [
        "--dataset", "sphere",
        "--width", "24", "--height", "24",
        "--num_rays", "128", "--num_samples", "8",
        "--num_views_per_hemisphere", "2",
        "--log_dir", str(tmp_path / "logs"), "--save_dir", save_dir,
        "--precision", "f32",
    ]
    rc = main(["train", *common, "--num_iter", "12", "--save_steps", "10",
               "--eval_steps", "100", "--logging_steps", "100",
               "--learning_rate", "5e-3"])
    assert rc == 0
    out = str(tmp_path / "exp" / "field")
    rc = main(["export", *common, "--grid_res", "12",
               "--export_aabb", "1.0", "--threshold", "0.5",
               "--out", out])
    assert rc == 0
    assert os.path.exists(out + ".npz")
    assert os.path.exists(out + ".ply")
    grid = np.load(out + ".npz")
    assert grid["sigma"].shape == (12, 12, 12)
    # no checkpoint -> clean error
    rc = main(["export", *common, "--save_dir", str(tmp_path / "nope")])
    assert rc == 1
