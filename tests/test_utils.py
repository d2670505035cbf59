"""Utility tests: TB logger tag surface, terminal sparkline, throughput
accounting."""

import os

import numpy as np

from nerf_rs_tpu.utils.profiling import Throughput
from nerf_rs_tpu.utils.tb import TBLogger
from nerf_rs_tpu.utils.term import sparkline


def test_tb_logger_writes_reference_tags(tmp_path):
    tb = TBLogger(str(tmp_path), "run1")
    assert os.path.isdir(tb.dir)
    tb.hparams({"lr": 5e-4, "num_rays": 4096})
    tb.scalars({"loss": 0.5, "psnr": 12.0}, step=1)
    rng = np.random.RandomState(0)
    tb.screen_coords(rng.randint(0, 128, (100, 2)), step=1)
    tb.ray_ts(rng.uniform(0, 2, (100, 64)), step=1)
    tb.image("prediction", rng.uniform(0, 1, (16, 16, 3)), step=1)
    pts = rng.uniform(-1, 1, (500, 3))
    tb.point_maps(pts, step=1)
    tb.point_maps(pts, step=1, weights=rng.uniform(0, 1, 500), prefix="density")
    tb.histogram("density", rng.uniform(0, 3, 1000), step=1)
    tb.flush()
    tb.close()
    files = os.listdir(tb.dir)
    assert any("tfevents" in f for f in files)


def test_sparkline():
    s = sparkline([0, 1, 2, 3, 4, 5, 6, 7, 8])
    assert len(s) == 9
    assert s[0] == " " and s[-1] == "█"
    assert sparkline([]) == ""
    assert sparkline([float("nan")]) == ""
    assert len(sparkline(list(range(1000)), width=60)) == 60
    assert len(sparkline([1.0])) == 1  # constant series


def test_throughput():
    thr = Throughput(num_rays=4096, num_samples=64, num_chips=2)
    assert thr.stats() == {}
    thr.tick(10)
    s = thr.stats()
    assert s["rays_per_sec"] > 0
    assert abs(s["rays_per_sec_per_chip"] - s["rays_per_sec"] / 2) < 1e-6
    assert abs(
        s["samples_per_sec_per_chip"] - s["rays_per_sec_per_chip"] * 64
    ) < 1e-3
