"""TensorBoard observability with the reference's tag set + perf/quality
scalars it lacks.

The reference logs (SURVEY §5.5): hparams as scalars at step 0
(src/logging.rs:7-11), per-iter ``loss`` (src/main.rs:74), histograms of
screen coords (``screen_x``/``screen_y``, src/logging.rs:13-24) and ray
t-distances (``t``, 500 buckets/unit, src/logging.rs:26-39),
query-point occupancy maps projected on the yx/zx/yz world planes at
100x100 (src/logging.rs:41-107), density histograms/maps
(src/logging.rs:109-195), and the rendered prediction image
(src/logging.rs:249-264). We add ``psnr``, ``rays_per_sec_per_chip``,
``samples_per_sec_per_chip`` and ``step_time_ms`` — the metrics of
record (BASELINE.md) — plus depth/acc maps.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAVE_TB = True
except Exception:  # pragma: no cover
    _HAVE_TB = False


class TBLogger:
    """Thin wrapper; no-ops cleanly when tensorboardX is unavailable."""

    def __init__(self, log_dir: str, run_id: Optional[str] = None):
        import os

        run_id = run_id or str(int(time.time()))  # unix-ts run IDs, main.rs:31-37
        self.dir = f"{log_dir}/{run_id}"
        os.makedirs(self.dir, exist_ok=True)  # run dir exists even w/o TB
        self.writer = SummaryWriter(self.dir) if _HAVE_TB else None

    def scalars(self, values: Dict[str, float], step: int):
        if not self.writer:
            return
        for k, v in values.items():
            self.writer.add_scalar(k, float(v), step)

    def hparams(self, hp: Dict[str, float]):
        """Reference-style: hparams as individual scalars at step 0
        (log_params, src/logging.rs:7-11)."""
        if not self.writer:
            return
        for k, v in hp.items():
            self.writer.add_scalar(f"hparams/{k}", float(v), 0)

    def histogram(self, tag: str, values: np.ndarray, step: int, bins: int = 100):
        if not self.writer:
            return
        self.writer.add_histogram(tag, np.asarray(values).reshape(-1), step, bins=bins)

    def screen_coords(self, coords_xy: np.ndarray, step: int):
        """``screen_x``/``screen_y`` histograms (src/logging.rs:13-24)."""
        c = np.asarray(coords_xy)
        self.histogram("screen_x", c[..., 0], step)
        self.histogram("screen_y", c[..., 1], step)

    def ray_ts(self, ts: np.ndarray, step: int):
        """``t`` sample-distance histogram (src/logging.rs:26-39)."""
        self.histogram("t", ts, step)

    def image(self, tag: str, rgb: np.ndarray, step: int):
        """(H, W, 1|3) float [0,1] image (log_prediction,
        src/logging.rs:249-264)."""
        if not self.writer:
            return
        img = np.clip(np.asarray(rgb, np.float32), 0.0, 1.0)
        if img.ndim == 2:
            img = img[..., None]
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def point_maps(self, points: np.ndarray, step: int, weights=None, res: int = 100,
                   prefix: str = "world"):
        """Occupancy (or density-weighted) maps of query points projected
        onto the yx/zx/yz world planes (log_query_points_as_maps /
        log_density_maps, src/logging.rs:41-107,136-195)."""
        if not self.writer:
            return
        p = np.asarray(points).reshape(-1, 3)
        w = None if weights is None else np.asarray(weights).reshape(-1)
        for name, (a, b) in {"yx": (1, 0), "zx": (2, 0), "yz": (1, 2)}.items():
            img, _, _ = np.histogram2d(
                p[:, a], p[:, b], bins=res, range=[[-2, 2], [-2, 2]], weights=w
            )
            m = img.max()
            if m > 0:
                img = img / m
            self.image(f"{prefix}_{name}", img[..., None], step)

    def flush(self):
        if self.writer:
            self.writer.flush()

    def close(self):
        if self.writer:
            self.writer.close()


class NullLogger(TBLogger):
    """Non-primary processes in a multi-host run log nothing and create
    no run directory (train/loop gates on dist_init.is_primary)."""

    def __init__(self):  # no dir, no writer
        self.dir = None
        self.writer = None
