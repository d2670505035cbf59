"""Brick-vs-flat hash layout A/B on the real chip: step time AND
fit quality, interleaved in one process (CLAUDE.md variance rule).

The brick layout (models/hashgrid.brick_encode) pays ONE aligned
512 B row gather per (point, level) where the flat layout pays 8
scattered 8 B corner pairs; it holds the same parameter count but
duplicates multiple-of-3-plane vertices (~2.4x) and loses exact C0
continuity at brick seams. This harness measures both sides of that
trade at a small sphere-fit protocol:

  python benchmarks/ab_brick.py [--iters 1500] [--num_rays 1024]

Output: per-layout step-time (best of 3 windows) and final train-view
PSNR, alternated brick/flat/brick/flat.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import (
    CameraConfig, Config, ModelConfig, RenderConfig, TrainConfig,
)
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.ops import rays as rays_ops, render as render_ops
from nerf_rs_tpu.train import Batch, init_state, train_step


def build(brick: bool, args):
    return Config(
        camera=CameraConfig(width=64, height=64),
        model=ModelConfig(arch="hashgrid", sigma_activation="softplus",
                          hash_brick=brick),
        render=RenderConfig(num_samples=args.num_samples,
                            white_background=False),
        train=TrainConfig(num_rays=args.num_rays, precision="mixed",
                          learning_rate=1e-2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--num_rays", type=int, default=1024)
    ap.add_argument("--num_samples", type=int, default=64)
    ap.add_argument("--window", type=int, default=20)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    cam = CameraConfig(width=64, height=64)
    img = synthetic.sphere_image(cam)
    angles = rays_ops.view_angle_grid(6)

    def batch_fn_for(cfg):
        @jax.jit
        def batch_fn(k):
            kc, kv = jax.random.split(k)
            coords = jax.random.uniform(kc, (args.num_rays, 2)) * 63.0
            idx = jax.random.randint(kv, (args.num_rays,), 0,
                                     angles.shape[0])
            pose = rays_ops.pose_from_yaw_pitch(angles[idx, 0],
                                                angles[idx, 1])
            o, d = rays_ops.rays_for_coords(coords, pose, cfg.camera)
            gold = img[coords[:, 1].astype(jnp.int32),
                       coords[:, 0].astype(jnp.int32), :3]
            return Batch(o, d, gold)
        return batch_fn

    runs = [("brick", True), ("flat", False)]
    states = {}
    fns = {}
    for name, brick in runs:
        cfg = build(brick, args)
        states[name] = init_state(jax.random.PRNGKey(1), cfg)
        fns[name] = (jax.jit(functools.partial(train_step, cfg=cfg)),
                     batch_fn_for(cfg), cfg)
        # warmup/compile
        f, bf, _ = fns[name]
        s, aux = f(states[name], bf(key), key)
        float(jax.device_get(aux["loss"]))
        states[name] = s

    # interleaved timing windows
    times = {n: [] for n, _ in runs}
    for w in range(3):
        for name, _ in runs:
            f, bf, _ = fns[name]
            s = states[name]
            t0 = time.perf_counter()
            for i in range(args.window):
                k = jax.random.fold_in(key, w * 1000 + i)
                s, aux = f(s, bf(k), jax.random.fold_in(k, 7))
            float(jax.device_get(aux["loss"]))
            times[name].append((time.perf_counter() - t0) / args.window)
            states[name] = s
    for name, _ in runs:
        ms = [round(t * 1e3, 2) for t in times[name]]
        print(f"{name:6s} step: best {min(ms):.2f} ms  windows {ms}")

    # quality: continue both to --iters, report a held-out-view PSNR
    for name, _ in runs:
        f, bf, cfg = fns[name]
        s = states[name]
        done = 3 * args.window + 1
        for i in range(done, args.iters):
            k = jax.random.fold_in(key, 10_000 + i)
            s, aux = f(s, bf(k), jax.random.fold_in(k, 7))
        float(jax.device_get(aux["loss"]))
        pose = rays_ops.pose_from_yaw_pitch(jnp.float32(0.37),
                                            jnp.float32(0.21))
        o, d = rays_ops.ray_grid(pose, cfg.camera)
        out, _ = render_ops.render_rays(
            s.params, o, d, key, cfg.model, cfg.render, cfg.camera,
            randomized=False)
        # the flat-sphere gold is view-independent (synthetic.py), so
        # any pose's render compares against the same disk image
        gold = synthetic.sphere_image(cfg.camera)
        p = float(render_ops.psnr(out.rgb, gold[..., :3]))
        print(f"{name:6s} held-out psnr@{args.iters}: {p:.2f}")


if __name__ == "__main__":
    main()
