"""Real-chip probe for the Instant-NGP family (models/hashgrid.py):
steady-state train-step time of the ngp config (XLA autodiff path —
fused_supported gates the Pallas kernels off for hashgrid), plus the
hash_encode forward in isolation, so we can see whether the gather or
the tiny MLPs dominate. Measurement rules per CLAUDE.md: chain the
computation, device_get a dependent value, best-of-windows.

Usage: PYTHONPATH=. python benchmarks/prof_ngp.py [--samples 128]
"""
import argparse
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--arch", default="hashgrid",
                    choices=["hashgrid", "factored"])
    args = ap.parse_args()

    from nerf_rs_tpu.config import (CameraConfig, Config, ModelConfig,
                                    RenderConfig, TrainConfig)
    from nerf_rs_tpu.data import synthetic
    from nerf_rs_tpu.data.device_dataset import DeviceDataset
    from nerf_rs_tpu.models import hashgrid, mlp
    from nerf_rs_tpu.ops import rays as rays_ops
    from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
    from nerf_rs_tpu.train.step import init_state

    cfg = Config(
        camera=CameraConfig(width=128, height=128),
        model=ModelConfig(arch=args.arch, sigma_activation="softplus"),
        render=RenderConfig(num_samples=args.samples, white_background=True),
        train=TrainConfig(num_rays=args.rays, precision="mixed",
                          learning_rate=1e-2),
    )
    mesh = mesh_mod.make_mesh()
    n_views = 84
    imgs = np.asarray(synthetic.sphere_scene_images(cfg.camera, n_views))
    angles = np.asarray(rays_ops.view_angle_grid(6))
    ds = DeviceDataset(imgs, cfg.camera, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))

    key = jax.random.PRNGKey(0)
    state = dp.place_state(init_state(key, cfg), mesh)
    step_fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)

    def one_step(state, i):
        return step_fn(state, ds.images, ds.pose_data,
                       jax.random.fold_in(key, i))

    t0 = time.perf_counter()
    for i in range(3):
        state, aux = one_step(state, i)
    float(jax.device_get(aux["loss"]))
    print(f"compile+warmup {time.perf_counter()-t0:.1f} s")

    base, windows = 3, []
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(base, base + args.iters):
            state, aux = one_step(state, i)
        float(jax.device_get(aux["loss"]))
        windows.append((time.perf_counter() - t0) / args.iters * 1e3)
        base += args.iters
    sps = args.rays * args.samples / (min(windows) / 1e3)
    print(f"ngp train step ms/step windows: {[round(w,2) for w in windows]}"
          f" best {min(windows):.2f} -> {sps/1e6:.1f}M samples/s")

    # --- isolated hash_encode fwd and fwd+bwd -----------------------
    n = args.rays * args.samples
    kp = jax.random.PRNGKey(1)
    params = mlp.init_nerf_params(kp, cfg.model)
    pts = jax.random.uniform(kp, (n, 3), jnp.float32, -1.0, 1.0)

    if args.arch == "hashgrid":
        leaf, enc = params["table"], hashgrid.hash_encode
    else:
        from nerf_rs_tpu.models import factored
        leaf, enc = params["lines"], factored.factored_encode

    @jax.jit
    def enc_fwd(table, pts):
        return enc(table, pts, cfg.model).sum()

    grad_fn = jax.jit(jax.grad(lambda t, p: enc_fwd(t, p)))

    for name, fn, arg0 in (("encode fwd", enc_fwd, leaf),
                           ("encode grad", grad_fn, leaf)):
        out = fn(arg0, pts)
        jax.block_until_ready(out)
        wins = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = arg0
            for _ in range(10):
                o2 = fn(o, pts)
                if o2.ndim == 0:
                    o = arg0 + 0.0 * o2
                else:
                    o = o2
            float(jax.device_get(jnp.asarray(o).ravel()[0]))
            wins.append((time.perf_counter() - t0) / 10 * 1e3)
        print(f"{name}: {min(wins):.2f} ms for {n} pts "
              f"({[round(w,2) for w in wins]})")


if __name__ == "__main__":
    main()
