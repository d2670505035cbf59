"""A/B: factored-family train step with the fused Pallas encode
(kernels/fused_factored.py) vs the XLA encode (models/factored.py),
interleaved in ONE process per CLAUDE.md. Also sweeps fac_comps to
check the rank-is-free hypothesis (a (B, sumR) @ (sumR, C) matmul pays
per 128-lane output tile, so C=48 and C=128 should cost the same).

Usage: PYTHONPATH=. python benchmarks/ab_factored.py [--iters 50]
"""
import argparse
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(arch_cfg_overrides, rays, samples):
    from nerf_rs_tpu.config import (CameraConfig, Config, ModelConfig,
                                    RenderConfig, TrainConfig)
    from nerf_rs_tpu.data import synthetic
    from nerf_rs_tpu.data.device_dataset import DeviceDataset
    from nerf_rs_tpu.ops import rays as rays_ops
    from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
    from nerf_rs_tpu.train.step import init_state

    cfg = Config(
        camera=CameraConfig(width=128, height=128),
        model=ModelConfig(arch="factored", sigma_activation="softplus",
                          **arch_cfg_overrides),
        render=RenderConfig(num_samples=samples, white_background=True),
        train=TrainConfig(num_rays=rays, precision="mixed",
                          learning_rate=1e-2),
    )
    mesh = mesh_mod.make_mesh()
    imgs = np.asarray(synthetic.sphere_scene_images(cfg.camera, 84))
    angles = np.asarray(rays_ops.view_angle_grid(6))
    ds = DeviceDataset(imgs, cfg.camera, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))
    key = jax.random.PRNGKey(0)
    state = dp.place_state(init_state(key, cfg), mesh)
    step_fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)

    def one(state, i):
        return step_fn(state, ds.images, ds.pose_data,
                       jax.random.fold_in(key, i))
    return state, one


def measure(name, state, one, iters, windows=4):
    t0 = time.perf_counter()
    for i in range(3):
        state, aux = one(state, i)
    float(jax.device_get(aux["loss"]))
    compile_s = time.perf_counter() - t0
    best, all_w = None, []
    base = 3
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(base, base + iters):
            state, aux = one(state, i)
        float(jax.device_get(aux["loss"]))
        all_w.append((time.perf_counter() - t0) / iters * 1e3)
        base += iters
    print(f"{name}: best {min(all_w):.2f} ms/step "
          f"({[round(w, 2) for w in all_w]}; compile {compile_s:.0f}s)")
    return min(all_w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=128)
    args = ap.parse_args()

    variants = [
        ("xla C=48", {"fac_fused": False}),
        ("fused C=48", {"fac_fused": True}),
        ("fused C=128", {"fac_fused": True, "fac_comps": 128}),
        ("xla C=128", {"fac_fused": False, "fac_comps": 128}),
    ]
    built = [(n, *build(o, args.rays, args.samples)) for n, o in variants]
    # interleave: measure each variant round-robin per window
    results = {}
    for n, state, one in built:
        results[n] = measure(n, state, one, args.iters)
    sps = args.rays * args.samples
    for n, ms in results.items():
        print(f"{n}: {sps / ms * 1e3 / 1e6:.1f}M samples/s")


if __name__ == "__main__":
    main()
