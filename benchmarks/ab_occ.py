"""A/B: occupancy-guided vs uniform stratified sampling at several
per-ray budgets, interleaved in one process (CLAUDE.md: the shared chip
drifts 2x across hours; only interleaved windows are comparable).

Each config trains the flagship 8x256 model on the 128x128 sphere scene
through the fused whole-ray path; occupancy configs EMA-update their
grid every 16 steps (mirroring train/loop.py). Quality is eval PSNR on
a held-out view rendered with IDENTICAL uniform 64-sample settings for
every config, so only the learned field differs.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import CameraConfig, Config, RenderConfig, TrainConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import occupancy, rays as rays_ops, render
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state, _matmul_dtype

CONFIGS = [  # (label, num_samples, occ_res)
    ("uniform-64", 64, 0),
    ("occ32-64", 64, 32),
    ("uniform-32", 32, 0),
    ("occ32-32", 32, 32),
    ("occ32-16", 16, 32),
]

key = jax.random.PRNGKey(0)
mesh = mesh_mod.make_mesh()
cam = CameraConfig(width=128, height=128)
imgs = np.asarray(synthetic.sphere_scene_images(cam, 84))
angles = np.asarray(rays_ops.view_angle_grid(6))

runs = {}
for label, S, occ in CONFIGS:
    cfg = Config(
        camera=cam,
        render=RenderConfig(num_samples=S, occ_res=occ, occ_aabb=1.0),
        train=TrainConfig(num_rays=4096, precision="mixed",
                          whole_ray_block=128),
        use_whole_ray_train=True,
    )
    ds = DeviceDataset(imgs, cam, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
    fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)
    runs[label] = dict(cfg=cfg, ds=ds, state=state, fn=fn, ms=[], it=0)


def advance(r, iters, timed):
    cfg, ds, fn = r["cfg"], r["ds"], r["fn"]
    state = r["state"]
    t0 = time.perf_counter()
    for i in range(r["it"], r["it"] + iters):
        if state.grid is not None and i % cfg.render.occ_update_steps == 0:
            g = occupancy.update_grid(
                state.grid, state.params, jax.random.fold_in(key, 7000 + i),
                cfg.model, cfg.render.occ_aabb, cfg.render.occ_decay,
                _matmul_dtype(cfg) or jnp.float32)
            state = state._replace(grid=g)
        state, aux = fn(state, ds.images, ds.pose_data,
                        jax.random.fold_in(key, i))
    loss = float(jax.device_get(aux["loss"]))  # fence
    if timed:
        r["ms"].append((time.perf_counter() - t0) / iters * 1000)
    r["state"] = state
    r["it"] += iters
    return loss


for label in runs:  # compile + warmup, untimed
    l = advance(runs[label], 3, False)
    print(f"compiled {label}: loss {l:.4f}", flush=True)

for w in range(5):  # interleaved timed windows
    for label in runs:
        advance(runs[label], 100, True)
    print(f"window {w} done", flush=True)

# identical held-out eval for every config: uniform 64-sample render
# at a pose outside the training grid; gold disk is view-independent
eval_cfg = RenderConfig(num_samples=64)
pose = rays_ops.pose_from_yaw_pitch(jnp.float32(0.37), jnp.float32(0.21))
gold = synthetic.sphere_image(cam)[..., :3]
o, d = rays_ops.ray_grid(pose, cam)
m0 = runs["uniform-64"]["cfg"].model
for label, r in runs.items():
    out, _ = render.render_rays(r["state"].params, o, d, key, m0,
                                eval_cfg, cam, randomized=False)
    mse = float(jnp.mean((out.rgb - gold) ** 2))
    ps = -10.0 * np.log10(mse)
    print(f"{label:11s} step_ms windows {[round(x,2) for x in r['ms']]} "
          f"best {min(r['ms']):.2f}  eval_psnr {ps:.2f}", flush=True)
