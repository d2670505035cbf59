"""Sweep the whole-ray train kernel's rays_per_block on the flagship
config, interleaved windows. rows-per-grid-step = R*64; VMEM activation
footprint scales with it, MXU utilization usually rises with it until
VMEM pressure bites."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import CameraConfig, Config, RenderConfig, TrainConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays as rays_ops
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state

key = jax.random.PRNGKey(0)
mesh = mesh_mod.make_mesh()
cam = CameraConfig(width=128, height=128)
imgs = np.asarray(synthetic.sphere_scene_images(cam, 84))
angles = np.asarray(rays_ops.view_angle_grid(6))

runs = {}
for R in [32, 64, 128]:
    cfg = Config(
        camera=cam, render=RenderConfig(num_samples=64),
        train=TrainConfig(num_rays=4096, precision="mixed",
                          whole_ray_block=R),
        use_whole_ray_train=True,
    )
    ds = DeviceDataset(imgs, cam, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
    fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)
    runs[R] = dict(ds=ds, state=state, fn=fn, ms=[], it=0)

def advance(R, iters, timed):
    r = runs[R]
    state, fn, ds = r["state"], r["fn"], r["ds"]
    t0 = time.perf_counter()
    for i in range(r["it"], r["it"] + iters):
        state, aux = fn(state, ds.images, ds.pose_data,
                        jax.random.fold_in(key, i))
    loss = float(jax.device_get(aux["loss"]))
    if timed:
        r["ms"].append((time.perf_counter() - t0) / iters * 1000)
    r["state"], r["it"] = state, r["it"] + iters
    return loss

for R in runs:
    print(f"compiled R={R}: loss {advance(R, 3, False):.4f}", flush=True)
for w in range(4):
    for R in runs:
        advance(R, 100, True)
for R, r in runs.items():
    print(f"R={R:4d} windows {[round(x,2) for x in r['ms']]} "
          f"best {min(r['ms']):.2f} ms", flush=True)
