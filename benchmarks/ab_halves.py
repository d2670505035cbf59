"""A/B: whole-ray train kernel single stream vs 2-sub-block MXU/VPU
interleaving (TrainConfig.whole_ray_halves), interleaved in one process
at the flagship bench config (4096 rays x 64 samples, R=128)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import CameraConfig, Config, RenderConfig, TrainConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays as rays_ops
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state

R = int(sys.argv[1]) if len(sys.argv) > 1 else 128

def make(halves):
    cfg = Config(
        camera=CameraConfig(width=128, height=128),
        render=RenderConfig(num_samples=64),
        train=TrainConfig(num_rays=4096, precision="mixed",
                          whole_ray_block=R, whole_ray_halves=halves),
        use_whole_ray_train=True,
    )
    mesh = mesh_mod.make_mesh()
    imgs = np.asarray(synthetic.sphere_scene_images(cfg.camera, 84))
    angles = np.asarray(rays_ops.view_angle_grid(6))
    ds = DeviceDataset(imgs, cfg.camera, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
    fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)
    return cfg, ds, state, fn

key = jax.random.PRNGKey(0)
cfgA, dsA, stateA, fnA = make(1)
cfgB, dsB, stateB, fnB = make(2)

def run(fn, ds, state, base, iters):
    for i in range(base, base + iters):
        state, aux = fn(state, ds.images, ds.pose_data,
                        jax.random.fold_in(key, i))
    return state, float(jax.device_get(aux["loss"]))

t0=time.perf_counter(); stateA, lA = run(fnA, dsA, stateA, 0, 3)
print("compile A(1-stream)", round(time.perf_counter()-t0,1), "s, loss", lA, flush=True)
t0=time.perf_counter(); stateB, lB = run(fnB, dsB, stateB, 0, 3)
print("compile B(2-halves)", round(time.perf_counter()-t0,1), "s, loss", lB, flush=True)

iters, base = 100, 3
wa, wb = [], []
for w in range(4):
    t0=time.perf_counter(); stateA, lA = run(fnA, dsA, stateA, base, iters)
    wa.append((time.perf_counter()-t0)/iters*1000)
    t0=time.perf_counter(); stateB, lB = run(fnB, dsB, stateB, base, iters)
    wb.append((time.perf_counter()-t0)/iters*1000)
    base += iters
    print(f"w{w}: A {wa[-1]:.2f} B {wb[-1]:.2f} ms/step", flush=True)
print("A 1-stream best:", round(min(wa),2), "ms  B 2-halves best:", round(min(wb),2), "ms")
