"""A/B: mip-NeRF IPE training step (64+128 standalone interval
sampling, softplus, white bg — the mipnerf preset shape), XLA autodiff
vs the whole-ray fused kernel with in-register interval moments +
damped encoding. Interleaved in one process (per CLAUDE.md: the shared
chip shows 2x swings across hours; only in-process interleaved A/B is
valid). Optional argv: S_fine (default 128).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import (
    CameraConfig, Config, ModelConfig, RenderConfig, TrainConfig,
)
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays as rays_ops
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state

NF = int(sys.argv[1]) if len(sys.argv) > 1 else 128

def make(fused):
    cfg = Config(
        camera=CameraConfig(width=128, height=128),
        model=ModelConfig(ipe=True, sigma_activation="softplus"),
        render=RenderConfig(num_samples=64, num_fine_samples=NF,
                            share_network=True, fine_mode="standalone",
                            white_background=True),
        train=TrainConfig(num_rays=4096, precision="mixed",
                          whole_ray_block=128),
        use_whole_ray_train=fused,
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
cfgA, dsA, stateA, fnA = make(False)   # XLA autodiff IPE
cfgB, dsB, stateB, fnB = make(True)    # fused whole-ray IPE

def run(fn, ds, state, base, iters):
    for i in range(base, base + iters):
        state, aux = fn(state, ds.images, ds.pose_data,
                        jax.random.fold_in(key, i))
    loss = float(jax.device_get(aux["loss"]))
    return state, loss

t0=time.perf_counter(); stateA, lA = run(fnA, dsA, stateA, 0, 3); print("compile A(xla)", round(time.perf_counter()-t0,1), "s, loss", lA)
t0=time.perf_counter(); stateB, lB = run(fnB, dsB, stateB, 0, 3); print("compile B(fused)", round(time.perf_counter()-t0,1), "s, loss", lB)

iters = 50
wa, wb = [], []
base = 3
for w in range(4):
    t0 = time.perf_counter(); stateA, lA = run(fnA, dsA, stateA, base, iters)
    wa.append((time.perf_counter()-t0)/iters*1000)
    t0 = time.perf_counter(); stateB, lB = run(fnB, dsB, stateB, base, iters)
    wb.append((time.perf_counter()-t0)/iters*1000)
    base += iters
print(f"IPE config 64+{NF} standalone softplus")
print("XLA  ms/step windows", [round(x,2) for x in wa], "best", round(min(wa),2), "loss", lA)
print("FUSED ms/step windows", [round(x,2) for x in wb], "best", round(min(wb),2), "loss", lB)
