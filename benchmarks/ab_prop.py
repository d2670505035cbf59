"""A/B at flagship scale: proposal-guided sampling (tiny 4x64 MLP picks
128 main samples) vs the fused hierarchical chain (8x256 coarse 64 ->
fine 128), interleaved in one process. Both paths train through the
whole-ray fused kernel for the expensive pass(es)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import (
    CameraConfig, Config, ProposalConfig, RenderConfig, TrainConfig,
)
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays as rays_ops, render
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state

key = jax.random.PRNGKey(0)
mesh = mesh_mod.make_mesh()
cam = CameraConfig(width=128, height=128)
imgs = np.asarray(synthetic.sphere_scene_images(cam, 84))
angles = np.asarray(rays_ops.view_angle_grid(6))

def make(label, render_cfg, prop):
    cfg = Config(
        camera=cam, render=render_cfg, proposal=prop,
        train=TrainConfig(num_rays=4096, precision="mixed",
                          whole_ray_block=128),
        use_whole_ray_train=True,
    )
    ds = DeviceDataset(imgs, cam, angles=angles,
                       sharding=mesh_mod.replicated_sharding(mesh))
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
    fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)
    return dict(label=label, cfg=cfg, ds=ds, state=state, fn=fn, ms=[], it=0)

runs = [
    make("hier 64+128 standalone",
         RenderConfig(num_samples=64, num_fine_samples=128,
                      share_network=True, fine_mode="standalone"),
         ProposalConfig()),
    make("prop64 -> main128",
         RenderConfig(num_samples=128),
         ProposalConfig(enabled=True, num_samples=64)),
    make("prop64 -> main64",
         RenderConfig(num_samples=64),
         ProposalConfig(enabled=True, num_samples=64)),
]

def advance(r, iters, timed):
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

for r in runs:
    print(f"compiled {r['label']}: loss {advance(r, 3, False):.4f}", flush=True)
for w in range(4):
    for r in runs:
        advance(r, 100, True)
    print(f"window {w} done", flush=True)

# identical held-out eval (uniform 64-sample render of the main net)
eval_cfg = RenderConfig(num_samples=64)
pose = rays_ops.pose_from_yaw_pitch(jnp.float32(0.37), jnp.float32(0.21))
gold = synthetic.sphere_image(cam)[..., :3]
o, d = rays_ops.ray_grid(pose, cam)
for r in runs:
    out, _ = render.render_rays(r["state"].params, o, d, key,
                                r["cfg"].model, eval_cfg, cam,
                                randomized=False)
    ps = -10.0 * np.log10(float(jnp.mean((out.rgb - gold) ** 2)))
    print(f"{r['label']:24s} ms windows {[round(x,2) for x in r['ms']]} "
          f"best {min(r['ms']):.2f}  eval_psnr {ps:.2f}", flush=True)
