"""A/B on the SPARSE lego-class Blender scene (objects fill ~10% of the
frustum): uniform vs occupancy-guided vs proposal-guided sampling,
interleaved in one process. Eval: PSNR on a held-out val view rendered
with each config's own sampling (that IS the product behavior)."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import (
    CameraConfig, Config, ProposalConfig, RenderConfig, TrainConfig,
)
from nerf_rs_tpu.data.factory import make_dataset
from nerf_rs_tpu.ops import occupancy, rays as rays_ops, render
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.loop import render_frame
from nerf_rs_tpu.train.step import init_state, _matmul_dtype

key = jax.random.PRNGKey(0)
mesh = mesh_mod.make_mesh()
BASE = Config(
    camera=CameraConfig(near=2.0, far=6.0),
    render=RenderConfig(num_samples=64, white_background=True),
    train=TrainConfig(num_rays=4096, precision="mixed", whole_ray_block=128),
    data=dataclasses.replace(Config().data, dataset="blender",
                             img_dir=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data/proclego")),
    use_whole_ray_train=True,
)

def make(label, **kw):
    cfg = BASE.replace(**kw)
    ds = make_dataset(cfg, sharding=mesh_mod.replicated_sharding(mesh))
    cfg = dataclasses.replace(cfg, camera=ds.camera)
    state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
    fn = dp.make_dp_train_step(cfg, mesh, dataset=ds)
    return dict(label=label, cfg=cfg, ds=ds, state=state, fn=fn, ms=[], it=0)

runs = [
    make("uniform-64"),
    make("occ64-64",
         render=dataclasses.replace(BASE.render, occ_res=64, occ_aabb=1.6)),
    make("occ64-32",
         render=dataclasses.replace(BASE.render, num_samples=32, occ_res=64,
                                    occ_aabb=1.6)),
    make("prop64-main64",
         proposal=ProposalConfig(enabled=True, num_samples=64)),
]

def advance(r, iters, timed):
    cfg, state, fn, ds = r["cfg"], r["state"], r["fn"], r["ds"]
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
    loss = float(jax.device_get(aux["loss"]))
    if timed:
        r["ms"].append((time.perf_counter() - t0) / iters * 1000)
    r["state"], r["it"] = state, r["it"] + iters
    return loss

for r in runs:
    print(f"compiled {r['label']}: loss {advance(r, 3, False):.4f}", flush=True)
for w in range(4):
    for r in runs:
        advance(r, 250, True)
    print(f"window {w} done", flush=True)

# eval: held-out val view, IDENTICAL uniform 64-sample render for every
# config (the learned field on equal footing; training-time sampling is
# what differed)
eval_cfg = runs[0]["cfg"]  # uniform-64, no grid/proposal
eval_ds = make_dataset(eval_cfg, split="val",
                       sharding=mesh_mod.replicated_sharding(mesh))
o, d = eval_ds.view_rays(0)
gold = eval_ds.view_gold(0)
render_fn = dp.make_dp_render(eval_cfg, mesh)
for r in runs:
    state = runs[0]["state"]._replace(params=r["state"].params,
                                      fine_params=None, grid=None)
    rgb, _, _ = render_frame(eval_cfg, state, o, d, mesh, render_fn)
    mse = float(jnp.mean((rgb - gold[..., :3]) ** 2))
    ps = -10.0 * np.log10(mse)
    print(f"{r['label']:14s} ms windows {[round(x,2) for x in r['ms']]} "
          f"best {min(r['ms']):.2f}  val_psnr {ps:.2f}", flush=True)
