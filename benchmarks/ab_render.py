"""A/B: 800x800 novel-view render, XLA path vs the rebuilt whole-ray
Pallas kernel (kernels/fused_ray.py), interleaved in one process
(CLAUDE.md: only interleaved windows are comparable on the shared
chip). Optional argv[1] = samples/ray (default 64)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import CameraConfig, Config, RenderConfig, TrainConfig
from nerf_rs_tpu.ops import rays as rays_ops
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.loop import render_frame
from nerf_rs_tpu.train.step import init_state

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mesh = mesh_mod.make_mesh()
rcam = CameraConfig(width=800, height=800)
key = jax.random.PRNGKey(0)


def make(fused):
    cfg = Config(
        camera=rcam,
        render=RenderConfig(num_samples=S),
        train=TrainConfig(num_rays=4096, precision="mixed"),
        use_fused_kernel=fused,
    )
    state = dp.place_state(init_state(key, cfg), mesh)
    return cfg, state, dp.make_dp_render(cfg, mesh)


cfgA, stateA, fnA = make(False)   # XLA
cfgB, stateB, fnB = make(True)    # whole-ray kernel

pose = rays_ops.pose_from_yaw_pitch(jnp.float32(0.3), jnp.float32(0.2))
o, d = rays_ops.ray_grid(pose, rcam)


def frame(cfg, state, fn):
    rgb, _, _ = render_frame(cfg, state, o, d, mesh, fn)
    return float(jax.device_get(rgb[-1, -1, 0])), rgb

t0 = time.perf_counter(); vA, rgbA = frame(cfgA, stateA, fnA)
print("compile A(xla)   ", round(time.perf_counter() - t0, 1), "s")
t0 = time.perf_counter(); vB, rgbB = frame(cfgB, stateB, fnB)
print("compile B(kernel)", round(time.perf_counter() - t0, 1), "s")
err = float(jnp.max(jnp.abs(rgbA - rgbB)))
print("max |A-B| over the frame:", err)

wa, wb = [], []
for w in range(4):
    t0 = time.perf_counter(); frame(cfgA, stateA, fnA)
    wa.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); frame(cfgB, stateB, fnB)
    wb.append(time.perf_counter() - t0)
print(f"S={S}")
print("A xla    s/frame:", [round(x, 3) for x in wa], "best", round(min(wa), 3))
print("B kernel s/frame:", [round(x, 3) for x in wb], "best", round(min(wb), 3))
