"""Decompose the fused hierarchical step cost on the real chip:
coarse kernel, fine kernel, sample_pdf, sort, Adam — each timed as a
chained jitted loop (per CLAUDE.md: chain K calls, fence once)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from nerf_rs_tpu.config import CameraConfig, Config, RenderConfig, TrainConfig
from nerf_rs_tpu.train.step import Batch, init_state, whole_ray_grads, _whole_ray_pass
from nerf_rs_tpu.ops import sampling

N = 4096
cfg_h = Config(
    camera=CameraConfig(width=128, height=128),
    render=RenderConfig(num_samples=64, num_fine_samples=128,
                        share_network=True, fine_mode="standalone"),
    train=TrainConfig(num_rays=N, precision="mixed", whole_ray_block=128),
    use_whole_ray_train=True,
)
cfg_c = cfg_h.replace(render=RenderConfig(num_samples=64))
cfg_f128 = cfg_h.replace(render=RenderConfig(num_samples=128))

key = jax.random.PRNGKey(0)
state = init_state(key, cfg_h)
ko, kd, kg = jax.random.split(jax.random.PRNGKey(1), 3)
o = (jax.random.normal(ko, (N, 3)) * 0.1).at[:, 2].add(-1.0)
d = (jax.random.normal(kd, (N, 3)) * 0.05).at[:, 2].add(1.0)
gold = jax.random.uniform(kg, (N, 3))
batch = Batch(origins=o, dirs=d, gold=gold)

def timer(fn, arg, iters=30, reps=3):
    out = fn(arg, 0)
    jax.device_get(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        x = arg
        for i in range(iters):
            x = fn(x, i)
        jax.device_get(x)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best

params = state.params

# 1. coarse-only grads (S=64)
@jax.jit
def g_coarse(carry, i):
    grads, aux = whole_ray_grads(params, batch, jax.random.fold_in(key, i), cfg_c)
    return carry + aux["loss"]
print("coarse grads S=64      :", round(timer(g_coarse, jnp.float32(0)), 2), "ms")

# 2. fine-equivalent grads (S=128, uniform ts)
@jax.jit
def g_fine(carry, i):
    grads, aux = whole_ray_grads(params, batch, jax.random.fold_in(key, i), cfg_f128)
    return carry + aux["loss"]
print("standalone grads S=128 :", round(timer(g_fine, jnp.float32(0)), 2), "ms")

# 3. sample_pdf alone (4096 rays, 65 bins -> 128 samples) + sort
w = jax.random.uniform(jax.random.PRNGKey(3), (N, 64))
bins = jnp.broadcast_to(jnp.linspace(0.05, 2.0, 65), (N, 65))
@jax.jit
def g_pdf(carry, i):
    ts = sampling.sample_pdf(jax.random.fold_in(key, i), bins, w + carry * 0, 128, True)
    return carry + ts.sum() * 0 + ts[0, 0]
print("sample_pdf 128 (nosort):", round(timer(g_pdf, jnp.float32(0)), 2), "ms")

# 4. full hierarchical chain
@jax.jit
def g_chain(carry, i):
    grads, aux = whole_ray_grads(params, batch, jax.random.fold_in(key, i), cfg_h)
    return carry + aux["loss"]
print("hier chain 64+128      :", round(timer(g_chain, jnp.float32(0)), 2), "ms")
