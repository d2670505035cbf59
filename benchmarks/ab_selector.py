"""A/B: whole-ray train kernel, selector matmul at DEFAULT (one-pass
bf16) precision vs the committed HIGHEST (6-pass) baseline. The
selector product E @ dsigma is a pure per-element gather (one 1 per E
row, no accumulation), so DEFAULT is exact up to bf16 rounding of the
dsigma values. Both kernels imported into ONE process and timed
interleaved (per CLAUDE.md). Usage:

    git show HEAD:nerf_rs_tpu/kernels/fused_train.py > /tmp/ft_old.py
    python benchmarks/ab_selector.py
"""
import importlib.util
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from nerf_rs_tpu.config import ModelConfig
from nerf_rs_tpu.kernels import fused_train as new_ft
from nerf_rs_tpu.kernels.fused_render import pack_weights
from nerf_rs_tpu.models import mlp

spec = importlib.util.spec_from_file_location("ft_old", "/tmp/ft_old.py")
old_ft = importlib.util.module_from_spec(spec)
sys.modules["ft_old"] = old_ft
spec.loader.exec_module(old_ft)

CFG = ModelConfig()
N, S, R = 4096, 64, 128
key = jax.random.PRNGKey(0)
params = mlp.init_nerf_params(key, CFG)
packed = pack_weights(params, CFG)
pT_new = new_ft.pack_weights_t(packed, CFG)
pT_old = old_ft.pack_weights_t(packed, CFG)

ks = jax.random.split(key, 6)
o = jax.random.normal(ks[0], (N, 3))
d = jax.random.normal(ks[1], (N, 3))
vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
ts = jnp.sort(jax.random.uniform(ks[2], (N, S), minval=2.0, maxval=6.0), axis=-1)
deltas = jnp.concatenate([ts[:, 1:] - ts[:, :-1],
                          jnp.full((N, 1), 1e10)], axis=-1)
gold = jax.random.uniform(ks[3], (N, 3))

def make(mod, pT):
    def f(o):
        return mod.fused_train_grads(packed, pT, o, d, vd, ts, deltas, gold,
                                     CFG, S, rays_per_block=R)
    return jax.jit(f)

fA = make(old_ft, pT_old)   # baseline: HIGHEST selector
fB = make(new_ft, pT_new)   # DEFAULT-precision selector

def chain(f, o0, iters):
    tg = f(o0)
    for _ in range(iters - 1):
        tg = f(o0 + 0.0 * tg.diag[0, 0])
    return float(jax.device_get(tg.diag[:, 4].mean()))

t0 = time.perf_counter(); lA = chain(fA, o, 2); print("compile old", round(time.perf_counter()-t0, 1), "s, loss", lA)
t0 = time.perf_counter(); lB = chain(fB, o, 2); print("compile new", round(time.perf_counter()-t0, 1), "s, loss", lB)
assert abs(lA - lB) < 1e-3, (lA, lB)

# gradient agreement: the only touched path is dsigma (sigma-head dW +
# its dh contribution), so compare a trunk dW and the sigma dW
gA, gB = fA(o), fB(o)
for name, a, b in [("d_trunk_w0", gA.d_trunk_w[0], gB.d_trunk_w[0]),
                   ("d_sigma_w", gA.d_sigma_w_row, gB.d_sigma_w_row)]:
    a, b = np.asarray(a), np.asarray(b)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
    print(name, "max normalized diff", f"{rel:.2e}")
    assert rel < 2e-2, (name, rel)

iters = 100
wa, wb = [], []
for w in range(4):
    t0 = time.perf_counter(); chain(fA, o, iters); wa.append((time.perf_counter()-t0)/iters*1000)
    t0 = time.perf_counter(); chain(fB, o, iters); wb.append((time.perf_counter()-t0)/iters*1000)
sps = lambda ms: round(N * S / ms / 1e3, 1)  # M samples/s
print("OLD (HIGHEST selector) ms", [round(x, 2) for x in wa],
      "best", round(min(wa), 2), f"= {sps(min(wa))}M samples/s")
print("NEW (DEFAULT selector) ms", [round(x, 2) for x in wb],
      "best", round(min(wb), 2), f"= {sps(min(wb))}M samples/s")
