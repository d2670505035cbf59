"""A/B hash-encode formulations on the real chip.

The committed hash_encode gathers (N, L*8, F=2) rows and einsums — the
gather result and the (N, L, 8[,3]) weight intermediates have tiny
minor dims that XLA pads to 128 lanes when materialized (CLAUDE.md:
up to 64x memory), and the step OOMed 16G at N=524288 plus ran
579 ms/step at (1024, 64). Candidates, all computing the same
(N, L*F) encoding (possibly feature-permuted — noted per variant):

  v0: committed formulation (rows of F=2 + einsum)
  vA: flat scalar gather -> (N, L*8*F=256) minor dim, trilinear
      weights broadcast to the same (N, 256) layout, corner reduction
      as one constant (256, L*F) 0/1 matmul on the MXU
  vB: table transposed to (F, L*T), gather along axis 1 -> (F, N*L*8)
      (big minor dim), per-feature corner-sum matmul, concat (feature-
      major output permutation)

Each measured fwd and grad-wrt-table, chained dispatch, best of 3.
Usage: PYTHONPATH=. python benchmarks/ab_hash_encode.py [--n 65536]
"""
import argparse
import functools
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import ModelConfig
from nerf_rs_tpu.models import hashgrid


def corner_grid():
    return jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )


def indices_and_weights(points, cfg):
    """Shared front half: (N, L, 8) table indices + trilinear weights."""
    L = cfg.hash_levels
    T = 1 << cfg.hash_table_log2
    p = points.reshape(-1, 3)
    u = jnp.clip((p + cfg.hash_aabb) / (2.0 * cfg.hash_aabb), 0.0, 1.0)
    corners = corner_grid()
    res_np = np.asarray(hashgrid.level_resolutions(cfg), np.float32)
    scaled = u[:, None, :] * jnp.asarray(res_np)[None, :, None]
    i0 = jnp.floor(scaled).astype(jnp.int32)
    frac = scaled - i0.astype(jnp.float32)
    ic = i0[:, :, None, :] + corners[None, None, :, :]
    w3 = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :],
                   1.0 - frac[:, :, None, :])
    w = w3[..., 0] * w3[..., 1] * w3[..., 2]  # (N, L, 8)
    idx_levels = []
    for l, r in enumerate(hashgrid.level_resolutions(cfg)):
        c = ic[:, l]
        if (r + 1) ** 3 <= T:
            flat = (c[..., 0] + (r + 1) * (c[..., 1] + (r + 1) * c[..., 2]))
        else:
            cu = c.astype(jnp.uint32)
            flat = (
                cu[..., 0] * jnp.uint32(hashgrid._PRIMES[0])
                ^ cu[..., 1] * jnp.uint32(hashgrid._PRIMES[1])
                ^ cu[..., 2] * jnp.uint32(hashgrid._PRIMES[2])
            ) & jnp.uint32(T - 1)
            flat = flat.astype(jnp.int32)
        idx_levels.append(flat + l * T)
    idx = jnp.stack(idx_levels, axis=1)  # (N, L, 8)
    return idx, w


def encode_vA(table, points, cfg):
    L, F = cfg.hash_levels, cfg.hash_features
    n = points.reshape(-1, 3).shape[0]
    idx, w = indices_and_weights(points, cfg)
    # scalar-flat indices (N, L*8*F), feature fastest
    fidx = (idx[..., None] * F
            + jnp.arange(F, dtype=jnp.int32)).reshape(n, L * 8 * F)
    vals = jnp.take(table.reshape(-1), fidx.reshape(-1),
                    axis=0).reshape(n, L * 8 * F)
    wts = jnp.broadcast_to(w[..., None], (n, L, 8, F)).reshape(n, L * 8 * F)
    prod = vals * wts
    # constant 0/1 reduce over corners: (l,c,f) -> (l,f)
    M = np.zeros((L * 8 * F, L * F), np.float32)
    for l in range(L):
        for c in range(8):
            for f in range(F):
                M[(l * 8 + c) * F + f, l * F + f] = 1.0
    return prod @ jnp.asarray(M)


def encode_vB(table_t, points, cfg):
    """table_t: (F, L*T). Output permuted: features major."""
    L, F = cfg.hash_levels, cfg.hash_features
    n = points.reshape(-1, 3).shape[0]
    idx, w = indices_and_weights(points, cfg)
    flat = idx.reshape(-1)  # (N*L*8,)
    vals = jnp.take(table_t, flat, axis=1)  # (F, N*L*8)
    w256 = w.reshape(n, L * 8)
    # corner-sum matrix (L*8, L)
    Mc = np.zeros((L * 8, L), np.float32)
    for l in range(L):
        Mc[l * 8:(l + 1) * 8, l] = 1.0
    Mc = jnp.asarray(Mc)
    outs = []
    for f in range(F):
        vf = vals[f].reshape(n, L * 8)
        outs.append((vf * w256) @ Mc)  # (N, L)
    return jnp.concatenate(outs, axis=-1)  # (N, F*L)


def encode_vP(table, points, cfg, block=2048, depth=8, unroll=4):
    """v0's exact encoding with the value fetch replaced by the Pallas
    DMA row gather (kernels/gather_rows.py): one (1, 128) row DMA per
    (point, level, corner), features selected in-register. The fairest
    hand-written gather the hardware admits (see module docstring) —
    measured ~4x slower than v0's XLA element gather, the rigorous
    negative VERDICT r3 item 4 asked for."""
    from nerf_rs_tpu.kernels import gather_rows as gr

    L, F = cfg.hash_levels, cfg.hash_features
    assert F == 2, "pair gather assumes F=2"
    n = points.reshape(-1, 3).shape[0]
    idx, w = indices_and_weights(points, cfg)
    base = (idx.reshape(-1) * F).astype(jnp.int32)  # even: (N*L*8,)
    pairs = gr.gather_pairs(table.reshape(-1), base, block=block,
                            depth=depth, unroll=unroll)
    vals = pairs.reshape(n, L * 8 * F)
    wts = jnp.broadcast_to(w[..., None], (n, L, 8, F)).reshape(n, L * 8 * F)
    prod = vals * wts
    M = np.zeros((L * 8 * F, L * F), np.float32)
    for l in range(L):
        for c in range(8):
            for f in range(F):
                M[(l * 8 + c) * F + f, l * F + f] = 1.0
    return prod @ jnp.asarray(M)


def bench_rows(args):
    """Micro: raw (1, 128) row gather, Pallas DMA ring vs XLA take —
    the granularity study behind the PERFORMANCE.md round-4 numbers."""
    import functools
    from nerf_rs_tpu.kernels import gather_rows as gr

    R, N = 1 << 17, args.n
    table = jax.random.normal(jax.random.PRNGKey(0), (R, 128),
                              jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R,
                             jnp.int32)
    # one process, interleaved (CLAUDE.md chip-variance rule)
    take = jax.jit(lambda i: jnp.take(table, i, axis=0))
    variants = [("xla_take_rows", take)]
    # unroll is pinned to 1: Mosaic's fori_loop supports only
    # unroll=1 or a full unroll (kernels/gather_rows.py)
    for d in (4, 8, 16, 32):
        variants.append((
            f"pallas_d{d}",
            jax.jit(functools.partial(gr.gather_rows, table,
                                      block=2048, depth=d, unroll=1)),
        ))
    variants.append(("xla_take_rows_again", take))
    for name, f in variants:
        r = f(idx)
        jax.block_until_ready(r)
        wins = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                r = f(idx)
            jax.block_until_ready(r)
            wins.append((time.perf_counter() - t0) / 5 * 1e3)
        best = min(wins)
        print(f"{name:22s} {best:8.2f} ms  {best*1e6/N:7.1f} ns/row")


def bench(name, fn, table, pts, iters=10):
    fwd = jax.jit(lambda t, p: fn(t, p).sum())
    grd = jax.jit(jax.grad(lambda t, p: fn(t, p).sum()))
    out = []
    for tag, f in (("fwd", fwd), ("grad", grd)):
        r = f(table, pts)
        jax.block_until_ready(r)
        wins = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = table
            for _ in range(iters):
                r = f(o, pts)
                bump = r if r.ndim == 0 else r.ravel()[0]
                o = table + 0.0 * bump
            float(jax.device_get(o.ravel()[0]))
            wins.append((time.perf_counter() - t0) / iters * 1e3)
        print(f"{name} {tag}: best {min(wins):.2f} ms "
              f"({[round(x, 2) for x in wins]})")
        out.append(min(wins))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--pallas", action="store_true",
                    help="add the Pallas DMA gather column (vP) and "
                    "the raw row-gather micro sweep")
    ap.add_argument("--brick", action="store_true",
                    help="add the brick-layout column (hash_brick=True:"
                    " one 512 B row gather per (point, level))")
    args = ap.parse_args()
    if args.pallas:
        bench_rows(args)
    cfg = ModelConfig(arch="hashgrid")
    key = jax.random.PRNGKey(0)
    L, F = cfg.hash_levels, cfg.hash_features
    T = 1 << cfg.hash_table_log2
    table = jax.random.uniform(key, (L * T, F), jnp.float32, -1e-4, 1e-4)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (args.n, 3),
                             jnp.float32, -1.5, 1.5)

    # parity: vA equals committed v0 exactly (same order); vB is a
    # feature permutation
    ref = hashgrid.hash_encode(table, pts[:1024], cfg)
    va = encode_vA(table, pts[:1024], cfg)
    err_a = float(jnp.abs(ref - va).max())
    vb = encode_vB(table.T.copy(), pts[:1024], cfg)
    perm = jnp.stack([ref[..., f::F] for f in range(F)], 0)
    vb_ref = jnp.concatenate([ref[..., f::F] for f in range(F)], axis=-1)
    err_b = float(jnp.abs(vb_ref - vb).max())
    print(f"parity vA {err_a:.2e}  vB {err_b:.2e}")

    bench("v0 committed", lambda t, p: hashgrid.hash_encode(t, p, cfg),
          table, pts)
    bench("vA flat-scalar", lambda t, p: encode_vA(t, p, cfg), table, pts)
    tt = table.T.copy()
    bench("vB transposed", lambda t, p: encode_vB(t, p, cfg), tt, pts)
    if args.pallas:
        vp = encode_vP(table, pts[:1024], cfg, block=1024)
        err_p = float(jnp.abs(ref - vp).max())
        print(f"parity vP {err_p:.2e}")
        # fwd only: gather_pairs has no custom VJP (the probe is the
        # forward wall; the backward scatter shares it)
        fwd = jax.jit(lambda t, p: encode_vP(t, p, cfg).sum())
        r = fwd(table, pts)
        jax.block_until_ready(r)
        wins = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                r = fwd(table, pts)
            jax.block_until_ready(r)
            wins.append((time.perf_counter() - t0) / 5 * 1e3)
        print(f"vP pallas-dma fwd: best {min(wins):.2f} ms "
              f"({[round(x, 2) for x in wins]})")
    if args.brick:
        bcfg = ModelConfig(arch="hashgrid", hash_brick=True)
        Tb = hashgrid.brick_table_entries(bcfg)
        btable = jax.random.uniform(
            key, (bcfg.hash_levels * Tb, 128), jnp.float32, -1e-4, 1e-4)
        bench("vBrick row-layout",
              lambda t, p: hashgrid.brick_encode(t, p, bcfg),
              btable, pts)


if __name__ == "__main__":
    main()
