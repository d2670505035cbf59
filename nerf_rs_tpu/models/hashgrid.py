"""Instant-NGP radiance field: multiresolution hash encoding + tiny
MLPs (arXiv 2201.05989), as a second architecture family next to the
paper NeRF (models/mlp.py). The reference has a single fixed MLP
(src/model.rs:45-93); this is the modern time-to-quality architecture.

TPU-first design notes:
  * All level resolutions, table offsets, and the dense-vs-hashed
    decision per level are STATIC (computed from the frozen ModelConfig
    at trace time) — the jitted program contains no data-dependent
    control flow.
  * The L per-level tables live in ONE (L*T, F) leaf so the encoding is
    a single `jnp.take` over a flat axis (one fused gather; its
    transpose is one scatter-add into the same leaf for the backward).
  * Corner weights/indices are built in (N, L, 8[, 3]) layouts and
    contracted with an einsum; the tiny (N, L, 8, F=2) gather result is
    consumed immediately by the reduction, so XLA keeps it in the fused
    loop rather than materializing a padded HBM tensor (CLAUDE.md's
    3-wide-minor-dim warning applies to *stored* tensors).
  * Coarse levels where a dense grid fits the table ((N_l+1)^3 <= T)
    index directly (collision-free), like the CUDA original; finer
    levels use the 3-prime spatial hash with uint32 wraparound.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .encoding import posenc, posenc_dim
from .mlp import _init_linear, dense

Params = Dict[str, Any]

# instant-ngp's spatial-hash primes (pi_1 = 1 keeps x-major dense
# locality; the uint32 products wrap, which is part of the hash)
_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(cfg: ModelConfig) -> List[int]:
    """N_l = floor(N_min * b^l), b chosen so level L-1 hits N_max
    (paper eq. 2-3)."""
    L = cfg.hash_levels
    if L == 1:
        return [cfg.hash_base_res]
    b = math.exp(
        (math.log(cfg.hash_max_res) - math.log(cfg.hash_base_res)) / (L - 1)
    )
    return [int(math.floor(cfg.hash_base_res * (b ** l))) for l in range(L)]


def init_hash_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Tables U(-1e-4, 1e-4) (paper §4); tiny MLPs He-init."""
    L, F = cfg.hash_levels, cfg.hash_features
    T = 1 << cfg.hash_table_log2
    W = cfg.hash_mlp_width
    G = cfg.hash_geo_feats
    dir_dim = posenc_dim(3, cfg.dir_enc_levels, cfg.include_input_in_enc)
    kt, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    params: Params = {
        "table": jax.random.uniform(
            kt, (L * T, F), jnp.float32, -1e-4, 1e-4
        ),
        "sigma1": _init_linear(k1, L * F, W),
        "sigma2": _init_linear(k2, W, 1 + G),
    }
    if cfg.use_viewdirs:
        params["color1"] = _init_linear(k3, G + dir_dim, W)
    else:
        params["color1"] = _init_linear(k3, G, W)
    params["color2"] = _init_linear(k4, W, W)
    params["rgb"] = _init_linear(k5, W, 3)
    return params


def hash_encode(
    table: jnp.ndarray, points: jnp.ndarray, cfg: ModelConfig
) -> jnp.ndarray:
    """(..., 3) world points -> (..., L*F) multiresolution features.

    Trilinear interpolation of the 8 surrounding grid vertices at every
    level; vertex features come from a dense index when the level's
    grid fits the table, else the spatial hash.
    """
    L, F = cfg.hash_levels, cfg.hash_features
    T = 1 << cfg.hash_table_log2
    lead = points.shape[:-1]
    p = points.reshape(-1, 3)
    n = p.shape[0]
    # normalize to [0, 1] over the AABB; clip so out-of-box samples
    # (possible with blender far planes) land on the boundary cells
    u = jnp.clip((p + cfg.hash_aabb) / (2.0 * cfg.hash_aabb), 0.0, 1.0)

    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )  # (8, 3)
    res_np = np.asarray(level_resolutions(cfg), np.float32)  # (L,)
    scaled = u[:, None, :] * jnp.asarray(res_np)[None, :, None]  # (N, L, 3)
    i0 = jnp.floor(scaled).astype(jnp.int32)  # (N, L, 3)
    frac = scaled - i0.astype(jnp.float32)  # (N, L, 3)

    # corner integer coords (N, L, 8, 3)
    ic = i0[:, :, None, :] + corners[None, None, :, :]
    # trilinear weights: prod over xyz of (frac or 1-frac) -> (N, L, 8)
    w3 = jnp.where(
        corners[None, None, :, :] == 1, frac[:, :, None, :],
        1.0 - frac[:, :, None, :],
    )
    w = w3[..., 0] * w3[..., 1] * w3[..., 2]

    # per-level flat index, dense where the grid fits (static choice)
    idx_levels = []
    for l, r in enumerate(level_resolutions(cfg)):
        c = ic[:, l]  # (N, 8, 3)
        if (r + 1) ** 3 <= T:
            flat = (c[..., 0] + (r + 1) * (c[..., 1] + (r + 1) * c[..., 2]))
        else:
            cu = c.astype(jnp.uint32)
            flat = (
                cu[..., 0] * jnp.uint32(_PRIMES[0])
                ^ cu[..., 1] * jnp.uint32(_PRIMES[1])
                ^ cu[..., 2] * jnp.uint32(_PRIMES[2])
            ) & jnp.uint32(T - 1)
            flat = flat.astype(jnp.int32)
        idx_levels.append(flat + l * T)
    idx = jnp.stack(idx_levels, axis=1)  # (N, L, 8)

    feats = jnp.take(table, idx.reshape(n, L * 8), axis=0)  # (N, L*8, F)
    feats = feats.reshape(n, L, 8, F)
    enc = jnp.einsum("nlc,nlcf->nlf", w, feats)  # (N, L, F)
    return enc.reshape(*lead, L * F)


def apply_hashgrid(
    params: Params,
    points: jnp.ndarray,
    viewdirs: jnp.ndarray,
    cfg: ModelConfig,
    dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the hash-grid field; same contract as mlp.apply_nerf:
    returns (sigma_raw (...,), rgb_raw (..., 3)) BEFORE activations —
    the caller (mlp.apply_nerf dispatch) applies cfg.sigma_activation /
    rgb sigmoid so noise/compat semantics stay in one place."""
    enc = hash_encode(params["table"], points, cfg)
    if dtype is not None and dtype != jnp.float32:
        enc = enc.astype(dtype)
    h = jax.nn.relu(dense(enc, params["sigma1"], dtype))
    out = dense(h, params["sigma2"], dtype)
    sigma_raw = out[..., 0].astype(jnp.float32)
    geo = out[..., 1:]
    if cfg.use_viewdirs:
        d = posenc(viewdirs, cfg.dir_enc_levels, cfg.include_input_in_enc)
        d = jnp.broadcast_to(d, geo.shape[:-1] + (d.shape[-1],))
        if dtype is not None and dtype != jnp.float32:
            d = d.astype(dtype)
        hc = jnp.concatenate([geo, d], axis=-1)
    else:
        hc = geo
    hc = jax.nn.relu(dense(hc, params["color1"], dtype))
    hc = jax.nn.relu(dense(hc, params["color2"], dtype))
    rgb_raw = dense(hc, params["rgb"], dtype).astype(jnp.float32)
    return sigma_raw, rgb_raw
