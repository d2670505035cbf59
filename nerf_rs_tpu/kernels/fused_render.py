"""Fused Pallas TPU kernel: positional encoding -> 8x256 skip MLP ->
sigma/feature/view heads, all resident in VMEM.

This is the north-star kernel of SURVEY §7 step 9 / BASELINE.json: the
reference's entire device compute (DensityNet+RadianceNet forward,
src/model.rs:96-131, running under libtorch/MPS) re-designed as ONE TPU
kernel. Per grid step it reads a block of sample points (and per-sample
view directions) from HBM once, computes
  gamma(x) -> trunk (skip at layer k as two matmuls, no concat)
  -> [feature | sigma] combined head -> view head -> raw rgb
with every intermediate activation held in VMEM, and writes only raw
sigma + rgb back. bf16 matmuls with f32 MXU accumulation and f32 bias
adds; activations stored bf16.

The positional encoding is computed in-register from iota-derived
column masks (dim select + exact power-of-2 scales + masked sin/cos),
matching models/encoding.posenc's layout (raw | per-level [sin_xyz,
cos_xyz]) bit-for-bit in the argument: an earlier matmul-based PE
(points @ scale-matrix) silently ran at the MXU's bf16 default
precision and wrecked the high-frequency phases (sin(2^9 x) needs f32
arguments).

Compositing stays outside (ops/render.composite): it is O(rays*samples)
on tiny tensors — the FLOPs and HBM traffic both live here.

Round-2 design note (measured motivation in docs/PERFORMANCE.md): a
fully-fused RAY kernel reading only per-ray (o, d, ts, deltas) can be
built WITHOUT the unsupported (R, S) <-> (R*S, 1) Mosaic reshapes by
expressing every expansion/reduction as an MXU matmul with iota-built
selector matrices: rows = R*S ray-major; o/d expansion o_rep = E @ o
with E[i, i//S] = 1; t_flat = rowsum((E @ ts) * onehot(i % S));
exclusive per-ray prefix T = L @ (sigma*delta) with L the strictly-
lower block-diagonal mask; per-ray outputs C = E^T @ (w * [rgb, 1, t]).
That removes the flat per-sample copies that currently make the kernel
wrapper slower than XLA end-to-end.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from ..models.mlp import Params


def default_is_tpu() -> bool:
    """True iff the default backend is a working TPU. A default backend
    that RAISES (libtpu mismatch — the hermetic multichip dryrun
    simulates this) counts as not-TPU: Pallas then runs in interpret
    mode on whatever mesh the program actually targets instead of
    crashing at the gate."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def enc_dims(cfg: ModelConfig) -> Tuple[int, int, int, int]:
    """(pos_dim, pos_pad, dir_dim, dir_pad): true and lane-padded
    encoding widths."""
    pos = 3 + 6 * cfg.pos_enc_levels
    dird = 3 + 6 * cfg.dir_enc_levels
    return pos, _round_up(pos, 64), dird, _round_up(dird, 32)


def _pe_encode(p: jnp.ndarray, pad: int) -> jnp.ndarray:
    """In-register posenc of p (ROWS, 3) -> (ROWS, pad).

    Column c: c < 3 -> raw p_c; else with r = c-3, level = r//6,
    component d = r%3, value = sin(2^level * p_d) if r%6 < 3 else
    cos(2^level * p_d). All scaling is exact elementwise f32 (power-of-2
    multiply); pad columns compute garbage that multiplies zero weight
    rows downstream.
    """
    rows = p.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, pad), dimension=1)
    r = jnp.maximum(cols - 3, 0)
    dim = jnp.where(cols < 3, cols, r % 3)
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]
    comp = jnp.where(dim == 0, px, jnp.where(dim == 1, py, pz))
    scale = jnp.exp2((r // 6).astype(jnp.float32))
    t = comp * jnp.where(cols < 3, 1.0, scale)
    enc = jnp.where(r % 6 < 3, jnp.sin(t), jnp.cos(t))
    return jnp.where(cols < 3, t, enc)


def _ipe_encode(mean: jnp.ndarray, var: jnp.ndarray, pad: int) -> jnp.ndarray:
    """In-register mip-NeRF integrated posenc of a diagonal Gaussian
    (mean, var), both (ROWS, 3) -> (ROWS, pad).

    Same column layout as ``_pe_encode`` (and models/encoding.
    integrated_posenc): cols 0:3 raw mean, then per level
    [sin xyz, cos xyz], every sinusoid damped by exp(-0.5 * 4^level *
    var_d) — the expected sinusoid under the Gaussian. var -> 0
    reduces exactly to ``_pe_encode(mean)``."""
    rows = mean.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, pad), dimension=1)
    r = jnp.maximum(cols - 3, 0)
    dim = jnp.where(cols < 3, cols, r % 3)

    def pick(p):
        return jnp.where(
            dim == 0, p[:, 0:1], jnp.where(dim == 1, p[:, 1:2], p[:, 2:3])
        )

    comp = pick(mean)
    v = pick(var)
    scale = jnp.exp2((r // 6).astype(jnp.float32))
    t = comp * jnp.where(cols < 3, 1.0, scale)
    damp = jnp.exp(-0.5 * scale * scale * v)
    enc = jnp.where(r % 6 < 3, jnp.sin(t), jnp.cos(t)) * damp
    return jnp.where(cols < 3, t, enc)


def _ipe_expand(o, d, mids, deltas, radii, rows):
    """In-register conical-frustum Gaussian expansion for the fused
    kernels (ops/sampling.conical_gaussians closed forms): per-ray
    (o, d) (r, 3), interval mids/deltas (r, S), radii (r, 1) ->
    Gaussian means and diagonal variances as (rows, 3) via the free
    leading-dim reshape. Feed the result to ``_ipe_encode``."""
    mu = mids
    hw = 0.5 * deltas
    mu2, hw2 = mu * mu, hw * hw
    denom = 3.0 * mu2 + hw2
    t_mean = mu + 2.0 * mu * hw2 / denom
    t_var = hw2 / 3.0 - (4.0 / 15.0) * (
        hw2 * hw2 * (12.0 * mu2 - hw2) / (denom * denom))
    r_var = radii * radii * (
        mu2 / 4.0 + (5.0 / 12.0) * hw2 - (4.0 / 15.0) * hw2 * hw2 / denom)
    d2 = d * d
    dn2 = jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-10)
    pts = (o[:, None, :] + t_mean[:, :, None] * d[:, None, :]
           ).reshape(rows, 3)
    var = (t_var[:, :, None] * d2[:, None, :]
           + r_var[:, :, None] * (1.0 - d2 / dn2)[:, None, :]
           ).reshape(rows, 3)
    return pts, var


def _contract_points(pts: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """In-register mip-NeRF 360 scene contraction (ops/contract.contract,
    same association order) for (ROWS, 3) points: pure elementwise VPU
    work + one minor-dim reduce (the proven dn2 pattern of _ipe_expand).
    Positions carry no gradient (sampling is stop-grad by design), so
    the train kernel needs no backward for this transform."""
    r2 = jnp.sum(pts * pts, axis=-1, keepdims=True)
    r = jnp.sqrt(jnp.maximum(r2, eps * eps))
    safe = jnp.maximum(r, 1.0)
    return jnp.where(r <= 1.0, pts, (2.0 - 1.0 / safe) * pts / safe)


def _contract_gaussian(
    mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-register contraction of diagonal Gaussians (ROWS, 3) — the
    closed-form linearization of ops/contract.contract_gaussian, term
    for term, so the IPE kernels reproduce the XLA path exactly."""
    r2 = jnp.sum(mean * mean, axis=-1, keepdims=True)
    r = jnp.sqrt(jnp.maximum(r2, eps * eps))
    safe = jnp.maximum(r, 1.0)
    inside = r <= 1.0
    g = 2.0 / safe - 1.0 / (safe * safe)
    gp_over_r = (-2.0 / safe**2 + 2.0 / safe**3) / safe
    x2 = mean * mean
    quad = jnp.sum(x2 * var, axis=-1, keepdims=True)
    var_out = (
        g * g * var
        + 2.0 * g * gp_over_r * x2 * var
        + gp_over_r * gp_over_r * x2 * quad
    )
    mean_out = jnp.where(inside, mean, g * mean)
    return mean_out, jnp.where(inside, var, jnp.maximum(var_out, 0.0))


class PackedWeights(NamedTuple):
    """Flat, lane-padded bf16 weights + f32 biases for the kernel."""

    trunk_w: Tuple[jnp.ndarray, ...]  # depth x (256, 256) bf16 (layer 0: (P, 256))
    skip_w: jnp.ndarray  # (P, 256) bf16 — x-part of the skip layer
    trunk_b: Tuple[jnp.ndarray, ...]  # depth x (1, 256) f32
    sf_w: jnp.ndarray  # (256, F+128) bf16: cols 0:F feature, col F sigma
    sf_b: jnp.ndarray  # (1, F+128) f32
    view_w: jnp.ndarray  # (F, V) bf16
    view_dir_w: jnp.ndarray  # (D, V) bf16
    view_b: jnp.ndarray  # (1, V) f32
    rgb_w: jnp.ndarray  # (V, 128) bf16, cols 0:3 real
    rgb_b: jnp.ndarray  # (1, 128) f32


def pack_weights(params: Params, cfg: ModelConfig) -> PackedWeights:
    """Pad/split the standard parameter pytree into the kernel layout.

    Differentiable w.r.t. params (pure pads/slices/casts), so the same
    packing can sit under jax.grad via the custom-VJP training path.
    """
    assert not cfg.compat and cfg.use_viewdirs, (
        "fused kernel covers the flagship paper architecture"
    )
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)
    W = cfg.net_width
    F = cfg.feature_width
    V = cfg.view_head_width
    bf = jnp.bfloat16

    def padw(w, rows, cols):
        r, c = w.shape
        return jnp.pad(w, ((0, rows - r), (0, cols - c))).astype(bf)

    def padb(b, cols):
        return jnp.pad(b, (0, cols - b.shape[0])).reshape(1, -1).astype(jnp.float32)

    trunk_w, trunk_b = [], []
    skip_w = None
    for i, layer in enumerate(params["trunk"]):
        w = layer["w"]
        if i == 0:
            trunk_w.append(padw(w, pos_pad, W))
        elif i == cfg.skip_layer:
            trunk_w.append(padw(w[:W], W, W))
            skip_w = padw(w[W:], pos_pad, W)
        else:
            trunk_w.append(padw(w, W, W))
        trunk_b.append(padb(layer["b"], W))
    if skip_w is None:  # no skip in range; keep a zero x-contribution
        skip_w = jnp.zeros((pos_pad, W), bf)

    sf_cols = F + 128
    sf_w = jnp.zeros((W, sf_cols), jnp.float32)
    sf_w = sf_w.at[:, :F].set(params["feature"]["w"])
    sf_w = sf_w.at[:, F : F + 1].set(params["sigma"]["w"])
    sf_b = jnp.zeros((sf_cols,), jnp.float32)
    sf_b = sf_b.at[:F].set(params["feature"]["b"])
    sf_b = sf_b.at[F : F + 1].set(params["sigma"]["b"])

    vw = params["view1"]["w"]  # (F + dird, V)
    return PackedWeights(
        trunk_w=tuple(trunk_w),
        skip_w=skip_w,
        trunk_b=tuple(trunk_b),
        sf_w=sf_w.astype(bf),
        sf_b=sf_b.reshape(1, -1),
        view_w=padw(vw[:F], F, V),
        view_dir_w=padw(vw[F:], dir_pad, V),
        view_b=padb(params["view1"]["b"], V),
        rgb_w=padw(params["rgb"]["w"], V, 128),
        rgb_b=padb(params["rgb"]["b"], 128),
    )
