"""Fused factored-encode kernel: hat-basis weights built in VMEM +
per-axis line matmuls + CP product, forward and backward, as Pallas
launches with the 2-hot weight matrices never touching HBM.

Why: the XLA factored_encode (models/factored.py) must materialize the
(N, sumR) hat-weight matrices as matmul operands — ~3.2 GB of bf16
writes + reads per 512k-point forward (and the same again in the
backward), which makes the encode HBM-bound at ~6 ms while its MXU
work is ~1.7 ms. Building W per point-block inside the kernel leaves
only the unavoidable traffic: points in, encodings out, one d_lines
accumulator set.

Layout rules (same Mosaic facts as kernels/fused_train.py):
  * everything lives at (B, sumRp) / (B, C) / (sumRp, C) — sumRp is
    the knot count padded to a multiple of 128 so per-axis line tables
    stay sublane-aligned; padded knot columns get res=0 / knot=-2, so
    their hat weight is relu(1 - 2) = 0 and they contribute nothing
    (forward or backward).
  * d_lines accumulates across grid steps in VMEM f32 accumulators,
    initialized at program 0 (the fused_train.py pattern).
  * the backward recomputes W per axis (VPU) instead of saving it —
    the whole point is that W never exists in HBM.

The kernel has NO point-cotangent: points enter through (o, d, ts)
which are all non-parameters in every training path (hierarchical and
proposal resampling stop-gradient their ts), so the custom VJP returns
zeros for points. Differentiating this encode w.r.t. points is not
supported — use models.factored.factored_encode (XLA) for that.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from ..models import factored as fac
from .fused_render import default_is_tpu


def _knot_consts_padded(cfg: ModelConfig) -> Tuple[np.ndarray, np.ndarray, int]:
    res, knot = fac.knot_constants(cfg)
    sumR = res.shape[0]
    sumRp = -(-sumR // 128) * 128
    pad = sumRp - sumR
    # padded columns: res 0, knot -2 -> hat weight relu(1-|0-(-2)|)=0
    res_p = np.concatenate([res, np.zeros(pad, np.float32)])
    knot_p = np.concatenate([knot, np.full(pad, -2.0, np.float32)])
    return res_p[None, :], knot_p[None, :], sumRp


def _fwd_kernel(aabb, mm_dtype,
                pts_ref, res_ref, knot_ref, lx_ref, ly_ref, lz_ref,
                enc_ref):
    p = pts_ref[...]
    u = jnp.clip((p + aabb) / (2.0 * aabb), 0.0, 1.0)
    enc = None
    for a, lref in enumerate((lx_ref, ly_ref, lz_ref)):
        pos = u[:, a:a + 1] * res_ref[...]
        w = jnp.maximum(1.0 - jnp.abs(pos - knot_ref[...]), 0.0)
        feat = jnp.dot(w.astype(mm_dtype), lref[...],
                       preferred_element_type=jnp.float32)
        enc = feat if enc is None else enc * feat
    enc_ref[...] = enc


def _bwd_kernel(aabb, mm_dtype,
                pts_ref, g_ref, res_ref, knot_ref, lx_ref, ly_ref, lz_ref,
                dlx_ref, dly_ref, dlz_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlx_ref[...] = jnp.zeros_like(dlx_ref)
        dly_ref[...] = jnp.zeros_like(dly_ref)
        dlz_ref[...] = jnp.zeros_like(dlz_ref)

    p = pts_ref[...]
    u = jnp.clip((p + aabb) / (2.0 * aabb), 0.0, 1.0)
    ws, feats = [], []
    for a, lref in enumerate((lx_ref, ly_ref, lz_ref)):
        pos = u[:, a:a + 1] * res_ref[...]
        w = jnp.maximum(1.0 - jnp.abs(pos - knot_ref[...]),
                        0.0).astype(mm_dtype)
        ws.append(w)
        feats.append(jnp.dot(w, lref[...],
                             preferred_element_type=jnp.float32))
    g = g_ref[...]
    outs = (dlx_ref, dly_ref, dlz_ref)
    others = ((1, 2), (0, 2), (0, 1))
    for a in range(3):
        b, c = others[a]
        d_feat = (g * feats[b] * feats[c]).astype(mm_dtype)
        outs[a][...] += jax.lax.dot_general(
            ws[a], d_feat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=16)
def _make_encode(cfg: ModelConfig, block: int, interpret: bool,
                 bf16_matmul: bool):
    """Build the custom-VJP fused encode for a frozen ModelConfig."""
    res_p, knot_p, sumRp = _knot_consts_padded(cfg)
    C = cfg.fac_comps
    aabb = float(cfg.fac_aabb)
    mm = jnp.bfloat16 if bf16_matmul else jnp.float32
    sumR = fac.basis_dim(cfg)

    def _pad_lines(lines):
        # (3, sumR, C) master -> three (sumRp, C) tables in the matmul
        # dtype; padded rows multiply zero weights
        lp = jnp.pad(lines, ((0, 0), (0, sumRp - sumR), (0, 0)))
        lp = lp.astype(mm)
        return lp[0], lp[1], lp[2]

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    blk = lambda width: pl.BlockSpec(
        (block, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def _fwd(lines, pts):
        n = pts.shape[0]
        npad = -(-n // block) * block
        pts_p = jnp.pad(pts, ((0, npad - n), (0, 0)))
        lx, ly, lz = _pad_lines(lines)
        enc = pl.pallas_call(
            functools.partial(_fwd_kernel, aabb, mm),
            grid=(npad // block,),
            in_specs=[blk(3), full((1, sumRp)), full((1, sumRp)),
                      full((sumRp, C)), full((sumRp, C)),
                      full((sumRp, C))],
            out_specs=blk(C),
            out_shape=jax.ShapeDtypeStruct((npad, C), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pts_p, jnp.asarray(res_p), jnp.asarray(knot_p), lx, ly, lz)
        return enc[:n]

    def _bwd(lines, pts, g):
        n = pts.shape[0]
        npad = -(-n // block) * block
        pts_p = jnp.pad(pts, ((0, npad - n), (0, 0)))
        g_p = jnp.pad(g, ((0, npad - n), (0, 0)))  # zero-cotangent pad
        lx, ly, lz = _pad_lines(lines)
        dls = pl.pallas_call(
            functools.partial(_bwd_kernel, aabb, mm),
            grid=(npad // block,),
            in_specs=[blk(3), blk(C), full((1, sumRp)), full((1, sumRp)),
                      full((sumRp, C)), full((sumRp, C)),
                      full((sumRp, C))],
            out_specs=(full((sumRp, C)), full((sumRp, C)),
                       full((sumRp, C))),
            out_shape=tuple(
                jax.ShapeDtypeStruct((sumRp, C), jnp.float32)
                for _ in range(3)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pts_p, g_p, jnp.asarray(res_p), jnp.asarray(knot_p), lx, ly, lz)
        return jnp.stack([d[:sumR] for d in dls])

    @jax.custom_vjp
    def encode(lines, pts):
        return _fwd(lines, pts)

    def encode_fwd(lines, pts):
        return _fwd(lines, pts), (lines, pts)

    def encode_bwd(resid, g):
        lines, pts = resid
        return _bwd(lines, pts, g), jnp.zeros_like(pts)

    encode.defvjp(encode_fwd, encode_bwd)
    return encode


def fused_factored_encode(
    lines: jnp.ndarray,
    points: jnp.ndarray,
    cfg: ModelConfig,
    dtype=None,
    block: int = 2048,
    interpret=None,
) -> jnp.ndarray:
    """Drop-in for models.factored.factored_encode (same output, same
    column order) with the hat-weight matrices VMEM-resident. No
    point-cotangent (see module docstring)."""
    if interpret is None:
        interpret = not default_is_tpu()
    lead = points.shape[:-1]
    p = points.reshape(-1, 3)
    enc = _make_encode(cfg, block, bool(interpret),
                       dtype == jnp.bfloat16)(lines, p)
    return enc.reshape(*lead, cfg.fac_comps)
