"""Whole-ray fused TRAINING kernel: forward (PE -> trunk -> heads ->
compositing -> MSE) and backward (loss grads -> compositing VJP ->
head/trunk VJP -> dW) in ONE Pallas launch, activations resident in
VMEM, dW accumulated across grid steps in VMEM.

Why: the XLA training step is HBM-bandwidth-bound on stored
(rays, samples, 256) activations — profiled on v5e, every major fusion
runs at 550-700 GiB/s (8 backward-dx fusions alone cost 4.7 ms of the
14 ms step reading stored activations). Keeping the activations of a
ray block in VMEM for an immediately-following in-kernel backward
removes that traffic entirely: per step this kernel reads only per-ray
(o, d, vd, ts, deltas, gold) and writes per-ray diagnostics + one set
of weight gradients.

Design notes (each probed on real v5e Mosaic):
  * per-sample expansion is FREE: pts = (o[:,None,:] + ts[:,:,None] *
    d[:,None,:]).reshape(rows, 3) — leading-dim merges/splits with the
    minor dim intact are supported relayouts, so the selector-matmul
    machinery of kernels/fused_ray.py is needed only for the one
    unsupported collapse (R,S) -> (rows,1) in the backward.
  * per-sample scalars (sigma, deltas, weights, grads) live in (R, S)
    layout; prefix/suffix sums are HIGHEST-precision triangular
    matmuls ((R,S)@(S,S), exact to 1e-7, ~0.1% of block FLOPs) since
    Mosaic has no cumsum lowering.
  * bare-trunk chain measured 91-101 TFLOP/s at 4096-row blocks vs
    XLA's 62 (flat) / 86 (conv form) — the headroom this kernel banks.

Compositing VJP (w_i = T_i(1-e^{-a_i}), a = sigma*delta, T_i =
e^{-excl cumsum a}): dL/da_k = u_k (T_k - w_k) - sum_{i>k} u_i w_i,
with u = dL/dw; the suffix term is one strict-lower-triangular matmul.
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
from .fused_render import PackedWeights, _pe_encode, enc_dims, pack_weights


class PackedWeightsT(NamedTuple):
    """Transposed weights the backward needs (built by pack_weights_t)."""

    trunk_wT: Tuple[jnp.ndarray, ...]  # layers 1..depth-1: (W, W) bf16
    feat_wT: jnp.ndarray  # (F, W) bf16
    view_wT: jnp.ndarray  # (V, F) bf16
    rgb_wT: jnp.ndarray  # (128, V) bf16
    sigma_w_row: jnp.ndarray  # (1, W) f32 — sigma head column as a row


def pack_weights_t(packed: PackedWeights, cfg: ModelConfig) -> PackedWeightsT:
    F = cfg.feature_width
    return PackedWeightsT(
        trunk_wT=tuple(jnp.transpose(w) for w in packed.trunk_w[1:]),
        feat_wT=jnp.transpose(packed.sf_w[:, :F]),
        view_wT=jnp.transpose(packed.view_w),
        rgb_wT=jnp.transpose(packed.rgb_w),
        sigma_w_row=jnp.transpose(
            packed.sf_w[:, F : F + 1].astype(jnp.float32)
        ),
    )


class TrainGrads(NamedTuple):
    """Kernel outputs in packed layout (unpack with unpack_grads)."""

    diag: jnp.ndarray  # (N, 8): [r, g, b, acc, sqerr, dist, 0, 0]
    # (dist = per-ray distortion loss when dist_weight > 0, else 0)
    weights: jnp.ndarray  # (N, S) compositing weights (PDF input for
    # the hierarchical fine pass; stop-gradded by construction — the
    # kernel emits values, no VJP flows through them)
    d_trunk_w: Tuple[jnp.ndarray, ...]
    d_skip_w: jnp.ndarray
    d_trunk_b: jnp.ndarray  # (depth, W) stacked
    d_feat_w: jnp.ndarray  # (W, F)
    d_feat_b: jnp.ndarray  # (1, F)
    d_sigma_w_row: jnp.ndarray  # (1, W) — transpose of the (W,1) param
    d_sigma_b: jnp.ndarray  # (1, 128), every lane = the total
    d_view_w: jnp.ndarray
    d_view_dir_w: jnp.ndarray
    d_view_b: jnp.ndarray
    d_rgb_w: jnp.ndarray  # (V, 128)
    d_rgb_b: jnp.ndarray  # (1, 128)


def _train_kernel(
    depth: int,
    skip_layer: int,
    F: int,
    pos_pad: int,
    dir_pad: int,
    S: int,
    R: int,
    white_bg: bool,
    loss_scale: float,  # d(loss)/d(sum of squared residuals) = 1/(3N)
    halves: int,  # sub-blocks interleaved for MXU/VPU overlap (1 or 2)
    dist_scale: float,  # distortion-loss weight / N rays (0 = off)
    dist_near: float,  # linear: [near, far] normalizes sample positions
    dist_inv_span: float,  # for the distortion loss (mip-NeRF 360
    # s-coords). disparity: dist_near holds g0 = 1/near and
    # dist_inv_span = 1/(g0 - g1) — s = (g0 - 1/t) * inv_span.
    dist_disparity: bool,  # normalize s in disparity (the unbounded
    # sampling space); deltas convert exactly: s(t+dt) - s(t) =
    # dt / (t (t+dt)) * inv_span, matching ops/render.distortion_loss's
    # shifted-diff convention given deltas_from_ts deltas
    contract: bool,  # mip-NeRF 360 scene contraction before encoding
    # (fused_render._contract_points/_contract_gaussian; forward-only —
    # sample positions are stop-grad, so no backward term exists)
    ipe: bool,  # mip-NeRF integrated encoding: ts are interval MIDS,
    # deltas exact interval lengths, and a per-ray radii ref follows
    # gold — conical-Gaussian moments + damped PE computed in-register
    sigma_act: str,  # "relu" | "softplus" (fwd + matching bwd slope)
    o_ref, d_ref, vd_ref, ts_ref, deltas_ref, gold_ref,
    *refs,
):
    """Fused fwd+bwd body. With ``halves=2`` the ray block is processed
    as two interleaved sub-blocks: every stage emits the two halves'
    MXU ops adjacently so sub-block B's matmul can overlap sub-block
    A's dependent VPU work (relu/exp/sigmoid/PE) — the interleaving
    that probed ~100 TFLOP/s vs 91 for one stream on v5e
    (docs/PERFORMANCE.md). halves=1 reproduces the round-2 kernel
    exactly."""
    bf, f32 = jnp.bfloat16, jnp.float32
    hi = jax.lax.Precision.HIGHEST
    H = halves
    Rh = R // H
    rows = Rh * S

    # ---- unpack refs -----------------------------------------------------
    i = 0
    radii_ref = None
    if ipe:
        radii_ref = refs[0]; i = 1
    trunk_w = refs[i:i + depth]; i += depth
    skip_w = refs[i]; i += 1
    trunk_b = refs[i:i + depth]; i += depth
    sf_w, sf_b, view_w, view_dir_w, view_b, rgb_w, rgb_b = refs[i:i + 7]; i += 7
    trunk_wT = refs[i:i + depth - 1]; i += depth - 1
    feat_wT, view_wT, rgb_wT, sigma_w_row = refs[i:i + 4]; i += 4
    (diag_ref, w_ref, *grad_refs) = refs[i:]
    dw_trunk = grad_refs[:depth]
    dskip_ref = grad_refs[depth]
    db_trunk_ref = grad_refs[depth + 1]
    (dfeat_w_ref, dfeat_b_ref, dsigma_w_ref, dsigma_b_ref, dview_w_ref,
     dview_dir_w_ref, dview_b_ref, drgb_w_ref, drgb_b_ref
     ) = grad_refs[depth + 2:]

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _init():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    def each(fn):  # per-half map, emitting the halves' ops adjacently
        return [fn(p) for p in range(H)]

    def hsum(xs):  # one accumulator write per VMEM grad ref
        out = xs[0]
        for x in xs[1:]:
            out = out + x
        return out

    # ---- forward ---------------------------------------------------------
    sl = lambda ref, p: ref[p * Rh:(p + 1) * Rh]
    o = each(lambda p: sl(o_ref, p))
    d = each(lambda p: sl(d_ref, p))
    ts = each(lambda p: sl(ts_ref, p))
    deltas = each(lambda p: sl(deltas_ref, p))
    if ipe:
        # conical-frustum Gaussian moments (ops/sampling.conical_gaussians
        # closed forms) in (Rh, S), then the same free leading-dim
        # expansion the point path uses; the per-ray (Rh, 1) radius
        # broadcasts over lanes exactly like acc_r below
        from .fused_render import (
            _contract_gaussian, _ipe_encode, _ipe_expand,
        )

        mv = each(lambda p: _ipe_expand(
            o[p], d[p], ts[p], deltas[p], sl(radii_ref, p), rows))
        if contract:
            mv = each(lambda p: _contract_gaussian(mv[p][0], mv[p][1]))
        x = each(lambda p: _ipe_encode(
            mv[p][0], mv[p][1], pos_pad).astype(bf))
    else:
        pts = each(lambda p: (
            o[p][:, None, :] + ts[p][:, :, None] * d[p][:, None, :]
        ).reshape(rows, 3))
        if contract:
            from .fused_render import _contract_points

            pts = each(lambda p: _contract_points(pts[p]))
        x = each(lambda p: _pe_encode(pts[p], pos_pad).astype(bf))  # (rows, P)
    # per-sample copies of the view-dir encoding are needed only by the
    # BACKWARD dview_dir_w contraction; the forward view-dir matmul is
    # hoisted to ray level below (view dirs are constant per ray), so
    # the expansion is the free leading-dim relayout. The broadcast
    # must happen in f32: a bf16 (Rh, 32) vector fails the Mosaic
    # shape cast ("infer-vector-layout: unsupported shape cast").
    dvr_f32 = each(lambda p: _pe_encode(sl(vd_ref, p), dir_pad))
    dvr = each(lambda p: dvr_f32[p].astype(bf))
    dv = each(lambda p: jnp.broadcast_to(
        dvr_f32[p][:, None, :], (Rh, S, dir_pad)
    ).reshape(rows, dir_pad).astype(bf))

    hs = [[] for _ in range(H)]  # post-relu activations for the backward
    h = list(x)
    for li in range(depth):
        acc = each(lambda p: jnp.dot(
            h[p], trunk_w[li][:], preferred_element_type=f32))
        if li == skip_layer and li > 0:
            acc = each(lambda p: acc[p] + jnp.dot(
                x[p], skip_w[:], preferred_element_type=f32))
        h = each(lambda p: jnp.maximum(
            acc[p] + trunk_b[li][:], 0.0).astype(bf))
        for p in range(H):
            hs[p].append(h[p])

    # sigma/feature head forward: one combined (W, F+128) matmul —
    # sigma rides the feature matmul's padding block, and the
    # slice->reshape below is the one known-good route to a concrete
    # (Rh, S) layout (a VPU lane-reduce dot was tried instead and its
    # (rows,1) result carries a lane-REPLICATED layout Mosaic cannot
    # reshape to (Rh, S): "Invalid relayout ... replicated in
    # destination but not in source"). The padding tax is paid once,
    # forward only — the backward splits the head (below).
    sf = each(lambda p: jnp.dot(
        h[p], sf_w[:], preferred_element_type=f32) + sf_b[:])
    sigma_raw_rs = each(lambda p: sf[p][:, F:F + 1].reshape(Rh, S))
    feat = each(lambda p: sf[p][:, :F].astype(bf))
    hv_acc = each(lambda p: jnp.dot(
        feat[p], view_w[:], preferred_element_type=f32))
    # view-dir head at RAY level — (Rh, dir_pad) @ (dir_pad, V) once
    # per ray instead of S times (1 MXU tile-pass vs 64 per block at
    # R=128/S=64), then the free leading-dim expansion to rows
    hv_dir = each(lambda p: jnp.dot(
        dvr[p], view_dir_w[:], preferred_element_type=f32))
    hv_acc = each(lambda p: hv_acc[p] + jnp.broadcast_to(
        hv_dir[p][:, None, :], (Rh, S, hv_dir[p].shape[-1])
    ).reshape(rows, hv_dir[p].shape[-1]))
    hv = each(lambda p: jnp.maximum(hv_acc[p] + view_b[:], 0.0).astype(bf))
    rgb_raw = each(lambda p: (jnp.dot(
        hv[p], rgb_w[:], preferred_element_type=f32) + rgb_b[:])[:, :3])
    rgb = each(lambda p: jax.nn.sigmoid(rgb_raw[p]))
    rgb_rs = each(lambda p: rgb[p].reshape(Rh, S, 3))

    # compositing in (Rh, S)
    if sigma_act == "softplus":
        # stable softplus = max(x, 0) + log1p(exp(-|x|)); slope sigmoid
        sigma_rs = each(lambda p: jnp.maximum(sigma_raw_rs[p], 0.0)
                        + jnp.log1p(jnp.exp(-jnp.abs(sigma_raw_rs[p]))))
    else:
        sigma_rs = each(lambda p: jnp.maximum(sigma_raw_rs[p], 0.0))
    a = each(lambda p: sigma_rs[p] * deltas[p])  # sigma*delta
    rs_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cs_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    triu_strict = (rs_i < cs_i).astype(f32)
    tril_strict = (rs_i > cs_i).astype(f32)
    excl = each(lambda p: jax.lax.dot_general(
        a[p], triu_strict, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=f32))
    trans = each(lambda p: jnp.exp(-excl[p]))
    w = each(lambda p: trans[p] * (1.0 - jnp.exp(-a[p])))  # (Rh, S)
    C = each(lambda p: jnp.sum(w[p][:, :, None] * rgb_rs[p], axis=1))
    acc_r = each(lambda p: jnp.sum(w[p], axis=-1, keepdims=True))
    if white_bg:
        C = each(lambda p: C[p] + (1.0 - acc_r[p]))

    # mip-NeRF 360 distortion loss on the compositing weights (see
    # ops/render.distortion_loss for the math): the inclusive prefix
    # sums reuse the triangular-matmul machinery; A_i = d(L_inner)/dw_i
    # / 2 feeds both the per-ray loss value (diag slot 5) and the
    # backward's u-cotangent. Compile-time gated — zero cost when off.
    if dist_scale != 0.0:
        incl = (rs_i <= cs_i).astype(f32)
        if dist_disparity:
            m = each(lambda p: (dist_near - 1.0 / ts[p]) * dist_inv_span)
            if ipe:
                # IPE ts are interval MIDPOINTS: the interval is
                # [mid - dt/2, mid + dt/2], so the exact s-length is
                # dt / ((mid - dt/2)(mid + dt/2)) (ADVICE r4 — the
                # [mid, mid+dt] form below deviates by O(dt^2))
                dn = each(lambda p: deltas[p] / (
                    (ts[p] - 0.5 * deltas[p]) * (ts[p] + 0.5 * deltas[p])
                ) * dist_inv_span)
            else:
                dn = each(lambda p: deltas[p] / (
                    ts[p] * (ts[p] + deltas[p])) * dist_inv_span)
        else:
            m = each(lambda p: (ts[p] - dist_near) * dist_inv_span)
            dn = each(lambda p: deltas[p] * dist_inv_span)
        cw = each(lambda p: jax.lax.dot_general(
            w[p], incl, (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=f32))
        cwm = each(lambda p: jax.lax.dot_general(
            w[p] * m[p], incl, (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=f32))
        wm_tot = each(lambda p: jnp.sum(
            w[p] * m[p], axis=-1, keepdims=True))
        dist_a = each(lambda p: (
            m[p] * (2.0 * cw[p] - acc_r[p]) + wm_tot[p] - 2.0 * cwm[p]))
        ldist = each(lambda p: jnp.sum(
            w[p] * dist_a[p] + w[p] * w[p] * dn[p] * (1.0 / 3.0),
            axis=-1, keepdims=True))

    gold = each(lambda p: sl(gold_ref, p))
    res = each(lambda p: C[p] - gold[p])  # (Rh, 3)
    sqerr = each(lambda p: jnp.mean(res[p] * res[p], axis=-1, keepdims=True))
    for p in range(H):
        w_ref[p * Rh:(p + 1) * Rh] = w[p]  # hierarchical PDF input
        col5 = ldist[p] if dist_scale != 0.0 else jnp.zeros((Rh, 1), f32)
        diag_ref[p * Rh:(p + 1) * Rh] = jnp.concatenate(
            [C[p], acc_r[p], sqerr[p], col5, jnp.zeros((Rh, 2), f32)],
            axis=1,
        )

    # ---- backward ----------------------------------------------------------
    dC = each(lambda p: (2.0 * loss_scale) * res[p])  # (Rh, 3)
    u = each(lambda p: jnp.sum(rgb_rs[p] * dC[p][:, None, :], axis=-1))
    if white_bg:
        u = each(lambda p: u[p] - jnp.sum(dC[p], axis=-1, keepdims=True))
    if dist_scale != 0.0:
        # dL_dist/dw_k = 2 A_k + (2/3) w_k d_k, added into the same
        # u-cotangent the compositing VJP below consumes (sample
        # positions are values — stop-grad per mip-NeRF 360)
        u = each(lambda p: u[p] + dist_scale * (
            2.0 * dist_a[p] + (2.0 / 3.0) * w[p] * dn[p]))
    drgb = each(lambda p: (
        w[p][:, :, None] * dC[p][:, None, :]).reshape(rows, 3))

    uw = each(lambda p: u[p] * w[p])
    suffix = each(lambda p: jax.lax.dot_general(
        uw[p], tril_strict, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=f32))
    da = each(lambda p: u[p] * (trans[p] - w[p]) - suffix[p])
    if sigma_act == "softplus":
        slope = each(lambda p: jax.nn.sigmoid(sigma_raw_rs[p]))
    else:
        slope = each(lambda p: (sigma_raw_rs[p] > 0.0).astype(f32))
    dsigma_rs = each(lambda p: da[p] * deltas[p] * slope[p])

    # the one unsupported relayout (Rh,S)->(rows,1): selector matmul.
    # A broadcast+lane-mask alternative (expand dsigma to (Rh,S,S),
    # reshape, one-hot pick) was tried — its Mosaic compile ran >13 min
    # without finishing (the (Rh,S,S) broadcast is NOT the free
    # leading-dim pattern of the point expansion; minor dim 3 vs S).
    # The selector matmul runs at DEFAULT (one-pass bf16) precision:
    # E has exactly one 1 per row, so the product is a pure per-element
    # gather with no accumulation — exact up to bf16 rounding of the
    # dsigma values, which already ride bf16 everywhere downstream. The
    # round-3 HIGHEST version spent 6 MXU passes here (~5% of the
    # block's tile-passes) buying nothing.
    ray_of_row = jax.lax.broadcasted_iota(jnp.int32, (rows, Rh), 0) // S
    colR = jax.lax.broadcasted_iota(jnp.int32, (rows, Rh), 1)
    E = (ray_of_row == colR).astype(bf)
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 0) % S
    colS = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    sel = (srow == colS).astype(f32)
    dsig_rows = each(lambda p: jax.lax.dot_general(
        E, dsigma_rs[p].astype(bf), (((1,), (0,)), ((), ())),
        preferred_element_type=f32))  # (rows, S)
    dsigma_col = each(lambda p: jnp.sum(
        dsig_rows[p] * sel, axis=1, keepdims=True))  # (rows, 1)

    # rgb head
    drgb_raw = each(lambda p: drgb[p] * rgb[p] * (1.0 - rgb[p]))
    drgb128 = each(lambda p: jnp.concatenate(
        [drgb_raw[p], jnp.zeros((rows, 125), f32)], axis=1).astype(bf))
    drgb_w_ref[:] += hsum(each(lambda p: jax.lax.dot_general(
        hv[p], drgb128[p], (((0,), (0,)), ((), ())),
        preferred_element_type=f32)))
    drgb_b_ref[:] += hsum(each(lambda p: jnp.sum(
        drgb128[p].astype(f32), axis=0, keepdims=True)))
    dhv = each(lambda p: jnp.dot(
        drgb128[p], rgb_wT[:], preferred_element_type=f32))
    g_hv = each(lambda p: (
        dhv[p] * (hv[p].astype(f32) > 0.0).astype(f32)).astype(bf))

    # view head
    dview_w_ref[:] += hsum(each(lambda p: jax.lax.dot_general(
        feat[p], g_hv[p], (((0,), (0,)), ((), ())),
        preferred_element_type=f32)))
    dview_dir_w_ref[:] += hsum(each(lambda p: jax.lax.dot_general(
        dv[p], g_hv[p], (((0,), (0,)), ((), ())),
        preferred_element_type=f32)))
    dview_b_ref[:] += hsum(each(lambda p: jnp.sum(
        g_hv[p].astype(f32), axis=0, keepdims=True)))
    dfeat = each(lambda p: jnp.dot(
        g_hv[p], view_wT[:], preferred_element_type=f32))  # (rows, F)

    # sigma/feature head backward, split like the forward: the feature
    # dW is a clean (W, F) matmul; sigma's dW is a VPU sublane-reduce
    # of h ⊙ dsigma (emitted as the (1, W) row — the (W, 1) transpose
    # is done outside the kernel where relayout is free).
    dfeat_bf = each(lambda p: dfeat[p].astype(bf))
    dfeat_w_ref[:] += hsum(each(lambda p: jax.lax.dot_general(
        hs[p][-1], dfeat_bf[p], (((0,), (0,)), ((), ())),
        preferred_element_type=f32)))
    dfeat_b_ref[:] += hsum(each(lambda p: jnp.sum(
        dfeat[p], axis=0, keepdims=True)))
    dsigma_w_ref[:] += hsum(each(lambda p: jnp.sum(
        hs[p][-1].astype(f32) * dsigma_col[p], axis=0, keepdims=True)))
    # bias grad: lane-replicate dsigma_col across a full 128-lane tile
    # before the sublane reduce — (rows, X)->(1, X) only lowers for
    # X a multiple of 128 (a (Rh, S)->(1, S) reduce at S=64 fails with
    # "Unsupported output implicit dimension"). Every lane of the
    # (1, 128) accumulator holds the same total; unpack reads lane 0.
    ones_lane = jnp.ones((rows, 128), f32)
    dsigma_b_ref[:] += hsum(each(lambda p: jnp.sum(
        dsigma_col[p] * ones_lane, axis=0, keepdims=True)))
    dh = each(lambda p: jnp.dot(
        dfeat_bf[p], feat_wT[:], preferred_element_type=f32
    ) + dsigma_col[p] * sigma_w_row[:])

    # trunk
    for li in range(depth - 1, -1, -1):
        g = each(lambda p: (
            dh[p] * (hs[p][li].astype(f32) > 0.0).astype(f32)).astype(bf))
        inp = each(lambda p: hs[p][li - 1] if li > 0 else x[p])
        dw_trunk[li][:] += hsum(each(lambda p: jax.lax.dot_general(
            inp[p], g[p], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)))
        if li == skip_layer and li > 0:
            dskip_ref[:] += hsum(each(lambda p: jax.lax.dot_general(
                x[p], g[p], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)))
        db_trunk_ref[li:li + 1, :] += hsum(each(lambda p: jnp.sum(
            g[p].astype(f32), axis=0, keepdims=True)))
        if li > 0:
            dh = each(lambda p: jnp.dot(
                g[p], trunk_wT[li - 1][:], preferred_element_type=f32))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "white_bg", "rays_per_block",
                     "interpret", "halves", "dist_weight", "near", "far",
                     "dist_space"),
)
def fused_train_grads(
    packed: PackedWeights,
    packedT: PackedWeightsT,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    viewdirs: jnp.ndarray,
    ts: jnp.ndarray,
    deltas: jnp.ndarray,
    gold: jnp.ndarray,
    cfg: ModelConfig,
    num_samples: int,
    white_bg: bool = False,
    rays_per_block: int = 64,
    interpret: bool = False,
    halves: int = 1,
    dist_weight: float = 0.0,
    near: float = 0.0,
    far: float = 1.0,
    dist_space: str = "linear",
    radii: jnp.ndarray = None,
) -> TrainGrads:
    """One fused forward+backward over N rays; N % rays_per_block == 0.

    Returns per-ray diagnostics and PACKED weight gradients of
    loss = mean over rays and channels of (C - gold)^2, plus
    dist_weight * the mean per-ray mip-NeRF 360 distortion loss when
    dist_weight > 0 (per-ray values land in diag column 5; near/far
    normalize sample positions). ``halves=2`` interleaves two ray
    sub-blocks per grid step for MXU/VPU overlap (same math; dW
    contributions of the halves are summed in registers before each
    VMEM accumulate).

    ``cfg.ipe`` (with ``radii`` (N,) per-ray cone base radii): ``ts``
    are interval MIDPOINTS and ``deltas`` exact interval lengths; the
    kernel builds the conical-frustum Gaussians and the damped
    integrated encoding in-register (mip-NeRF at whole-ray-kernel
    speed). ``cfg.sigma_activation`` selects relu or softplus density.
    """
    n = origins.shape[0]
    S = num_samples
    R = rays_per_block
    assert n % R == 0, (n, R)
    # Mosaic compile guard (round 5): sublane-UNALIGNED interval counts
    # (S % 8 != 0 — e.g. the union fine pass's S + S_f + 1 = 193) send
    # the Mosaic compiler into a pathological relayout search: the
    # S=193 compile ran >15 min and OOM-killed the AOT helper, while
    # S=200 compiles in ~5 min and runs 26.5 ms/4096 rays (probed on
    # v5e). Pad with zero-LENGTH intervals at the far end: delta = 0
    # -> a = sigma*delta = 0 -> w = 0 exactly, so the forward loss,
    # every dW (dsigma = da*delta = 0 kills the pad rows' backward)
    # and the distortion terms (w = 0, dn = 0) are unchanged; the
    # padded ts reuse the last midpoint so disparity's 1/t and the
    # IPE moments stay finite.
    if S % 8 != 0:
        pad = (8 - S % 8)
        ts = jnp.concatenate(
            [ts, jnp.broadcast_to(ts[:, -1:], (n, pad))], axis=1)
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((n, pad), deltas.dtype)], axis=1)
        S = S + pad
    depth = cfg.net_depth
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)
    W = cfg.net_width
    F = cfg.feature_width
    V = cfg.view_head_width
    f32 = jnp.float32

    ray_spec = lambda width: pl.BlockSpec(
        (R, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple(0 for _ in a.shape), memory_space=pltpu.VMEM
    )
    acc_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    ipe = bool(cfg.ipe)
    if ipe:
        assert radii is not None, "cfg.ipe needs per-ray radii"
        radii = radii.reshape(n, 1).astype(f32)
    in_specs = [
        ray_spec(3), ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S),
        ray_spec(3),
        *([ray_spec(1)] if ipe else []),
        *[full(w) for w in packed.trunk_w], full(packed.skip_w),
        *[full(b) for b in packed.trunk_b],
        full(packed.sf_w), full(packed.sf_b), full(packed.view_w),
        full(packed.view_dir_w), full(packed.view_b), full(packed.rgb_w),
        full(packed.rgb_b),
        *[full(w) for w in packedT.trunk_wT],
        full(packedT.feat_wT), full(packedT.view_wT), full(packedT.rgb_wT),
        full(packedT.sigma_w_row),
    ]

    grad_shapes = [
        *[jax.ShapeDtypeStruct(w.shape, f32) for w in packed.trunk_w],
        jax.ShapeDtypeStruct(packed.skip_w.shape, f32),
        jax.ShapeDtypeStruct((depth, W), f32),
        jax.ShapeDtypeStruct((W, F), f32),
        jax.ShapeDtypeStruct((1, F), f32),
        jax.ShapeDtypeStruct((1, W), f32),
        jax.ShapeDtypeStruct((1, 128), f32),
        jax.ShapeDtypeStruct(packed.view_w.shape, f32),
        jax.ShapeDtypeStruct(packed.view_dir_w.shape, f32),
        jax.ShapeDtypeStruct((1, V), f32),
        jax.ShapeDtypeStruct(packed.rgb_w.shape, f32),
        jax.ShapeDtypeStruct((1, 128), f32),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((n, 8), f32),
        jax.ShapeDtypeStruct((n, S), f32),
        *grad_shapes,
    )
    out_specs = (
        ray_spec(8),
        ray_spec(S),
        *[acc_spec(s.shape) for s in grad_shapes],
    )

    if R % halves != 0:
        halves = 1
    loss_scale = 1.0 / (3.0 * n)
    if dist_space == "disparity" and dist_weight != 0.0:
        # s = (g0 - 1/t) / (g0 - g1): pass g0 in the near slot and the
        # disparity-span reciprocal in the inv_span slot (kernel docs)
        g0, g1 = 1.0 / near, 1.0 / far
        dist_a, dist_b, dist_disp = g0, 1.0 / (g0 - g1), True
    else:
        dist_a, dist_b, dist_disp = near, 1.0 / (far - near), False
    kernel = functools.partial(
        _train_kernel, depth, cfg.skip_layer, F, pos_pad, dir_pad, S, R,
        white_bg, loss_scale, halves,
        dist_weight / n, dist_a, dist_b, dist_disp,
        bool(cfg.contract), ipe, cfg.sigma_activation,
    )
    flops_row = 2 * 3 * (
        pos_pad * W + (depth - 1) * W * W + pos_pad * W + W * (F + 128)
        + F * V + dir_pad * V + V * 128
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n // R,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_row * n * S,
            bytes_accessed=n * (4 * 3 * 4 + 3 * S * 4 + 8 * 4),
            transcendentals=n * S * (pos_pad + dir_pad + 4),
        ),
    )(origins, dirs, viewdirs, ts, deltas, gold,
      *([radii] if ipe else []),
      *packed.trunk_w, packed.skip_w, *packed.trunk_b,
      packed.sf_w, packed.sf_b, packed.view_w, packed.view_dir_w,
      packed.view_b, packed.rgb_w, packed.rgb_b,
      *packedT.trunk_wT, packedT.feat_wT, packedT.view_wT, packedT.rgb_wT,
      packedT.sigma_w_row)
    diag = outs[0]
    weights = outs[1][:, :num_samples]  # drop compile-pad intervals
    g = outs[2:]
    return TrainGrads(
        diag=diag,
        weights=weights,
        d_trunk_w=tuple(g[:depth]),
        d_skip_w=g[depth],
        d_trunk_b=g[depth + 1],
        d_feat_w=g[depth + 2],
        d_feat_b=g[depth + 3],
        d_sigma_w_row=g[depth + 4],
        d_sigma_b=g[depth + 5],
        d_view_w=g[depth + 6],
        d_view_dir_w=g[depth + 7],
        d_view_b=g[depth + 8],
        d_rgb_w=g[depth + 9],
        d_rgb_b=g[depth + 10],
    )


def unpack_grads(tg: TrainGrads, params: Params, cfg: ModelConfig) -> Params:
    """Packed-layout gradients -> the standard parameter pytree
    (inverse of fused_render.pack_weights' padding/splitting)."""
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)
    W = cfg.net_width
    F = cfg.feature_width
    depth = cfg.net_depth
    out = {"trunk": []}
    for i, layer in enumerate(params["trunk"]):
        in_dim = layer["w"].shape[0]
        if i == cfg.skip_layer and i > 0:
            gw = jnp.concatenate(
                [tg.d_trunk_w[i][:W], tg.d_skip_w[: in_dim - W]], axis=0
            )
        else:
            gw = tg.d_trunk_w[i][:in_dim]
        out["trunk"].append({"w": gw, "b": tg.d_trunk_b[i]})
    out["sigma"] = {"w": jnp.transpose(tg.d_sigma_w_row),
                    "b": tg.d_sigma_b[0, 0:1]}
    out["feature"] = {"w": tg.d_feat_w, "b": tg.d_feat_b[0]}
    vw = params["view1"]["w"]
    out["view1"] = {
        "w": jnp.concatenate(
            [tg.d_view_w, tg.d_view_dir_w[:vw.shape[0] - F]], axis=0
        ),
        "b": tg.d_view_b[0],
    }
    out["rgb"] = {"w": tg.d_rgb_w[:, :3], "b": tg.d_rgb_b[0, :3]}
    return out
