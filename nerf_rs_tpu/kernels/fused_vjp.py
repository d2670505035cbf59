"""Fused training path: custom-VJP around the fused field kernel.

Forward reuses kernels/fused_render._fused_kernel (PE -> trunk ->
heads in VMEM). Backward is a second Pallas kernel that RECOMPUTES the
forward activations per ray-block (flash-style — nothing is stored to
HBM between fwd and bwd except the inputs themselves) and accumulates
weight/bias gradients across grid steps in f32 VMEM accumulators,
exploiting the TPU grid's sequential execution: every grid step maps
the dW outputs to the same block, zero-initializes at step 0, and adds
its block contribution.

Input gradients are not needed (sample points come from the sampler,
view directions from the camera — neither is trained), so the backward
is dW/db only: 1x forward recompute + the dW/dx matmul chain,
~3x forward FLOPs total, with zero activation HBM traffic.

Gradient cotangents are returned in the packed weights' dtype (bf16),
matching the XLA autodiff path (whose backward matmuls also emit bf16
under mixed precision); pack_weights' VJP upcasts to the f32 master
params.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .fused_render import PackedWeights, _pe_encode, enc_dims


def _dotT_ab(a, b):
    """a (M, K) x b (M, N) -> (K, N): contract the ROW axis (dW-style)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_bT(a, w):
    """a (M, N) x w (K, N) -> (M, K): contract the LANE axis (dx-style)."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(
    depth: int,
    skip_layer: int,
    feature_width: int,
    pos_pad: int,
    dir_pad: int,
    pts_ref,
    dirs_ref,
    dsigma_ref,
    drgb_ref,
    *refs,
):
    nw = depth
    trunk_w = refs[:nw]
    skip_w = refs[nw]
    trunk_b = refs[nw + 1 : 2 * nw + 1]
    sf_w, sf_b, view_w, view_dir_w, view_b, rgb_w, rgb_b = refs[
        2 * nw + 1 : 2 * nw + 8
    ]
    # outputs keep the out_shape pytree structure: the two tuples arrive
    # as tuples of refs, not flattened
    (d_trunk_w, d_skip_w, d_trunk_b, d_sf_w, d_sf_b, d_view_w,
     d_view_dir_w, d_view_b, d_rgb_w, d_rgb_b) = refs[2 * nw + 8 :]

    bf = jnp.bfloat16
    f32 = jnp.float32
    F = feature_width

    # ---- forward recompute, keeping activations in VMEM ----
    x = _pe_encode(pts_ref[:], pos_pad).astype(bf)
    d = _pe_encode(dirs_ref[:], dir_pad).astype(bf)
    hs = []
    h = x
    for i in range(depth):
        acc = jnp.dot(h, trunk_w[i][:], preferred_element_type=f32)
        if i == skip_layer and i > 0:
            acc = acc + jnp.dot(x, skip_w[:], preferred_element_type=f32)
        h = jnp.maximum(acc + trunk_b[i][:], 0.0).astype(bf)
        hs.append(h)
    sf = jnp.dot(hs[-1], sf_w[:], preferred_element_type=f32) + sf_b[:]
    feat = sf[:, :F].astype(bf)
    hv_pre = (
        jnp.dot(feat, view_w[:], preferred_element_type=f32)
        + jnp.dot(d, view_dir_w[:], preferred_element_type=f32)
        + view_b[:]
    )
    hv = jnp.maximum(hv_pre, 0.0).astype(bf)

    # ---- backward ----
    is_first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    drgb = drgb_ref[:].astype(bf)  # (R, 128), cols 0:4 live
    accum(d_rgb_w, _dotT_ab(hv, drgb))
    accum(d_rgb_b, jnp.sum(drgb.astype(f32), axis=0, keepdims=True))

    dhv = _dot_bT(drgb, rgb_w[:])  # (R, V) f32
    dhv = jnp.where(hv_pre > 0.0, dhv, 0.0).astype(bf)
    accum(d_view_w, _dotT_ab(feat, dhv))
    accum(d_view_dir_w, _dotT_ab(d, dhv))
    accum(d_view_b, jnp.sum(dhv.astype(f32), axis=0, keepdims=True))

    dfeat = _dot_bT(dhv, view_w[:])  # (R, F) f32
    # dsf: cols 0:F = dfeat, col F = dsigma, rest 0  (sf head layout)
    dsigma = dsigma_ref[:]  # (R, 1) f32
    pad_cols = sf_w.shape[1] - F - 1
    dsf = jnp.concatenate(
        [dfeat, dsigma, jnp.zeros((dfeat.shape[0], pad_cols), f32)], axis=1
    ).astype(bf)
    accum(d_sf_w, _dotT_ab(hs[-1], dsf))
    accum(d_sf_b, jnp.sum(dsf.astype(f32), axis=0, keepdims=True))

    dh = _dot_bT(dsf, sf_w[:])  # (R, W) f32
    for i in range(depth - 1, -1, -1):
        # relu mask via the stored post-activation (h > 0 <=> pre > 0);
        # compare in f32 — Mosaic has no bf16 vector compare
        dpre = jnp.where(hs[i].astype(f32) > 0.0, dh, 0.0).astype(bf)
        h_in = hs[i - 1] if i > 0 else x
        accum(d_trunk_w[i], _dotT_ab(h_in, dpre))
        accum(d_trunk_b[i], jnp.sum(dpre.astype(f32), axis=0, keepdims=True))
        if i == skip_layer and i > 0:
            accum(d_skip_w, _dotT_ab(x, dpre))
        if i > 0:
            dh = _dot_bT(dpre, trunk_w[i][:])
    @pl.when(is_first)
    def _():
        if skip_layer <= 0 or skip_layer >= depth:
            d_skip_w[:] = jnp.zeros_like(d_skip_w)


def _grad_shapes(packed: PackedWeights):
    f32 = jnp.float32
    shape = lambda a: jax.ShapeDtypeStruct(a.shape, f32)
    return (
        tuple(shape(w) for w in packed.trunk_w),
        shape(packed.skip_w),
        tuple(shape(b) for b in packed.trunk_b),
        shape(packed.sf_w),
        shape(packed.sf_b),
        shape(packed.view_w),
        shape(packed.view_dir_w),
        shape(packed.view_b),
        shape(packed.rgb_w),
        shape(packed.rgb_b),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "rows_per_block", "interpret")
)
def _fused_bwd(
    packed: PackedWeights,
    points: jnp.ndarray,
    viewdirs: jnp.ndarray,
    dsigma: jnp.ndarray,
    drgb4: jnp.ndarray,
    cfg: ModelConfig,
    rows_per_block: int = 512,
    interpret: bool = False,
):
    n = points.shape[0]
    assert n % rows_per_block == 0
    grid = (n // rows_per_block,)
    depth = cfg.net_depth
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)

    row_spec = lambda width: pl.BlockSpec(
        (rows_per_block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    # drgb arrives padded to 128 lanes so relu'd matmuls stay aligned
    in_specs = [
        row_spec(3), row_spec(3), row_spec(1), row_spec(128),
        *[full(w) for w in packed.trunk_w],
        full(packed.skip_w),
        *[full(b) for b in packed.trunk_b],
        full(packed.sf_w), full(packed.sf_b), full(packed.view_w),
        full(packed.view_dir_w), full(packed.view_b), full(packed.rgb_w),
        full(packed.rgb_b),
    ]
    out_shape = _grad_shapes(packed)
    out_specs = jax.tree_util.tree_map(full, out_shape)

    kernel = functools.partial(
        _bwd_kernel, depth, cfg.skip_layer, cfg.feature_width, pos_pad, dir_pad
    )
    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(points, viewdirs, dsigma, drgb4,
      *packed.trunk_w, packed.skip_w, *packed.trunk_b,
      packed.sf_w, packed.sf_b, packed.view_w, packed.view_dir_w,
      packed.view_b, packed.rgb_w, packed.rgb_b)
    return grads


def make_fused_field_fn(cfg: ModelConfig, rows_per_block: int = 1024,
                        interpret: bool = False):
    """Returns fn(packed, points, viewdirs) -> (sigma_raw (N,), rgb_raw
    (N, 3)) differentiable w.r.t. ``packed`` via the Pallas backward.

    N must be a multiple of 1024 (the forward block size).
    """
    from .fused_render import fused_mlp_apply

    @jax.custom_vjp
    def field(packed, points, viewdirs):
        return fused_mlp_apply(
            packed, points, viewdirs, cfg,
            rows_per_block=rows_per_block, interpret=interpret,
        )

    def fwd(packed, points, viewdirs):
        out = field(packed, points, viewdirs)
        return out, (packed, points, viewdirs)

    def bwd(res, cts):
        packed, points, viewdirs = res
        dsigma, drgb = cts
        n = points.shape[0]
        dsigma = jnp.nan_to_num(dsigma).reshape(n, 1)
        drgb = jnp.pad(jnp.nan_to_num(drgb), ((0, 0), (0, 125)))
        g = _fused_bwd(
            packed, points, viewdirs, dsigma, drgb, cfg,
            rows_per_block=512, interpret=interpret,
        )
        (d_trunk_w, d_skip_w, d_trunk_b, d_sf_w, d_sf_b, d_view_w,
         d_view_dir_w, d_view_b, d_rgb_w, d_rgb_b) = g
        cast = lambda val, like: val.astype(like.dtype)
        dpacked = PackedWeights(
            trunk_w=tuple(cast(v, w) for v, w in zip(d_trunk_w, packed.trunk_w)),
            skip_w=cast(d_skip_w, packed.skip_w),
            trunk_b=tuple(cast(v, b) for v, b in zip(d_trunk_b, packed.trunk_b)),
            sf_w=cast(d_sf_w, packed.sf_w),
            sf_b=cast(d_sf_b, packed.sf_b),
            view_w=cast(d_view_w, packed.view_w),
            view_dir_w=cast(d_view_dir_w, packed.view_dir_w),
            view_b=cast(d_view_b, packed.view_b),
            rgb_w=cast(d_rgb_w, packed.rgb_w),
            rgb_b=cast(d_rgb_b, packed.rgb_b),
        )
        return dpacked, None, None

    field.defvjp(fwd, bwd)
    return field
