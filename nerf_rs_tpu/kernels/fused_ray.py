"""The north-star kernel: PE -> MLP -> alpha compositing for WHOLE RAYS
in one Pallas kernel, reading only per-ray inputs.

Per grid step, a block of R rays enters as (R,3) origins/directions +
(R,S) sample distances/deltas; the kernel expands them to the R*S
sample rows IN-REGISTER, evaluates the radiance field, composites each
ray's S samples (exclusive-cumsum transmittance), and writes one
(R, 8) row per ray: [r, g, b, acc, depth, 0, 0, 0]. Per-sample data
never exists in HBM at all — this removes the flat (N*S, 3) copies
whose 128-lane padding (42x expansion) made the per-sample kernel
wrapper slower than XLA end-to-end (docs/PERFORMANCE.md).

Round-3 rebuild on the Mosaic facts probed for the TRAIN kernel
(kernels/fused_train.py:16-24, each measured on real v5e):
  * per-sample expansion is a FREE relayout:
      pts = (o[:,None,:] + ts[:,:,None] * d[:,None,:]).reshape(rows, 3)
    (leading-dim merges/splits with the minor dim intact are supported)
    — the round-2 kernel burned MXU cycles expanding via (rows, R)
    selector matmuls, which capped it at ~62 TFLOP/s.
  * (rows,1) -> (R,S) relayouts are supported, so sigma moves to (R,S)
    with a reshape and the ENTIRE compositing runs in (R,S) space:
    no per-row collapse, no selectors anywhere in this kernel.
  * no cumsum lowering -> the exclusive prefix sum is one
    HIGHEST-precision strict-upper-triangular (R,S)@(S,S) matmul.

Replaces the reference's predict-then-composite render entry
(model::predict, /root/reference/src/model.rs:152-209) with a single
fused native program per frame chunk (BASELINE north star).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .fused_render import PackedWeights, _pe_encode, enc_dims


def _ray_kernel(
    depth: int,
    skip_layer: int,
    feature_width: int,
    pos_pad: int,
    dir_pad: int,
    S: int,
    R: int,
    sigma_act: str,
    ipe: bool,  # mip-NeRF IPE: ts are interval MIDS, deltas exact
    # lengths, and a per-ray radii ref follows deltas (fused_train.py's
    # scheme) — Gaussian moments + damped encoding in-register
    contract: bool,  # mip-NeRF 360 scene contraction applied to the
    # expanded points / Gaussians before encoding (fused_render.
    # _contract_points/_contract_gaussian — the unbounded-scene mode)
    o_ref,
    d_ref,
    vd_ref,
    ts_ref,
    deltas_ref,
    *refs,
):
    i0 = 0
    radii_ref = None
    if ipe:
        radii_ref = refs[0]
        i0 = 1
    nw = depth
    trunk_w = refs[i0:i0 + nw]
    skip_w = refs[i0 + nw]
    trunk_b = refs[i0 + nw + 1 : i0 + 2 * nw + 1]
    (sf_w, sf_b, view_w, view_dir_w, view_b, rgb_w, rgb_b,
     out_ref, w_out_ref, sigma_out_ref) = refs[i0 + 2 * nw + 1 :]
    bf = jnp.bfloat16
    f32 = jnp.float32
    rows = R * S
    F = feature_width
    hi = jax.lax.Precision.HIGHEST

    # ---- expansion: free relayouts, no selector matmuls ----
    o = o_ref[:]
    d = d_ref[:]
    ts = ts_ref[:]
    deltas = deltas_ref[:]
    if ipe:
        from .fused_render import (
            _contract_gaussian, _ipe_encode, _ipe_expand,
        )

        mean, var = _ipe_expand(o, d, ts, deltas, radii_ref[:], rows)
        if contract:
            mean, var = _contract_gaussian(mean, var)
        x = _ipe_encode(mean, var, pos_pad).astype(bf)  # (rows, P)
    else:
        pts = (o[:, None, :] + ts[:, :, None] * d[:, None, :]
               ).reshape(rows, 3)
        if contract:
            from .fused_render import _contract_points

            pts = _contract_points(pts)
        x = _pe_encode(pts, pos_pad).astype(bf)  # (rows, P)
    dv_ray = _pe_encode(vd_ref[:], dir_pad)  # (R, D) f32
    dv = jnp.broadcast_to(
        dv_ray[:, None, :], (R, S, dir_pad)
    ).reshape(rows, dir_pad).astype(bf)

    # ---- radiance field ----
    h = x
    for i in range(depth):
        acc = jnp.dot(h, trunk_w[i][:], preferred_element_type=f32)
        if i == skip_layer and i > 0:
            acc = acc + jnp.dot(x, skip_w[:], preferred_element_type=f32)
        h = jnp.maximum(acc + trunk_b[i][:], 0.0).astype(bf)

    sf = jnp.dot(h, sf_w[:], preferred_element_type=f32) + sf_b[:]
    sigma_raw_rs = sf[:, F : F + 1].reshape(R, S)  # supported relayout
    feat = sf[:, :F].astype(bf)
    hv = jnp.dot(feat, view_w[:], preferred_element_type=f32)
    hv = hv + jnp.dot(dv, view_dir_w[:], preferred_element_type=f32)
    hv = jnp.maximum(hv + view_b[:], 0.0).astype(bf)
    rgb_raw = jnp.dot(hv, rgb_w[:], preferred_element_type=f32) + rgb_b[:]
    rgb_rs = jax.nn.sigmoid(rgb_raw[:, :3]).reshape(R, S, 3)

    if sigma_act == "relu":
        sigma_rs = jnp.maximum(sigma_raw_rs, 0.0)
    elif sigma_act == "softplus":
        sigma_rs = jnp.logaddexp(sigma_raw_rs, 0.0)
    else:
        sigma_rs = sigma_raw_rs

    # ---- compositing, entirely in (R, S) ----
    a = sigma_rs * deltas
    rs_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cs_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    strict_triu = (rs_i < cs_i).astype(f32)
    excl = jax.lax.dot_general(
        a, strict_triu, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )  # (R, S) exclusive prefix sums of sigma*delta
    trans = jnp.exp(-excl)
    w = trans * (1.0 - jnp.exp(-a))  # (R, S)

    C = jnp.sum(w[:, :, None] * rgb_rs, axis=1)  # (R, 3)
    acc_r = jnp.sum(w, axis=-1, keepdims=True)  # (R, 1)
    depth_r = jnp.sum(w * ts, axis=-1, keepdims=True)  # (R, 1)
    out_ref[:] = jnp.concatenate(
        [C, acc_r, depth_r, jnp.zeros((R, 3), f32)], axis=1
    )
    # per-sample weights/sigma in (R, S) layout — weights feed the
    # hierarchical fine-sampling PDF, sigma feeds diagnostics
    w_out_ref[:] = w
    sigma_out_ref[:] = sigma_rs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "rays_per_block", "interpret"),
)
def fused_ray_render(
    packed: PackedWeights,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    viewdirs: jnp.ndarray,
    ts: jnp.ndarray,
    deltas: jnp.ndarray,
    cfg: ModelConfig,
    num_samples: int,
    rays_per_block: int = 128,
    interpret: bool = False,
    radii: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render N rays fully in-kernel.

    Args: origins/dirs/viewdirs (N, 3); ts/deltas (N, S). N must divide
    by rays_per_block (default 128, the train kernel's tuned R*S
    operating point at S=64). Returns (rgb (N, 3), acc (N,), depth (N,),
    weights (N, S), sigma (N, S)) — white-background compositing stays
    with the caller.

    ``cfg.ipe`` (with ``radii`` (N,)): ts are interval MIDPOINTS,
    deltas exact interval lengths; the damped integrated encoding is
    built in-register (fused_train.py's scheme, forward only).
    """
    n = origins.shape[0]
    S = num_samples
    R = rays_per_block
    assert n % R == 0, (n, R)
    assert ts.shape == (n, S)
    # Mosaic compile guard: pad sublane-unaligned S with zero-length
    # intervals (w == 0 exactly — see fused_train.fused_train_grads's
    # note; the unguarded S=193 union compile ran >6 min vs ~73 s at
    # S=200 on v5e)
    if S % 8 != 0:
        pad = 8 - S % 8
        ts = jnp.concatenate(
            [ts, jnp.broadcast_to(ts[:, -1:], (n, pad))], axis=1)
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((n, pad), deltas.dtype)], axis=1)
        S = S + pad
    ipe = bool(cfg.ipe)
    if ipe:
        assert radii is not None, "cfg.ipe needs per-ray radii"
        radii = radii.reshape(n, 1).astype(jnp.float32)
    grid = (n // R,)
    depth_l = cfg.net_depth
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)
    W = cfg.net_width

    ray_spec = lambda width: pl.BlockSpec(
        (R, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        ray_spec(3), ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S),
        *([ray_spec(1)] if ipe else []),
        *[full(w) for w in packed.trunk_w],
        full(packed.skip_w),
        *[full(b) for b in packed.trunk_b],
        full(packed.sf_w), full(packed.sf_b), full(packed.view_w),
        full(packed.view_dir_w), full(packed.view_b), full(packed.rgb_w),
        full(packed.rgb_b),
    ]
    kernel = functools.partial(
        _ray_kernel, depth_l, cfg.skip_layer, cfg.feature_width,
        pos_pad, dir_pad, S, R, cfg.sigma_activation, ipe,
        bool(cfg.contract),
    )
    F = cfg.feature_width
    V = packed.view_w.shape[1]
    flops_row = 2 * (
        pos_pad * W + (depth_l - 1) * W * W + pos_pad * W
        + W * (F + 128) + F * V + dir_pad * V + V * 128
    )
    out, w_rs, sigma_rs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(ray_spec(8), ray_spec(S), ray_spec(S)),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
            jax.ShapeDtypeStruct((n, S), jnp.float32),
            jax.ShapeDtypeStruct((n, S), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_row * n * S,
            bytes_accessed=n * (3 * 3 * 4 + 2 * S * 4 + (8 + 2 * S) * 4),
            transcendentals=n * S * (pos_pad + dir_pad + 6),
        ),
    )(origins, dirs, viewdirs, ts, deltas,
      *([radii] if ipe else []),
      *packed.trunk_w, packed.skip_w, *packed.trunk_b,
      packed.sf_w, packed.sf_b, packed.view_w, packed.view_dir_w,
      packed.view_b, packed.rgb_w, packed.rgb_b)
    # drop compile-pad intervals (their w is exactly 0)
    return (out[:, :3], out[:, 3], out[:, 4],
            w_rs[:, :num_samples], sigma_rs[:, :num_samples])
