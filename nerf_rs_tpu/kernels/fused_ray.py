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

Mosaic supports neither (R, S) <-> (R*S, 1) reshapes nor gathers, so
every expansion/collapse is an MXU matmul with an iota-built selector:
  * expand per-ray -> per-sample rows:   x_rep = E @ x,
      E[i, j] = 1 iff i // S == j                       (rows, R)
  * per-sample scalar from (R, S):       t = rowsum((E @ ts) * sel),
      sel[i, s] = 1 iff i % S == s                      (rows, S)
  * collapse per-sample -> (R, S):       sd_rs = E^T @ (sd * sel)
  * per-ray exclusive prefix:            excl = sd_rs @ STRICT_TRIU
  * per-ray reduction:                   out = E^T @ payload
All selectors cost <2% of the block's MLP FLOPs.
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
    o_ref,
    d_ref,
    vd_ref,
    ts_ref,
    deltas_ref,
    *refs,
):
    nw = depth
    trunk_w = refs[:nw]
    skip_w = refs[nw]
    trunk_b = refs[nw + 1 : 2 * nw + 1]
    (sf_w, sf_b, view_w, view_dir_w, view_b, rgb_w, rgb_b,
     out_ref, w_out_ref, sigma_out_ref) = refs[2 * nw + 1 :]
    bf = jnp.bfloat16
    f32 = jnp.float32
    rows = R * S
    F = feature_width

    # iota-built selectors
    ray_of_row = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 0) // S
    colR = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    E = (ray_of_row == colR).astype(f32)  # (rows, R)
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 0) % S
    colS = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    sel = (srow == colS).astype(f32)  # (rows, S)

    hi = jax.lax.Precision.HIGHEST

    def expand(x):  # (R, C) -> (rows, C), exact
        return jax.lax.dot_general(
            E, x, (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=f32,
        )

    def scalar_per_row(m):  # (R, S) -> (rows, 1)
        mr = jax.lax.dot_general(
            E, m, (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=f32,
        )  # (rows, S)
        return jnp.sum(mr * sel, axis=1, keepdims=True)

    o_rep = expand(o_ref[:])
    d_rep = expand(d_ref[:])
    vd_rep = expand(vd_ref[:])
    t_flat = scalar_per_row(ts_ref[:])
    delta_flat = scalar_per_row(deltas_ref[:])

    pts = o_rep + t_flat * d_rep  # (rows, 3) f32, exact
    x = _pe_encode(pts, pos_pad).astype(bf)
    dv = _pe_encode(vd_rep, dir_pad).astype(bf)

    h = x
    for i in range(depth):
        acc = jnp.dot(h, trunk_w[i][:], preferred_element_type=f32)
        if i == skip_layer and i > 0:
            acc = acc + jnp.dot(x, skip_w[:], preferred_element_type=f32)
        h = jnp.maximum(acc + trunk_b[i][:], 0.0).astype(bf)

    sf = jnp.dot(h, sf_w[:], preferred_element_type=f32) + sf_b[:]
    sigma_raw = sf[:, F : F + 1]
    feat = sf[:, :F].astype(bf)
    hv = jnp.dot(feat, view_w[:], preferred_element_type=f32)
    hv = hv + jnp.dot(dv, view_dir_w[:], preferred_element_type=f32)
    hv = jnp.maximum(hv + view_b[:], 0.0).astype(bf)
    rgb_raw = jnp.dot(hv, rgb_w[:], preferred_element_type=f32) + rgb_b[:]

    if sigma_act == "relu":
        sigma = jnp.maximum(sigma_raw, 0.0)
    elif sigma_act == "softplus":
        sigma = jnp.logaddexp(sigma_raw, 0.0)
    else:
        sigma = sigma_raw
    rgb = jax.nn.sigmoid(rgb_raw[:, :3])  # (rows, 3)

    # compositing: exclusive per-ray prefix of sigma*delta via a strict
    # upper-triangular matmul in (R, S) space
    sd = sigma * delta_flat  # (rows, 1)
    sd_rs = jax.lax.dot_general(
        E, sd * sel, (((0,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )  # (R, S): E^T @ (sd broadcast on its sample column)
    rs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    strict_triu = (rs < cs).astype(f32)
    excl_rs = jax.lax.dot_general(
        sd_rs, strict_triu, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )  # (R, S) exclusive prefix sums
    excl = scalar_per_row(excl_rs)  # back to (rows, 1)

    trans = jnp.exp(-excl)
    alpha = 1.0 - jnp.exp(-sd)
    w = trans * alpha  # (rows, 1)

    ones = jnp.ones_like(w)
    zeros = jnp.zeros((rows, 3), f32)
    payload = jnp.concatenate(
        [rgb * w, w * ones, w * t_flat, zeros], axis=1
    )  # (rows, 8): [wr, wg, wb, w(acc), w*t(depth), 0,0,0]
    out = jax.lax.dot_general(
        E, payload, (((0,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )  # (R, 8) per-ray sums
    out_ref[:] = out
    # per-sample weights/sigma in (R, S) layout — weights feed the
    # hierarchical fine-sampling PDF, sigma feeds diagnostics
    w_out_ref[:] = jax.lax.dot_general(
        E, w * sel, (((0,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )
    sigma_out_ref[:] = jax.lax.dot_general(
        E, sigma * sel, (((0,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32,
    )


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
    rays_per_block: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render N rays fully in-kernel.

    Args: origins/dirs/viewdirs (N, 3); ts/deltas (N, S). N must divide
    by rays_per_block (32 measured fastest on v5e: 57 TFLOP/s / 50M
    samples/s; 16 and 64 are slower). Returns (rgb (N, 3), acc (N,),
    depth (N,), weights (N, S), sigma (N, S)) — white-background
    compositing stays with the caller.
    """
    n = origins.shape[0]
    S = num_samples
    R = rays_per_block
    assert n % R == 0, (n, R)
    assert ts.shape == (n, S)
    grid = (n // R,)
    depth_l = cfg.net_depth
    pos, pos_pad, dird, dir_pad = enc_dims(cfg)

    ray_spec = lambda width: pl.BlockSpec(
        (R, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        ray_spec(3), ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S),
        *[full(w) for w in packed.trunk_w],
        full(packed.skip_w),
        *[full(b) for b in packed.trunk_b],
        full(packed.sf_w), full(packed.sf_b), full(packed.view_w),
        full(packed.view_dir_w), full(packed.view_b), full(packed.rgb_w),
        full(packed.rgb_b),
    ]
    kernel = functools.partial(
        _ray_kernel, depth_l, cfg.skip_layer, cfg.feature_width,
        pos_pad, dir_pad, S, R, cfg.sigma_activation,
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
    )(origins, dirs, viewdirs, ts, deltas,
      *packed.trunk_w, packed.skip_w, *packed.trunk_b,
      packed.sf_w, packed.sf_b, packed.view_w, packed.view_dir_w,
      packed.view_b, packed.rgb_w, packed.rgb_b)
    return out[:, :3], out[:, 3], out[:, 4], w_rs, sigma_rs
