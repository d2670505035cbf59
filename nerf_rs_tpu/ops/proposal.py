"""Proposal-guided sampling + interlevel histogram loss (mip-NeRF 360
lineage, a capability beyond the reference — the reference's only
sampling is uniform-random t (src/ray_sampling.rs:96-142)).

Flow: uniform stratified ts -> tiny proposal MLP -> compositing
weights -> stratified inverse-CDF resample (ops/sampling.sample_pdf,
sorted by construction) -> the main NeRF evaluates ONLY the resampled
points. The proposal is trained with the interlevel bound loss: its
weight histogram must upper-bound the main network's, measured on
every main-sample interval.

TPU notes: the interval-overlap "outer" measure is one broadcast
compare + masked sum over a (rays, F, P) mask — the same gather-free
pattern as sample_pdf; no searchsorted, no sort, no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, ProposalConfig
from ..models.proposal import apply_proposal
from . import sampling


def edges_from_ts(ts: jnp.ndarray) -> jnp.ndarray:
    """Histogram edges for sample distances: (..., S) -> (..., S+1),
    [t_0, midpoints, t_last] — the same construction hierarchical
    sampling uses for its PDF bins."""
    mids = 0.5 * (ts[..., 1:] + ts[..., :-1])
    return jnp.concatenate([ts[..., :1], mids, ts[..., -1:]], axis=-1)


def weights_from_sigma(sigma: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights w_i = T_i * (1 - exp(-sigma_i delta_i)) with
    O(S) exclusive-cumsum transmittance (ops/render.composite without
    the color reduction — the proposal has no colors)."""
    sd = sigma * deltas
    excl = jnp.cumsum(sd, axis=-1) - sd
    return jnp.exp(-excl) * (1.0 - jnp.exp(-sd))


def proposal_weights(
    prop_params, origins, dirs, ts_p, pcfg: ProposalConfig, far: float,
    dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(weights (..., P), edges (..., P+1)) of the proposal histogram
    along each ray — differentiable w.r.t. prop_params."""
    pts = sampling.points_from_ts(origins, dirs, ts_p)
    sigma_p = apply_proposal(prop_params, pts, pcfg, dtype)
    deltas = sampling.deltas_from_ts(ts_p, far)
    return weights_from_sigma(sigma_p, deltas), edges_from_ts(ts_p)


def proposal_resample(
    key: jax.Array,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    prop_params,
    pcfg: ProposalConfig,
    num_main_samples: int,
    camera: CameraConfig,
    randomized: bool,
    dtype=None,
    anneal=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Main-network sample distances guided by the proposal:
    (ts_main (..., F) sorted, prop edges (..., P+1), prop weights
    (..., P)). The draw stop-grads the weights (sampling positions are
    not a gradient path; the interlevel loss is). ``anneal`` (scalar in
    (0, 1], mip-NeRF 360) exponentiates the RESAMPLING weights only —
    the interlevel loss still sees the raw histogram."""
    kp, km = jax.random.split(key)
    n = origins.shape[0]
    ts_p = sampling.stratified_ts(
        kp, n, pcfg.num_samples, camera.near, camera.far, randomized
    )
    w_p, bins_p = proposal_weights(
        prop_params, origins, dirs, ts_p, pcfg, camera.far, dtype
    )
    w_draw = jax.lax.stop_gradient(w_p)
    if anneal is not None:
        w_draw = jnp.power(jnp.maximum(w_draw, 1e-7), anneal)
    ts_m = sampling.sample_pdf(km, bins_p, w_draw, num_main_samples,
                               randomized)
    return ts_m, bins_p, w_p


def interlevel_loss(
    main_edges: jnp.ndarray,  # (..., F+1)
    w_main: jnp.ndarray,  # (..., F) main-network compositing weights
    prop_edges: jnp.ndarray,  # (..., P+1)
    w_prop: jnp.ndarray,  # (..., P) proposal weights (grads flow here)
    eps: float = 1e-3,
) -> jnp.ndarray:
    """mip-NeRF 360 proposal loss: penalize main-histogram mass the
    proposal envelope fails to cover.

    For each main interval i, the bound is the total proposal weight
    whose interval OVERLAPS it; loss = mean_rays sum_i
    max(0, w_main_i - bound_i)^2 / (w_main_i + eps). The main histogram
    is stop-gradded — this trains the proposal toward the main network,
    never the reverse.
    """
    w_main = jax.lax.stop_gradient(w_main)
    lo_m, hi_m = main_edges[..., :-1], main_edges[..., 1:]
    lo_p, hi_p = prop_edges[..., :-1], prop_edges[..., 1:]
    # (..., F, P) interval-overlap mask, then a masked sum over P — one
    # broadcast compare, no searchsorted/gather (see module docstring)
    overlap = (lo_p[..., None, :] < hi_m[..., :, None]) & (
        hi_p[..., None, :] > lo_m[..., :, None]
    )
    bound = jnp.sum(jnp.where(overlap, w_prop[..., None, :], 0.0), axis=-1)
    excess = jnp.maximum(0.0, w_main - bound)
    return jnp.mean(jnp.sum(excess**2 / (w_main + eps), axis=-1))
