"""Jitted training step: value_and_grad over the renderer + optax Adam.

TPU-native replacement for the reference's Trainer (src/model.rs:301-346):
MSE loss (mse_loss, src/model.rs:296-299), Adam at lr 5e-4
(src/model.rs:306-309), one fused XLA program per step. Gradient
accumulation — dead code in the reference (grad_accumulation_step,
src/model.rs:327-336) — is a real option here, folded into the same
jitted step via lax.scan over micro-batches. Data-parallel gradient
psum lives in parallel/dp.py; this module is the single-device core it
wraps.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.mlp import Params, init_nerf_params
from ..ops import render


class TrainState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    params: Params
    # the second trainable network: the separate fine MLP (hierarchical
    # paper scheme), or the tiny proposal MLP when cfg.proposal.enabled
    # (models/proposal.py) — the two are mutually exclusive by config.
    fine_params: Optional[Params]
    opt_state: Any
    # occupancy grid (ops/occupancy.py) when cfg.render.occ_res > 0:
    # (res, res, res) f32 EMA'd densities, updated OUTSIDE the train
    # step every occ_update_steps and checkpointed with the state.
    grid: Optional[jnp.ndarray] = None
    # exponential moving average of the TRAINABLE pytree (params, or
    # (params, fine_params) when a second net exists) when
    # cfg.train.ema_decay > 0; eval/render swap it in via
    # with_ema_params. None when EMA is off.
    ema: Optional[Any] = None


class Batch(NamedTuple):
    """One training batch of rays (device-ready, produced by data/)."""

    origins: jnp.ndarray  # (N, 3)
    dirs: jnp.ndarray  # (N, 3)
    gold: jnp.ndarray  # (N, 3) or (N, 4) target pixels
    # flat pixel index view*H*W + y*W + x of each ray, for the
    # highest-error resampling buffer (BASELINE config 5); None when
    # error resampling is off.
    idx: Optional[jnp.ndarray] = None
    # per-ray cone base radius at unit distance (multiscale training,
    # DataConfig.multiscale_levels): consumed by the --ipe interval path,
    # ignored by point-sampled models. None = single-scale (the camera's
    # pixel_radius).
    radii: Optional[jnp.ndarray] = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.lr_decay_steps > 0:
        sched = optax.exponential_decay(
            t.learning_rate,
            t.lr_decay_steps,
            t.lr_final / t.learning_rate,
        )
    else:
        sched = t.learning_rate  # constant, like the reference
    return optax.adam(sched)


def _has_fine_net(cfg: Config) -> bool:
    """Separate fine MLP (paper scheme); share_network reuses the
    coarse MLP for both hierarchical passes (fast fine pass in
    ops/render.render_rays)."""
    return cfg.render.num_fine_samples > 0 and not cfg.render.share_network


def _has_prop(cfg: Config) -> bool:
    return cfg.proposal.enabled


def _two_nets(cfg: Config) -> bool:
    """TrainState.fine_params is populated (fine MLP or proposal MLP)."""
    return _has_fine_net(cfg) or _has_prop(cfg)


def init_state(key: jax.Array, cfg: Config) -> TrainState:
    kc, kf = jax.random.split(key)
    params = init_nerf_params(kc, cfg.model)
    if _has_prop(cfg):
        assert cfg.render.num_fine_samples == 0, (
            "proposal sampling IS the hierarchy; set num_fine_samples=0"
        )
        assert not cfg.model.compat, "proposal needs the paper model"
        from ..models.proposal import init_proposal_params

        fine_params = init_proposal_params(kf, cfg.proposal)
    else:
        fine_params = (
            init_nerf_params(kf, cfg.model) if _has_fine_net(cfg) else None
        )
    opt = make_optimizer(cfg)
    trainable = (params, fine_params) if fine_params is not None else params
    opt_state = opt.init(trainable)
    grid = None
    if cfg.render.occ_res > 0:
        from ..ops import occupancy

        grid = occupancy.init_grid(cfg.render.occ_res)
    ema = None
    if cfg.train.ema_decay > 0.0:
        # initialized to the weights themselves (no cold-start debias
        # needed; matches common practice when EMA starts at init)
        ema = jax.tree_util.tree_map(jnp.array, trainable)
    return TrainState(
        jnp.zeros((), jnp.int32), params, fine_params, opt_state, grid, ema
    )


def _matmul_dtype(cfg: Config):
    p = cfg.train.precision
    if p in ("bf16", "mixed"):
        return jnp.bfloat16
    return None


def _kernel_interpret(cfg: Config) -> bool:
    """Pallas interpret mode: explicit override, else auto by backend.
    The override matters when a TPU backend is registered but the
    program targets a CPU mesh (hermetic multichip dryrun)."""
    if cfg.train.kernel_interpret is not None:
        return cfg.train.kernel_interpret
    from ..kernels.fused_render import default_is_tpu

    return not default_is_tpu()  # Mosaic only targets TPU


def _prop_anneal(cfg: Config, step):
    """mip-NeRF 360 annealing exponent for the proposal resampling
    weights: bias(train_frac, slope) ramps 0 -> 1 over
    proposal.anneal_steps, so early training samples near-uniformly
    (the proposal histogram is garbage then) and sharpens as the
    proposal learns. 1.0 when off (anneal_steps == 0) or no step."""
    a = cfg.proposal.anneal_steps
    if a <= 0 or step is None:
        return None
    x = jnp.clip(step.astype(jnp.float32) / a, 0.0, 1.0)
    s = cfg.proposal.anneal_slope
    return s * x / ((s - 1.0) * x + 1.0)


def _reg_loss(params, cfg: Config) -> jnp.ndarray:
    """Architecture-specific parameter regularizers folded into the
    photometric loss. Factored family: TensoRF-style L1 on the line
    tables (cfg.model.fac_l1) — suppresses the CP axis-streak fog that
    costs SSIM on white-background scenes."""
    if cfg.model.arch == "factored" and cfg.model.fac_l1 > 0.0:
        return cfg.model.fac_l1 * jnp.mean(jnp.abs(params["lines"]))
    return jnp.float32(0.0)


def loss_fn(
    trainable,
    batch: Batch,
    key: jax.Array,
    cfg: Config,
    grid: Optional[jnp.ndarray] = None,
    step=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MSE of composited colors vs gold pixels; with hierarchical
    sampling, coarse and fine losses are summed (paper eq. 6); with
    proposal sampling, photometric + interlevel (_proposal_loss)."""
    if _has_prop(cfg):
        params, prop_params = trainable
        return _proposal_loss(params, prop_params, batch, key, cfg,
                              step=step)
    if _has_fine_net(cfg):
        params, fine_params = trainable
    else:
        params, fine_params = trainable, None
    coarse, fine = render.render_rays(
        params,
        batch.origins,
        batch.dirs,
        key,
        cfg.model,
        cfg.render,
        cfg.camera,
        fine_params=fine_params,
        dtype=_matmul_dtype(cfg),
        grid=grid,
        radii=batch.radii,
    )
    gold_rgb = batch.gold[..., :3]
    loss_c = render.mse(coarse.rgb[..., :3], gold_rgb)
    loss = loss_c + _reg_loss(params, cfg)
    aux = {"loss_coarse": loss_c}
    if fine is not None:
        loss_f = render.mse(fine.rgb[..., :3], gold_rgb)
        loss = loss + loss_f
        aux["loss_fine"] = loss_f
        aux["psnr"] = render.psnr_from_mse(loss_f)
        finest = fine
    else:
        aux["psnr"] = render.psnr_from_mse(loss_c)
        finest = coarse
    if cfg.train.distortion_weight > 0.0:
        loss_d = render.distortion_loss(
            finest.weights, finest.ts, cfg.camera.near, cfg.camera.far,
            space=cfg.render.sampling_space,
            deltas=finest.deltas,  # IPE: exact interval lengths
        )
        loss = loss + cfg.train.distortion_weight * loss_d
        aux["loss_dist"] = loss_d
    aux["loss"] = loss
    # per-ray error (stop-grad): drives highest-error resampling
    aux["ray_err"] = jax.lax.stop_gradient(
        jnp.mean((finest.rgb[..., :3] - gold_rgb) ** 2, axis=-1)
    )
    return loss, aux


def _proposal_loss(
    params: Params,
    prop_params: Params,
    batch: Batch,
    key: jax.Array,
    cfg: Config,
    main_weights_fn=None,
    step=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Photometric loss on proposal-guided samples + interlevel bound
    loss training the proposal (ops/proposal.py; mip-NeRF 360 scheme).

    ``main_weights_fn(ts) -> (rgb, weights)`` overrides the main pass —
    the fused whole-ray path injects its kernel here; default is the
    plain XLA field + composite."""
    from ..ops import proposal as prop_ops, sampling

    dtype = _matmul_dtype(cfg)
    kn = jax.random.fold_in(key, 11)
    ts_m, hists = prop_ops.proposal_resample(
        key, batch.origins, batch.dirs, prop_params, cfg.proposal,
        cfg.render.num_samples, cfg.camera, cfg.render.randomized, dtype,
        anneal=_prop_anneal(cfg, step), space=cfg.render.sampling_space,
        contract=cfg.model.contract,
    )
    gold_rgb = batch.gold[..., :3]
    if main_weights_fn is None:
        from ..models.mlp import apply_nerf

        pts = sampling.points_from_ts(batch.origins, batch.dirs, ts_m)
        vd = batch.dirs / jnp.linalg.norm(
            batch.dirs, axis=-1, keepdims=True
        )
        noise_std = cfg.render.raw_noise_std if cfg.render.randomized else 0.0
        sigma, rgb = apply_nerf(
            params, pts, vd[..., None, :], cfg.model, dtype,
            noise_std=noise_std, noise_key=kn,
        )
        out = render.composite(
            sigma, rgb[..., :3], sampling.deltas_from_ts(ts_m, cfg.camera.far),
            white_background=cfg.render.white_background, ts=ts_m,
        )
        rgb_m, w_m = out.rgb, out.weights
    else:
        rgb_m, w_m = main_weights_fn(ts_m)
    loss_photo = render.mse(rgb_m[..., :3], gold_rgb)
    loss_il = prop_ops.multi_interlevel_loss(
        prop_ops.edges_from_ts(ts_m), w_m, hists
    )
    loss = (loss_photo + cfg.proposal.loss_mult * loss_il
            + _reg_loss(params, cfg))
    aux = {
        "loss": loss,
        "loss_coarse": loss_photo,
        "loss_prop": loss_il,
        "psnr": render.psnr_from_mse(loss_photo),
        "ray_err": jax.lax.stop_gradient(
            jnp.mean((rgb_m[..., :3] - gold_rgb) ** 2, axis=-1)
        ),
    }
    if cfg.train.distortion_weight > 0.0:
        loss_d = render.distortion_loss(
            w_m, ts_m, cfg.camera.near, cfg.camera.far,
            space=cfg.render.sampling_space,
        )
        loss = loss + cfg.train.distortion_weight * loss_d
        aux["loss_dist"] = loss_d
        aux["loss"] = loss
    return loss, aux


def _whole_ray_proposal_grads(
    trainable, batch: Batch, key: jax.Array, cfg: Config, step=None,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Proposal-guided training through the fused kernel: tiny proposal
    MLP in XLA picks the samples, ONE kernel launch computes the main
    network's gradients on them, and the proposal's gradients come from
    the interlevel loss alone (vjp through its forward — the kernel's
    weights are values, exactly the stop-grad mip-NeRF 360 wants)."""
    from ..ops import proposal as prop_ops, render as render_ops, sampling

    params, prop_params = trainable
    dtype = _matmul_dtype(cfg)
    n = batch.origins.shape[0]
    pcfg = cfg.proposal
    anneal = _prop_anneal(cfg, step)
    # key schedule MUST match ops/proposal.proposal_resample exactly —
    # test_whole_ray_proposal_grads_match_xla asserts this path and the
    # XLA path draw identical samples from the same key
    keys = jax.random.split(key, pcfg.num_levels + 1)

    def hists_fn(pp):
        """All proposal-level histograms — the one function whose vjp
        carries every gradient the proposal receives (draw positions
        are stop-gradded per mip-NeRF 360, so nothing leaks around it).
        """
        ts = sampling.stratified_ts(
            keys[0], n, pcfg.num_samples, cfg.camera.near,
            cfg.camera.far, cfg.render.randomized,
            space=cfg.render.sampling_space,
        )
        hists = []
        for lvl in range(pcfg.num_levels):
            w, bins = prop_ops.proposal_weights(
                pp, batch.origins, batch.dirs, ts, pcfg,
                cfg.camera.far, dtype, contract=cfg.model.contract,
            )
            hists.append((w, bins))
            if lvl < pcfg.num_levels - 1:
                ts = sampling.sample_pdf(
                    keys[lvl + 1], bins,
                    prop_ops.anneal_weights(jax.lax.stop_gradient(w),
                                            anneal),
                    pcfg.num_samples, cfg.render.randomized,
                )
        return tuple(hists)

    hists, prop_vjp = jax.vjp(hists_fn, prop_params)
    w_last, bins_last = hists[-1]
    ts_m = sampling.sample_pdf(
        keys[pcfg.num_levels], bins_last,
        prop_ops.anneal_weights(jax.lax.stop_gradient(w_last), anneal),
        cfg.render.num_samples, cfg.render.randomized,
    )
    vd = batch.dirs / jnp.linalg.norm(batch.dirs, axis=-1, keepdims=True)
    dist_w = cfg.train.distortion_weight
    grads_m, tg = _whole_ray_pass(params, batch, vd, ts_m, cfg,
                                  dist=dist_w > 0.0)
    loss_photo = jnp.mean(tg.diag[:, 4])

    main_edges = prop_ops.edges_from_ts(ts_m)
    loss_il, dws = jax.value_and_grad(
        lambda ws: prop_ops.multi_interlevel_loss(
            main_edges, tg.weights,
            [(bins, w) for w, (_, bins) in zip(ws, hists)],
        )
    )(tuple(w for w, _ in hists))
    (grads_p,) = prop_vjp(tuple(
        (cfg.proposal.loss_mult * dw, jnp.zeros_like(bins))
        for dw, (_, bins) in zip(dws, hists)
    ))
    aux = {
        "loss": loss_photo + cfg.proposal.loss_mult * loss_il,
        "loss_coarse": loss_photo,
        "loss_prop": loss_il,
        "psnr": render_ops.psnr_from_mse(loss_photo),
        "ray_err": jax.lax.stop_gradient(tg.diag[:, 4]),
    }
    if dist_w > 0.0:
        loss_d = jnp.mean(tg.diag[:, 5])
        aux["loss_dist"] = loss_d
        aux["loss"] = aux["loss"] + dist_w * loss_d
    return (grads_m, grads_p), aux


def whole_ray_supported(cfg: Config) -> bool:
    """The fused whole-ray train kernel covers the paper-architecture
    configs, coarse-only AND hierarchical (as a coarse-kernel -> XLA
    PDF-resample -> fine-kernel chain), including proposal-guided
    sampling (proposal in XLA, main pass in-kernel) and mip-NeRF IPE
    (interval moments + damped encoding in-register). Compat and
    sigma-noise configs fall back to XLA autodiff."""
    from ..ops.render import train_fused_supported

    return (
        cfg.use_whole_ray_train
        and train_fused_supported(cfg.model)
        and cfg.render.raw_noise_std == 0.0
        and not cfg.render.compat_density_color
        and cfg.train.accumulation_steps <= 1
        # the IPE kernel path covers stratified AND occ-guided interval
        # sampling plus standalone/union fine (merged edges); the
        # in-kernel distortion loss covers BOTH s-normalizations
        # (linear over [near, far] and disparity — the unbounded
        # recipe's space), so disparity+distortion rides the kernel too
    )


def _whole_ray_pass(
    params: Params, batch: Batch, vd: jnp.ndarray, ts: jnp.ndarray,
    cfg: Config, dist: bool = False, deltas: jnp.ndarray = None,
    radii: jnp.ndarray = None,
):
    """One fused fwd+bwd kernel launch over ``ts`` samples; returns
    (grads pytree, TrainGrads). ``dist`` applies the distortion loss
    in-kernel (set on the FINEST pass only, matching loss_fn).
    IPE configs pass interval midpoints as ``ts`` with explicit
    ``deltas`` (exact interval lengths) and per-ray ``radii``."""
    from ..kernels.fused_render import pack_weights
    from ..kernels.fused_train import (
        fused_train_grads, pack_weights_t, unpack_grads,
    )
    from ..ops import sampling

    n = batch.origins.shape[0]
    S = ts.shape[-1]
    if deltas is None:
        deltas = sampling.deltas_from_ts(ts, cfg.camera.far)
    pk = pack_weights(params, cfg.model)
    pkT = pack_weights_t(pk, cfg.model)
    # keep VMEM-resident activations bounded: scale the ray block so
    # rows-per-block (R*S) stays at the tuned S=64 operating point
    rays_per_block = max(1, (cfg.train.whole_ray_block * 64) // S)
    rays_per_block = 1 << (rays_per_block.bit_length() - 1)  # floor pow2
    # merged-interval passes (S > 128, e.g. union's S + S_f + 1): halve
    # the block to rows <= 4096 — Mosaic compile time scales savagely
    # with rows at these S (61 s at rows=3200 vs 324-702 s at 6400,
    # probed round 5 on v5e) while the step cost moves < 3%
    if S > 128:
        while rays_per_block > 1 and rays_per_block * S > 4096:
            rays_per_block //= 2
    while n % rays_per_block != 0 and rays_per_block > 1:
        rays_per_block //= 2  # batch must divide into whole blocks
    tg = fused_train_grads(
        pk, pkT, batch.origins, batch.dirs, vd, ts, deltas,
        batch.gold[..., :3], cfg.model, S,
        white_bg=cfg.render.white_background,
        rays_per_block=rays_per_block,
        interpret=_kernel_interpret(cfg),
        halves=cfg.train.whole_ray_halves,
        dist_weight=cfg.train.distortion_weight if dist else 0.0,
        near=cfg.camera.near,
        far=cfg.camera.far,
        dist_space=cfg.render.sampling_space,
        radii=radii,
    )
    return unpack_grads(tg, params, cfg.model), tg


def whole_ray_grads(
    trainable, batch: Batch, key: jax.Array, cfg: Config,
    grid: Optional[jnp.ndarray] = None,
    step=None,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Gradients + aux via the fused whole-ray fwd+bwd kernel — one
    Pallas launch per pass replaces value_and_grad's whole fusion graph,
    keeping activations in VMEM (see kernels/fused_train.py).

    Hierarchical configs run the chain: coarse kernel (which emits the
    per-ray compositing weights) -> inverse-CDF resample in XLA ->
    fine kernel; losses sum per the paper (eq. 6) and so do the shared-
    network gradients. ``trainable`` is ``params`` or, with a separate
    fine MLP, ``(params, fine_params)`` — matching loss_fn's contract.
    """
    from ..ops import render as render_ops, sampling

    if _has_prop(cfg):
        return _whole_ray_proposal_grads(trainable, batch, key, cfg, step)

    if _has_fine_net(cfg):
        params, fine_params = trainable
    else:
        params, fine_params = trainable, None

    n = batch.origins.shape[0]
    k_coarse, k_fine = jax.random.split(key)
    ipe = cfg.model.ipe
    edges = deltas = radii = None
    if ipe:
        # interval sampling: S+1 EDGES, kernel consumes midpoints +
        # exact lengths + per-ray cone radii — the same key flow as the
        # XLA path (ops/render._render_rays_ipe). With an occupancy
        # grid the edges are occ-guided draws (occupancy_edges): IPE
        # composes with the record machinery's empty-space skipping.
        if grid is not None and not cfg.render.compat_sampling:
            from ..ops import occupancy

            edges = occupancy.occupancy_edges(
                k_coarse, batch.origins, batch.dirs, grid,
                cfg.render.num_samples, cfg.camera, cfg.render,
                cfg.render.randomized,
            )
        else:
            edges = sampling.stratified_ts(
                k_coarse, n, cfg.render.num_samples + 1, cfg.camera.near,
                cfg.camera.far, cfg.render.randomized,
                space=cfg.render.sampling_space,
            )
        ts = 0.5 * (edges[..., :-1] + edges[..., 1:])
        deltas = edges[..., 1:] - edges[..., :-1]
        radii = (batch.radii if batch.radii is not None
                 else jnp.full((n,), sampling.pixel_radius(cfg.camera),
                               jnp.float32))
    elif grid is not None and not cfg.render.compat_sampling:
        from ..ops import occupancy

        ts = occupancy.occupancy_ts(
            k_coarse, batch.origins, batch.dirs, grid,
            cfg.render.num_samples, cfg.camera, cfg.render,
            cfg.render.randomized,
        )
    elif cfg.render.compat_sampling:
        ts = sampling.compat_ts(
            k_coarse, n, cfg.render.num_samples, cfg.camera.far,
            cfg.render.randomized,
        )
    else:
        ts = sampling.stratified_ts(
            k_coarse, n, cfg.render.num_samples, cfg.camera.near,
            cfg.camera.far, cfg.render.randomized,
            space=cfg.render.sampling_space,
        )
    vd = batch.dirs / jnp.linalg.norm(batch.dirs, axis=-1, keepdims=True)
    dist_w = cfg.train.distortion_weight
    one_pass = cfg.render.num_fine_samples == 0
    grads_c, tg_c = _whole_ray_pass(params, batch, vd, ts, cfg,
                                    dist=one_pass and dist_w > 0.0,
                                    deltas=deltas, radii=radii)
    loss_c = jnp.mean(tg_c.diag[:, 4])

    if one_pass:
        aux = {
            "loss": loss_c,
            "loss_coarse": loss_c,
            "psnr": render_ops.psnr_from_mse(loss_c),
            "ray_err": jax.lax.stop_gradient(tg_c.diag[:, 4]),
        }
        if dist_w > 0.0:
            loss_d = jnp.mean(tg_c.diag[:, 5])
            aux["loss_dist"] = loss_d
            aux["loss"] = loss_c + dist_w * loss_d
        return grads_c, aux

    # hierarchical fine pass on PDF-resampled ts (kernel weights are
    # values, not traced grads — no stop_gradient plumbing needed)
    fine_deltas = None
    if ipe:
        # resample S_f + 1 new EDGES from the coarse interval histogram
        # (the edges ARE the bins); standalone composits just the
        # resampled intervals (mip-NeRF's scheme), union evaluates the
        # MERGED coarse+resampled edge set (the interval analog of
        # NeRF §5.2 — the composition the quality records ride)
        fine_edges = sampling.sample_pdf(
            k_fine, edges, tg_c.weights, cfg.render.num_fine_samples + 1,
            cfg.render.randomized,
        )
        if cfg.render.fine_mode != "standalone":
            fine_edges = sampling.merge_ts(edges, fine_edges)
        all_ts = 0.5 * (fine_edges[..., :-1] + fine_edges[..., 1:])
        fine_deltas = fine_edges[..., 1:] - fine_edges[..., :-1]
    else:
        mids = 0.5 * (ts[..., 1:] + ts[..., :-1])
        bins = jnp.concatenate([ts[..., :1], mids, ts[..., -1:]], axis=-1)
        fine_ts = sampling.sample_pdf(
            k_fine, bins, tg_c.weights, cfg.render.num_fine_samples,
            cfg.render.randomized,
        )
        if cfg.render.fine_mode == "standalone":
            all_ts = fine_ts  # sample_pdf output is sorted by construction
        else:
            all_ts = sampling.merge_ts(ts, fine_ts)
    fparams = fine_params if fine_params is not None else params
    grads_f, tg_f = _whole_ray_pass(fparams, batch, vd, all_ts, cfg,
                                    dist=dist_w > 0.0,
                                    deltas=fine_deltas, radii=radii)
    loss_f = jnp.mean(tg_f.diag[:, 4])

    if fine_params is not None:
        grads = (grads_c, grads_f)
    else:  # shared network: both passes' gradients land on one pytree
        grads = jax.tree_util.tree_map(jnp.add, grads_c, grads_f)
    aux = {
        "loss": loss_c + loss_f,
        "loss_coarse": loss_c,
        "loss_fine": loss_f,
        "psnr": render_ops.psnr_from_mse(loss_f),
        "ray_err": jax.lax.stop_gradient(tg_f.diag[:, 4]),
    }
    if dist_w > 0.0:
        loss_d = jnp.mean(tg_f.diag[:, 5])
        aux["loss_dist"] = loss_d
        aux["loss"] = aux["loss"] + dist_w * loss_d
    return grads, aux


def _trainable(state: TrainState, cfg: Config):
    if _two_nets(cfg):
        return (state.params, state.fine_params)
    return state.params


def with_ema_params(state: TrainState) -> TrainState:
    """State with the EMA weights swapped in for params/fine_params —
    what eval/render should see when training ran with
    --ema_decay > 0. Identity when no EMA is carried. The structure of
    state.ema encodes whether a second net was trained (tuple) or not."""
    if state.ema is None:
        return state
    if isinstance(state.ema, tuple):
        return state._replace(params=state.ema[0], fine_params=state.ema[1])
    return state._replace(params=state.ema)


def _untrainable(trainable, cfg: Config):
    if _two_nets(cfg):
        return trainable
    return (trainable, None)


def apply_grads(
    state: TrainState, trainable, grads, opt, cfg: Config
) -> TrainState:
    """Shared optimizer tail: Adam update, params split, EMA update,
    step increment. EVERY step body (single-device, DP, error-resample,
    multi-scene) must go through this — a hand-rolled tail silently
    skips the EMA update (the bug the first --ema_decay drive hit: eval
    rendered the init weights forever)."""
    updates, opt_state = opt.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    params, fine_params = _untrainable(trainable, cfg)
    ema = state.ema
    if cfg.train.ema_decay > 0.0 and ema is not None:
        # DEBIASED EMA, stored bias-corrected: a raw EMA initialized at
        # the init weights still carries d^t of them (22% after 300
        # steps at d=0.995 — measured rendering garbage on the sphere
        # drive). Store deb_t = raw_t / (1 - d^t) with raw_0 = 0, so
        # the stored value is always an average of SEEN weights only
        # and eval can swap it in directly at any step.
        d = jnp.float32(cfg.train.ema_decay)
        t_prev = state.step.astype(jnp.float32)
        prev_scale = 1.0 - d ** t_prev  # 0 at the first step
        new_scale = 1.0 - d ** (t_prev + 1.0)
        ema = jax.tree_util.tree_map(
            lambda e, p: (d * prev_scale * e + (1.0 - d) * p) / new_scale,
            ema, trainable,
        )
    return state._replace(
        step=state.step + 1, params=params, fine_params=fine_params,
        opt_state=opt_state, ema=ema,
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState, batch: Batch, key: jax.Array, cfg: Config
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step (reference Trainer::step, src/model.rs:311-325),
    fully on-device. With cfg.train.accumulation_steps > 1, the batch's
    leading axis is split into micro-batches whose grads are averaged by
    a lax.scan before the single Adam update."""
    return train_step_core(state, batch, key, cfg)


def train_step_core(
    state: TrainState, batch: Batch, key: jax.Array, cfg: Config
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Unjitted step body — reused by the DP (parallel/dp.py) and
    multi-scene (parallel/multiscene.py) wrappers, which add their own
    collectives/vmap before jitting."""
    opt = make_optimizer(cfg)
    trainable = _trainable(state, cfg)
    acc = cfg.train.accumulation_steps

    if whole_ray_supported(cfg):
        grads, aux = whole_ray_grads(trainable, batch, key, cfg, state.grid,
                                     state.step)
    elif acc <= 1:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch, key, cfg, state.grid, state.step
        )
    else:
        n = batch.origins.shape[0]
        micro = n // acc
        mb = jax.tree_util.tree_map(
            lambda x: x[: micro * acc].reshape(acc, micro, *x.shape[1:]), batch
        )
        keys = jax.random.split(key, acc)

        def body(carry, xs):
            g_sum, l_sum = carry
            b, k = xs
            (l, aux_i), g = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, b, k, cfg, state.grid
            )
            g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
            return (g_sum, l_sum + l), aux_i

        zero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        (g_sum, l_sum), auxs = jax.tree_util.tree_map(
            lambda x: x, jax.lax.scan(body, (zero, 0.0), (mb, keys))
        )
        grads = jax.tree_util.tree_map(lambda g: g / acc, g_sum)
        loss = l_sum / acc
        ray_err = auxs.pop("ray_err").reshape(-1)  # (acc*micro,) per-ray
        aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
        aux["ray_err"] = ray_err

    return apply_grads(state, trainable, grads, opt, cfg), aux


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    state: TrainState, batch: Batch, key: jax.Array, cfg: Config
) -> Dict[str, jnp.ndarray]:
    """Deterministic (midpoint-sampled) evaluation pass."""
    prop = _has_prop(cfg)
    coarse, fine = render.render_rays(
        state.params,
        batch.origins,
        batch.dirs,
        key,
        cfg.model,
        cfg.render,
        cfg.camera,
        fine_params=None if prop else state.fine_params,
        randomized=False,
        dtype=_matmul_dtype(cfg),
        prop_params=state.fine_params if prop else None,
        prop_cfg=cfg.proposal,
        # match the training-time sampling distribution: occ-trained
        # fields evaluated with uniform sampling collapse (26.7 vs
        # 44.5 dB grid-guided, docs/PERFORMANCE.md)
        grid=state.grid if cfg.render.occ_res > 0 else None,
    )
    out = fine if fine is not None else coarse
    m = render.mse(out.rgb[..., :3], batch.gold[..., :3])
    return {
        "mse": m,
        "psnr": render.psnr_from_mse(m),
        "rgb": out.rgb,
        "depth": out.depth,
        "acc": out.acc,
    }
