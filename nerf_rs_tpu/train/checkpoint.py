"""Checkpoint save/restore: params + optimizer state + step.

The reference saves libtorch VarStore archives named
``checkpoints/checkpoint-{unix_ts}-{iter}.ot`` (src/main.rs:81-83,
src/model.rs:211-217) and resumes via --load_path — but drops optimizer
state and the step counter (SURVEY §3.4: Adam moments reset on resume).
Here the full TrainState round-trips (msgpack pytree via
flax.serialization), the name pattern is preserved
(``checkpoint-{unix_ts}-{iter}.msgpack``), and ``latest_checkpoint``
enables auto-resume-from-latest (SURVEY §5.3 rebuild plan).
"""

from __future__ import annotations

import os
import re
import time
from typing import Optional

import jax
from flax import serialization

from .step import TrainState

_CKPT_RE = re.compile(r"checkpoint-(\d+)-(\d+)\.msgpack$")


def checkpoint_path(save_dir: str, step: int, ts: Optional[int] = None) -> str:
    ts = int(time.time()) if ts is None else ts
    return os.path.join(save_dir, f"checkpoint-{ts}-{step}.msgpack")


def save(
    state: TrainState, save_dir: str, ts: Optional[int] = None,
    err_store=None,
) -> str:
    """Write the full TrainState; returns the path.

    ``err_store`` (the highest-error resampling distribution, BASELINE
    config 5) is part of the training trajectory: it rides along as an
    ``.err.npy`` sidecar so resume doesn't reset the error distribution.
    """
    os.makedirs(save_dir, exist_ok=True)
    host_state = jax.device_get(state)
    # multi-scene states carry a stacked (n_scenes,) step vector — all
    # scenes advance in lockstep, so any entry names the checkpoint
    import numpy as np

    step = int(np.asarray(host_state.step).reshape(-1)[0])
    path = checkpoint_path(save_dir, step, ts)
    data = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption
    if err_store is not None:
        import numpy as np

        err_path = path.replace(".msgpack", ".err.npy")
        np.save(err_path + ".tmp.npy", jax.device_get(err_store))
        os.replace(err_path + ".tmp.npy", err_path)
    return path


def load_err_store(ckpt_path: str):
    """The error-resampling sidecar saved next to ``ckpt_path``, or
    None when the checkpoint predates error resampling."""
    err_path = ckpt_path.replace(".msgpack", ".err.npy")
    if not os.path.exists(err_path):
        return None
    import numpy as np

    return np.load(err_path)


def restore(path: str, template: TrainState) -> TrainState:
    """Load into the structure of ``template`` (a freshly-initialized
    state for the same Config).

    Checkpoints written before TrainState gained a field (e.g. ``grid``)
    lack that key in their state dict; flax's from_state_dict raises on
    the name mismatch. Restore the dict first and backfill missing
    NamedTuple fields from the template so old checkpoints keep loading.
    """
    with open(path, "rb") as f:
        sd = serialization.msgpack_restore(f.read())
    if isinstance(sd, dict):
        for name in TrainState._fields:
            tpl_sd = serialization.to_state_dict(getattr(template, name))
            if name not in sd or (sd[name] is None and tpl_sd is not None):
                # field missing (older format) or saved as None while
                # this config populates it (e.g. resuming a pre-EMA run
                # with --ema_decay): start from the template's value
                sd[name] = tpl_sd
    return serialization.from_state_dict(template, sd)


def restore_weights(path: str, template: TrainState) -> TrainState:
    """Load params/fine_params/grid/step but keep the template's
    optimizer state.

    Eval and render don't optimize, but ``restore`` needs the template's
    opt_state pytree to match the checkpoint's — which encodes training
    hyperparameters (an lr SCHEDULE adds a count leaf that a
    constant-lr template lacks). Weight-only restore decouples
    inference from how the run was optimized.
    """
    with open(path, "rb") as f:
        sd = serialization.msgpack_restore(f.read())

    def _field(name, tpl):
        if tpl is None or name not in sd:
            if tpl is None and _nonempty(sd.get(name)):
                # e.g. an occ-trained checkpoint evaluated without
                # --occ_res: the grid silently dropping means uniform
                # render sampling, measured -18 dB on thin-surface
                # scenes (docs/PERFORMANCE.md) — make the mismatch loud
                import warnings

                warnings.warn(
                    f"checkpoint {path} carries '{name}' but the eval "
                    f"config has none — it will be IGNORED. Pass the "
                    f"matching flags (--occ_res / --num_fine_samples / "
                    f"--use_proposal) or quality will silently collapse."
                )
            return tpl
        return serialization.from_state_dict(tpl, sd[name])

    def _nonempty(v):
        return v is not None and not (isinstance(v, dict) and not v)

    # EMA weights (cfg.train.ema_decay > 0 during training) should be
    # restored for inference even when the eval config doesn't mention
    # EMA: the template pytree is built from the params structure (a
    # tuple when the checkpoint trained a second net — flax serializes
    # tuples as {"0": ..., "1": ...}).
    sd_ema = sd.get("ema")
    if _nonempty(sd_ema) and template.ema is None:
        if isinstance(sd_ema, dict) and set(sd_ema) == {"0", "1"}:
            tpl = (template.params, template.fine_params)
        else:
            tpl = template.params
        ema = serialization.from_state_dict(tpl, sd_ema)
    else:
        ema = _field("ema", template.ema)

    return template._replace(
        step=_field("step", template.step),
        params=_field("params", template.params),
        fine_params=_field("fine_params", template.fine_params),
        grid=_field("grid", template.grid),
        ema=ema,
    )


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Most recent checkpoint by (timestamp, step), or None."""
    if not os.path.isdir(save_dir):
        return None
    best = None
    for name in os.listdir(save_dir):
        m = _CKPT_RE.search(name)
        if m:
            key = (int(m.group(1)), int(m.group(2)))
            if best is None or key > best[0]:
                best = (key, os.path.join(save_dir, name))
    return best[1] if best else None
