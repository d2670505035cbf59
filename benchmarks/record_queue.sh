#!/usr/bin/env bash
# Idempotent queue for record-scale quality experiments on the real
# chip (recreates the round-3 runs/r3_queue.sh pattern, committed this
# time). Each experiment is (name, extra flags); a marker file under
# runs/ makes re-runs resume/skip, so the queue survives session
# restarts. Usage:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue.sh
# Results land in runs/<name>/eval.txt; train logs in runs/<name>/train.log.
set -u
cd "$(dirname "$0")/.."

DATA=data/proclego
[ -d "$DATA/test" ] || { echo "missing $DATA (tools/make_scene.py)"; exit 1; }

PROTO="--dataset blender --img_dir $DATA --near 2 --far 6 \
  --num_rays 4096 --num_iter 30001 --lr_decay_steps 30000 --lr_final 5e-5 \
  --eval_steps 5000 --logging_steps 1000 --save_steps 5000"
OCC="--occ_res 32 --occ_aabb 1.6 --occ_uniform_frac 0.10"

run_exp() { # name, flags...
  local name=$1; shift
  local dir=runs/$name
  mkdir -p "$dir"
  if [ -f "$dir/DONE" ]; then echo "== $name: done, skipping"; return; fi
  echo "== $name: training"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli train $PROTO "$@" \
    --save_dir "$dir/ckpt" --log_dir "$dir/logs" \
    >> "$dir/train.log" 2>&1 || { echo "== $name: TRAIN FAILED"; return; }
  echo "== $name: eval"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --save_dir "$dir/ckpt" \
    > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -3 "$dir/eval.txt"
}

# shellcheck disable=SC2086
run_exp fac_occ        --preset factored $OCC
# shellcheck disable=SC2086
run_exp fac_occ_c128   --preset factored $OCC --fac_comps 128 --fac_max_res 1024
# shellcheck disable=SC2086
run_exp fac_occ_ema    --preset factored $OCC --ema_decay 0.999
echo "queue drained"
