#!/usr/bin/env bash
# Follow-up record-scale queue: distortion-loss A/Bs at the 30k record
# protocol (same idempotent marker scheme as record_queue.sh). Run
# AFTER record_queue.sh so the baselines exist for comparison.
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue2.sh
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

# does distortion suppress the CP streak fog at record scale?
# (baseline: fac_occ in record_queue.sh)
# shellcheck disable=SC2086
run_exp fac_occ_dist   --preset factored $OCC --distortion_weight 0.01
# mip-NeRF 360's native pairing: proposal sampling + distortion
# (baseline: 48.30 dB annealed proposal, docs/PERFORMANCE.md)
# shellcheck disable=SC2086
run_exp prop_dist      --use_proposal true --proposal_samples 64 \
  --num_samples 128 --proposal_anneal_steps 1000 --distortion_weight 0.01
echo "queue2 drained"
