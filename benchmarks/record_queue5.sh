#!/usr/bin/env bash
# IPE x record-machinery A/B at the 30k record protocol (VERDICT r3
# item 3): now that occupancy emits interval edges (ops/occupancy.
# occupancy_edges) the mip-NeRF family can ride the exact composition
# that produced the paper-family record (occ-guided coarse + union
# fine, 48.80 dB point-sampled):
#   mip_occ_std    IPE + occ-guided coarse edges, standalone fine
#                  (the mip-NeRF paper's own scheme)
#   mip_occ_union  IPE + occ coarse + union fine (the record recipe)
#   mip_union      IPE + union fine, no occupancy (isolates occ's part)
# Baselines for the table: 48.80 (point+occ+union, record_queue.sh
# lineage) and 45.92 (single-scale IPE standalone, record_queue3.sh).
# Usage: PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue5.sh
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
run_exp mip_occ_std   --preset mipnerf $OCC
# The union rows run the XLA train path: the union+IPE fused train
# kernel (S + S_f + 1 = 193 merged intervals with in-register conical
# moments) reproducibly OOM-kills the AOT compile helper (two
# SIGKILLed compiles ~15 min each) — a measured compile-memory limit,
# noted in docs/PERFORMANCE.md. Quality is path-independent
# (kernel-vs-XLA parity is tested).
# shellcheck disable=SC2086
run_exp mip_occ_union --preset mipnerf --fine_mode union \
  --use_whole_ray_train false $OCC
run_exp mip_union     --preset mipnerf --fine_mode union \
  --use_whole_ray_train false
echo "queue5 drained"
