#!/usr/bin/env bash
# mip-NeRF anti-aliasing A/B at the 30k record protocol (proclego):
# {point-sampled, IPE} x {single-scale, multiscale-4} trained identically,
# each evaluated at render scales 1/1..1/8 against box-downsampled gold
# (cli eval --scales). The paper's Table-2-style story: point sampling
# aliases at coarse scales; IPE anti-aliases; multiscale training
# extends it. Same idempotent marker scheme as record_queue.sh.
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue3.sh
set -u
cd "$(dirname "$0")/.."

DATA=data/proclego
[ -d "$DATA/test" ] || { echo "missing $DATA (tools/make_scene.py)"; exit 1; }

PROTO="--dataset blender --img_dir $DATA --near 2 --far 6 \
  --num_rays 4096 --num_iter 30001 --lr_decay_steps 30000 --lr_final 5e-5 \
  --eval_steps 5000 --logging_steps 1000 --save_steps 5000"

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
  echo "== $name: eval (scales 1,2,4,8)"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --save_dir "$dir/ckpt" \
    --scales 1,2,4,8 > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -6 "$dir/eval.txt"
}

# the preset minus --ipe is the exact point-sampled twin (explicit user
# flags beat presets since round 3's precedence fix)
run_exp pt_lego     --preset mipnerf --ipe false
run_exp mip_lego    --preset mipnerf
run_exp pt_ms_lego  --preset mipnerf --ipe false --multiscale_levels 4
run_exp mip_ms_lego --preset mipnerf --multiscale_levels 4
echo "queue3 drained"
