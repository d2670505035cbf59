#!/usr/bin/env bash
# Brick-vs-flat hash-layout quality at RECORD SHAPES, sized to the
# MEASURED step times (VERDICT r4 weak #4, third attempt; supersedes
# record_queue7.sh whose 3k flat arm is ~3 h of step time alone).
#
# The open question: --preset ngp defaults hash_brick=true on a
# 1024-ray 64x64 sphere fit at ~24 dB (benchmarks/ab_brick.py). The
# plausible artifacts of the brick layout — ~2.4x vertex duplication
# and C0 seams at multiple-of-3 planes — would show up in a HIGHER
# PSNR regime, on a real multi-view scene, at record ray counts.
#
# Protocol here: proclego 800px, 4096 rays (the record batch shape),
# 800 iters with decay matched to horizon — identical budgets, so
# the A/B read is the BETWEEN-ARM delta; absolute PSNRs are
# below-asymptote and labeled as such. Eval: first 3 held-out test
# views at full 800px (the flat layout renders at ~8x brick's cost,
# so the full 25-view split is not affordable; 3 views is the same
# protocol for both arms).
#
# Cost (measured rates, docs/PERFORMANCE.md round 5): brick 450 ms/step
# -> 6 min; flat 3.6 s/step -> 48 min; evals ~2+12 min. The iter count
# is sized so the flat arm survives a shared-chip slowdown inside the
# round's wall clock (the chip swings 2x across hours, CLAUDE.md).
# Usage: PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue9.sh
set -u
cd "$(dirname "$0")/.."

DATA=data/proclego
[ -d "$DATA/test" ] || { echo "missing $DATA (tools/make_scene.py)"; exit 1; }

# last moment a phase may START (leave the chip free for the driver)
CUTOFF=${CUTOFF:-1787267000}

PROTO="--dataset blender --img_dir $DATA --near 2 --far 6 \
  --num_rays 4096 --num_iter 801 --lr_decay_steps 800 --lr_final 5e-5 \
  --eval_steps 5000 --logging_steps 100 --save_steps 250"
# save_steps 250: if the shared chip degrades mid-arm (2x swings,
# CLAUDE.md) a killed arm still leaves checkpoints, and both arms can
# be evaled at the last COMMON completed 250-multiple via --load_path.

run_exp() { # name, flags...
  local name=$1; shift
  local dir=runs/$name
  mkdir -p "$dir"
  if [ ! -f "$dir/TRAINED" ]; then
    if [ "$(date +%s)" -gt "$CUTOFF" ]; then
      echo "== $name: train SKIPPED (wall-clock cutoff)"; return
    fi
    echo "== $name: training $(date)"
    # shellcheck disable=SC2086
    python -m nerf_rs_tpu.cli train $PROTO "$@" \
      --save_dir "$dir/ckpt" --log_dir "$dir/logs" \
      >> "$dir/train.log" 2>&1 || { echo "== $name: TRAIN FAILED"; return; }
    touch "$dir/TRAINED"
  fi
  if [ -f "$dir/DONE" ]; then echo "== $name: done, skipping"; return; fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "== $name: eval SKIPPED (wall-clock cutoff)"; return
  fi
  echo "== $name: eval $(date)"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --save_dir "$dir/ckpt" \
    --max_views 3 > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -4 "$dir/eval.txt"
}

run_exp brick_q1k --preset ngp
run_exp flat_q1k  --preset ngp --hash_brick false

# Matched-horizon pair: the flat arm's wall-clock-shortened horizon is
# 501 iters (same 800-step decay schedule), so also eval brick at ITS
# 501 checkpoint — the exactly-matched read is brick@501 vs flat@501.
eval_at_ckpt() { # name, ckpt_glob, flags...
  local name=$1 glob=$2; shift 2
  local dir=runs/$name
  mkdir -p "$dir"
  if [ -f "$dir/DONE" ]; then echo "== $name: done, skipping"; return; fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "== $name: SKIPPED (wall-clock cutoff)"; return
  fi
  local ckpt
  ckpt=$(ls $glob 2>/dev/null | tail -1)
  [ -n "$ckpt" ] || { echo "== $name: no checkpoint ($glob)"; return; }
  echo "== $name: eval $ckpt $(date)"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --load_path "$ckpt" \
    --max_views 3 > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -4 "$dir/eval.txt"
}
eval_at_ckpt brick_q1k_at501 "runs/brick_q1k/ckpt/checkpoint-*-501.msgpack" --preset ngp
echo "queue9 drained $(date)"
