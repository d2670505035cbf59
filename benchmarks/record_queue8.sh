#!/usr/bin/env bash
# Contraction on its home turf, TIME-BOXED (VERDICT r4 task 3, round-5
# rerun of record_queue6.sh). The first queue6 attempt trained all
# three 30k arms to iter 5000 and lost them to the proposal-render
# packing crash (fixed; tests/test_preset_eval_render.py pins it), and
# the round-4 "43 ms/step" brick arithmetic turned out to be the
# 1024-ray small-protocol number, so the remaining round budget cannot
# fund 3x30k. 8k iters per arm keeps the SAME protocol shape
# (4096 rays, decay matched to horizon) — the A/B read is the BETWEEN-
# ARM delta on identical budgets, which 8k preserves; absolute PSNRs
# are below-asymptote and labeled as such in docs/PERFORMANCE.md.
# Arms (see record_queue6.sh for full rationale):
#   deep_full        contract + disparity (unbounded recipe, far=2500)
#   deep_nocontract  contraction OFF: raw coords to t=2500 hit the PE
#   deep_hardbound   contraction OFF, far=60: the reference-style hard
#                    ray bound (src/ray_sampling.rs:107-125)
# A wall-clock guard skips arms that cannot finish before the round's
# driver bench needs the chip.
set -u
cd "$(dirname "$0")/.."

DATA=data/deep360
[ -d "$DATA/test" ] || { echo "missing $DATA (tools/make_scene.py)"; exit 1; }

# last moment an ~22-min arm may START (leaves margin for the driver)
CUTOFF=${CUTOFF:-1787224500}

PROTO="--dataset blender --img_dir $DATA \
  --num_rays 4096 --num_iter 8001 --lr_decay_steps 8000 --lr_final 5e-5 \
  --eval_steps 9000 --logging_steps 1000 --save_steps 4000"

run_exp() { # name, flags...
  local name=$1; shift
  local dir=runs/$name
  mkdir -p "$dir"
  if [ -f "$dir/DONE" ]; then echo "== $name: done, skipping"; return; fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "== $name: SKIPPED (wall-clock cutoff)"; return
  fi
  echo "== $name: training $(date)"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli train $PROTO "$@" \
    --save_dir "$dir/ckpt" --log_dir "$dir/logs" \
    >> "$dir/train.log" 2>&1 || { echo "== $name: TRAIN FAILED"; return; }
  echo "== $name: eval $(date)"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --save_dir "$dir/ckpt" \
    > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -3 "$dir/eval.txt"
}

run_exp deep_full       --preset unbounded --near 1 --far 2500
run_exp deep_nocontract --preset unbounded --near 1 --far 2500 --contract false
run_exp deep_hardbound  --preset unbounded --near 1 --far 60 --contract false
echo "queue8 drained $(date)"
