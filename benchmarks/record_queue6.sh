#!/usr/bin/env bash
# Contraction on its home turf (VERDICT r4 task 3): the deep360 scene
# (data/procedural.field_deep) spans t in [~3, 2500] — three decades of
# depth, angularly-textured landmarks at t ~ 100-400 and an enclosing
# sky shell at 1300-2500. lego360's far plane (t=60) let raw-PE fit the
# whole scene and contraction COST 0.5 dB there (runs/ub_*, round 4);
# here the un-contracted encoding must push |x| ~ 2500 through the
# raw-input lanes and alias the PE base frequency ~400x. Arms:
#   deep_full        contract + disparity (the unbounded recipe, far=2500)
#   deep_nocontract  ... contraction OFF: raw coordinates to 2500
#   deep_hardbound   ... contraction OFF and far=60: the reference-style
#                    hard ray bound (src/ray_sampling.rs:107-125) — what
#                    the reference could represent of this scene at all
# Protocol: 400x400 (the 3072-sample disparity gold integration makes
# 800px a ~3 h generation; the arms differ only in the flags above).
# Same idempotent marker scheme as record_queue.sh. Usage:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue6.sh
set -u
cd "$(dirname "$0")/.."

DATA=data/deep360
if [ ! -d "$DATA/test" ]; then
  echo "== generating $DATA (400px, 3072-sample disparity gold)"
  python tools/make_scene.py --out "$DATA" --size 400 --scene deep360 \
    || { echo "scene generation FAILED"; exit 1; }
fi

# near/far here beat the preset's lego360 bracket (explicit-flag
# precedence); 30k/4096 is the record protocol
PROTO="--dataset blender --img_dir $DATA \
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
  echo "== $name: eval"
  # shellcheck disable=SC2086
  python -m nerf_rs_tpu.cli eval $PROTO "$@" --save_dir "$dir/ckpt" \
    > "$dir/eval.txt" 2>&1 || { echo "== $name: EVAL FAILED"; return; }
  touch "$dir/DONE"
  tail -3 "$dir/eval.txt"
}

run_exp deep_full       --preset unbounded --near 1 --far 2500
run_exp deep_nocontract --preset unbounded --near 1 --far 2500 --contract false
run_exp deep_hardbound  --preset unbounded --near 1 --far 60 --contract false
echo "queue6 drained"
