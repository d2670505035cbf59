#!/usr/bin/env bash
# Unbounded-360 record protocol (VERDICT r3 item 1): train the full
# mip-NeRF 360 recipe on the procedural lego360 scene (unbounded
# surroundings, data/procedural.field_360) at the 30k record protocol
# and A/B the recipe's parts on their home turf:
#   ub_full       contract + disparity + annealed proposal + distortion 0.01
#   ub_nodist     ... distortion 0 (the bounded-scene A/B was negative;
#                 this is the measurement the loss exists for)
#   ub_nocontract ... no contraction (PE sees raw [0.3, 60] coordinates)
#   ub_linear     ... contraction but linear (bounded-style) sampling
# Same idempotent marker scheme as record_queue.sh. Usage:
#   PYTHONPATH=/root/repo:$PYTHONPATH bash benchmarks/record_queue4.sh
# Capability anchor: the reference hard-bounds every ray
# (src/ray_sampling.rs:107-125); unbounded is a rebuild-only capability.
set -u
cd "$(dirname "$0")/.."

DATA=data/lego360
[ -d "$DATA/test" ] || { echo "missing $DATA (tools/make_scene.py --scene lego360)"; exit 1; }

# near/far/contract/sampling come from --preset unbounded (cli.py:392);
# explicit flags here beat the preset (round-3 precedence fix).
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

run_exp ub_full       --preset unbounded
run_exp ub_nodist     --preset unbounded --distortion_weight 0
run_exp ub_nocontract --preset unbounded --contract false
run_exp ub_linear     --preset unbounded --sampling_space linear
echo "queue4 drained"
