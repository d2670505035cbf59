"""Generate the procedural lego-class Blender scene (the quality
benchmark of record — BASELINE.md test PSNR).

  python tools/make_scene.py --out data/proclego --size 800

Reproducible: deterministic in --seed; train/val/test camera rings are
disjoint draws. See nerf_rs_tpu/data/procedural.py for the scene.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--n_train", type=int, default=100)
    p.add_argument("--n_val", type=int, default=10)
    p.add_argument("--n_test", type=int, default=25)
    p.add_argument("--num_samples", type=int, default=512,
                   help="gold integration samples per ray")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene", default="lego",
                   choices=["lego", "helix", "facing", "lego360", "deep360"],
                   help="procedural field (data/procedural.FIELDS); "
                   "'facing' is the LLFF-style forward-facing rig for "
                   "--ndc training; 'lego360' the unbounded-surroundings "
                   "scene for --preset unbounded")
    args = p.parse_args(argv)

    from nerf_rs_tpu.data.procedural import make_blender_scene

    make_blender_scene(
        args.out, size=args.size, n_train=args.n_train, n_val=args.n_val,
        n_test=args.n_test, num_samples=args.num_samples, seed=args.seed,
        scene=args.scene,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
