"""True multi-process smoke: 2 OS processes, jax.distributed over
Gloo/CPU, one global 4-device mesh, the REAL data-parallel train step
(parallel/dp.py fused-sampling path) — the strongest local evidence for
the SURVEY §5.8 multi-host plan short of a pod. In-process gating tests
live in test_loop_wiring.py; this one actually crosses process
boundaries."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from nerf_rs_tpu.parallel import dist_init
ok = dist_init.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert ok and jax.process_count() == 2
assert dist_init.is_primary() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from nerf_rs_tpu.config import CameraConfig, Config, ModelConfig, RenderConfig, TrainConfig
from nerf_rs_tpu.data import synthetic
from nerf_rs_tpu.data.device_dataset import DeviceDataset
from nerf_rs_tpu.ops import rays as rays_ops
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state

cfg = Config(
    camera=CameraConfig(width=16, height=16),
    model=ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                      feature_width=16, view_head_width=8,
                      pos_enc_levels=2, dir_enc_levels=1),
    render=RenderConfig(num_samples=8),
    train=TrainConfig(num_rays=32, precision="f32"),
)
mesh = mesh_mod.make_mesh()  # global: 2 procs x 2 local devices
assert mesh_mod.num_shards(mesh) == 4
imgs = np.asarray(synthetic.sphere_scene_images(cfg.camera, 84))
angles = np.asarray(rays_ops.view_angle_grid(6))
# identical replicated pixel store on every process (consistent with
# the replicated sharding; per-process view slicing would need
# make_array_from_process_local_data + a sharded store declaration)
ds = DeviceDataset(imgs, cfg.camera, angles=angles,
                   sharding=mesh_mod.replicated_sharding(mesh))
state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
step = dp.make_dp_train_step(cfg, mesh, dataset=ds)
key = jax.random.PRNGKey(7)
for i in range(3):
    state, aux = step(state, ds.images, ds.pose_data,
                      jax.random.fold_in(key, i))
loss = float(jax.device_get(aux["loss"]))
assert np.isfinite(loss)
print(f"RESULT {pid} {loss:.10f}", flush=True)
"""


WORKER_SHARD_STORE = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from nerf_rs_tpu.parallel import dist_init
ok = dist_init.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert ok and jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from nerf_rs_tpu.config import CameraConfig, Config, ModelConfig, RenderConfig, TrainConfig
from nerf_rs_tpu.data.factory import make_dataset
from nerf_rs_tpu.parallel import dp, mesh as mesh_mod
from nerf_rs_tpu.train.step import init_state
import dataclasses

cfg = Config(
    camera=CameraConfig(width=16, height=16),
    model=ModelConfig(net_depth=2, net_width=16, skip_layer=1,
                      feature_width=16, view_head_width=8,
                      pos_enc_levels=2, dir_enc_levels=1),
    render=RenderConfig(num_samples=8),
    train=TrainConfig(num_rays=32, precision="f32"),
)
cfg = dataclasses.replace(
    cfg, data=dataclasses.replace(cfg.data, dataset="sphere")
)
# 84 sphere views view-sharded over the GLOBAL 4-device mesh via 2
# processes x 2 local devices: 84/2 = 42 per process, local multiple 2.
# The uneven-count padding itself is unit-tested (test_data.py); here
# the point is the true host-sharded P(view) store built via
# make_array_from_process_local_data ends in a green global DP step.
mesh = mesh_mod.make_mesh()
assert mesh_mod.num_shards(mesh) == 4
shard = (jax.process_index(), jax.process_count())
ds = make_dataset(cfg, sharding=mesh_mod.view_sharding(mesh),
                  process_shard=shard, local_multiple=2)
assert ds.images.shape[0] == 84  # global view axis: nothing dropped
assert not ds.images.sharding.is_fully_replicated
state = dp.place_state(init_state(jax.random.PRNGKey(0), cfg), mesh)
step = dp.make_dp_train_step(cfg, mesh, dataset=ds, shard_store=True)
key = jax.random.PRNGKey(7)
for i in range(2):
    state, aux = step(state, ds.images, ds.pose_data,
                      jax.random.fold_in(key, i))
loss = float(jax.device_get(aux["loss"]))
assert np.isfinite(loss)
print(f"RESULT {pid} {loss:.10f}", flush=True)
"""


def _run_two_process(tmp_path, script):
    worker = tmp_path / "worker.py"
    worker.write_text(script)
    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        losses.append(float(line.split()[2]))
    # psum'd loss is identical on both processes
    assert losses[0] == losses[1], losses


def test_two_process_dp_step(tmp_path):
    _run_two_process(tmp_path, WORKER)


def test_two_process_host_sharded_pixel_store(tmp_path):
    """Round 4 (VERDICT item 5): the view axis of the pixel store laid
    out over the GLOBAL mesh via make_array_from_process_local_data —
    each process contributes its slice, devices sample locally, the DP
    step psums to one loss."""
    _run_two_process(tmp_path, WORKER_SHARD_STORE)
