"""Driver-contract smoke tests: __graft_entry__.entry() compiles and
runs, dryrun_multichip exercises the full DP step on the virtual CPU
mesh — exactly what the round driver invokes."""

import pytest
import sys

sys.path.insert(0, ".")

import jax
import numpy as np


pytestmark = pytest.mark.slow  # e2e/subprocess drives

def test_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally


def _run_dryrun_subprocess(extra_env, strip=()):
    """Run dryrun_multichip(8) in a fresh interpreter with a controlled
    env. Subprocess is required: the scenarios manipulate backend
    registration, which is process-global."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k not in strip}
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )


def test_dryrun_without_tpu_platform():
    """Regression (VERDICT r1 missing #1): the dryrun is a CPU-mesh
    correctness check and must pass with NO TPU platform registered at
    all (sitecustomize skips axon registration when PALLAS_AXON_POOL_IPS
    is unset)."""
    r = _run_dryrun_subprocess(
        {"JAX_PLATFORMS": "cpu"},
        strip=("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok, loss=" in r.stdout


def test_dryrun_with_default_backend_broken():
    """Regression (VERDICT r1 weak #2): round 1's official multi-chip
    record failed because batch/key creation dispatched to the default
    (axon TPU) backend while it was in a libtpu-mismatch state. Simulate
    a broken default backend by making every get_backend(None / tpu /
    axon) raise; the hermetic dryrun must still pass."""
    prog = """
import jax
import jax._src.xla_bridge as xb
real_get = xb.get_backend
def poisoned(platform=None):
    p = getattr(platform, 'platform', platform)
    if platform is None or (isinstance(p, str) and p.lower() in ('axon', 'tpu')):
        raise RuntimeError('simulated broken TPU backend (libtpu mismatch)')
    return real_get(platform)
xb.get_backend = poisoned
import __graft_entry__ as ge
ge.dryrun_multichip(8)
"""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Run against CPU-only platforms so the test is deterministic on
    # machines without the axon plugin; the poison guards the
    # default-backend path either way.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-c", prog],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok, loss=" in r.stdout


def test_bench_importable():
    import bench  # noqa: F401  (the driver runs main() on real HW)

    assert callable(bench.main)
