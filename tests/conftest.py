"""Test env: force CPU with 8 virtual devices.

This is the standard way to exercise shard_map/psum/mesh code without a
real pod (SURVEY.md §4 implication). Real-TPU perf is measured by
bench.py, not the test suite.

Note: this machine's sitecustomize registers the axon TPU PJRT plugin
and force-sets jax_platforms="axon,cpu", so the JAX_PLATFORMS env var
alone is NOT sufficient — we must override jax.config after import,
before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


def pytest_configure(config):
    # two tiers: `-m "not slow"` is the ~3 min inner-loop tier; the full
    # suite (~11 min) stays the default and what CI runs
    config.addinivalue_line(
        "markers",
        "slow: >9s on the 8-virtual-device CPU suite (convergence runs, "
        "subprocess/e2e drives); deselect with -m 'not slow'",
    )
