"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(`--xla_force_host_platform_device_count=8`); real-TPU benchmarking happens
in bench.py, not in the test suite.

The container's sitecustomize registers the TPU PJRT plugin before conftest
runs, so we must both (a) append the host-device-count XLA flag before the
CPU client initializes and (b) select the cpu platform via jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent per-machine XLA compile cache (the device-prover suite
# compiles many shape-specialized kernels) + mmap headroom for XLA:CPU.
from leanmultisig_tpu.utils.xla_cache import (configure_persistent_cache,  # noqa: E402
                                              raise_map_count)

configure_persistent_cache()
raise_map_count()

# Parallel pre-warm of every kernel the suite used last time (AOT export
# artifacts + compiled executables load on a thread pool instead of
# serially at first dispatch), and record the manifest for the next run.
from leanmultisig_tpu.utils import aot_cache  # noqa: E402

_MANIFEST_TAG = "pytest_cpu"


def pytest_configure(config):
    # full-suite runs only: a single-file invocation shouldn't pay the
    # whole-suite kernel load
    args = [a for a in config.args if a.endswith(".py") or "::" in a]
    if not args and os.environ.get("LMS_NO_PREWARM") != "1":
        aot_cache.prewarm(_MANIFEST_TAG)


def pytest_sessionfinish(session, exitstatus):
    aot_cache.record_manifest(_MANIFEST_TAG)
