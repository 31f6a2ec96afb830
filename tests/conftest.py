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

# Persistent XLA compile cache: the device-prover suite compiles many
# shape-specialized kernels; caching them across runs keeps tests fast.
_cache_dir = os.environ.get("LMS_XLA_CACHE",
                            os.path.expanduser("~/.cache/lms_xla_tests"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

# XLA:CPU JIT-loads each compiled kernel as several mmaps; the device-
# prover suite compiles hundreds of kernels and exhausts the default
# vm.max_map_count=65530 ("LLVM compilation error: Cannot allocate
# memory" followed by SIGSEGV). Raise it when we can (root on linux).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1 << 20:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write(str(1 << 22))
except (OSError, PermissionError):
    pass
