"""Persistent XLA compile-cache configuration.

XLA:CPU AOT results embed the compiling machine's CPU feature set, but
the persistent-cache key does NOT — an entry compiled on one host loads
on another with mismatched features ("This could lead to execution
errors such as SIGILL", cpu_aot_loader.cc). Build hosts change between
rounds here, so the cache directory is suffixed with a fingerprint of
the CPU feature flags + jax version: cross-machine entries are never
loaded, same-machine runs stay warm.
"""

from __future__ import annotations

import hashlib
import os


def machine_fingerprint() -> str:
    import jax
    parts = [jax.__version__]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(" ".join(sorted(line.split()[2:])))
                    break
    except OSError:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def configure_persistent_cache(base_dir: str | None = None) -> str:
    """Point jax at a per-machine persistent compile cache; returns the
    directory. Idempotent. `base_dir` defaults to $LMS_XLA_CACHE or
    <repo>/.jax_cache/host (inside the repo so the warm cache is
    COMMITTED: a fresh checkout — e.g. the driver's end-of-round bench
    and multichip dryrun — starts warm instead of paying ~30 min of
    cold XLA compiles; the fingerprint suffix keeps entries from a
    different machine from ever loading)."""
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    base = base_dir or os.environ.get(
        "LMS_XLA_CACHE", os.path.join(repo, ".jax_cache", "host"))
    cache = f"{base}_{machine_fingerprint()}"
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:  # read-only install: fall back to the user cache dir
        cache = os.path.join(os.path.expanduser("~/.cache/lms_xla"),
                             machine_fingerprint())
        os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    return cache


def raise_map_count() -> None:
    """XLA:CPU JIT-loads each compiled kernel as several mmaps; hundreds
    of kernels exhaust the default vm.max_map_count=65530 (symptom:
    'LLVM compilation error: Cannot allocate memory' then SIGSEGV)."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            if int(f.read()) < 1 << 20:
                with open("/proc/sys/vm/max_map_count", "w") as g:
                    g.write(str(1 << 22))
    except (OSError, PermissionError):
        pass
