"""Per-phase device-prover profile at the bench regime.

Runs one untimed warmup prove (absorbs XLA compile + tracing), then one
profiled prove with LMS_TRACING=1 + LMS_DPROF=1 so each phase span
blocks on the challenger state and its wall time includes the device
work it queued. Usage:  python tools/dprof.py [n_sigs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["LMS_DPROVE"] = "1"
os.environ.setdefault("BENCH_PROVER", "device")

import numpy as np  # noqa: E402


def main() -> None:
    n_sigs = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from leanmultisig_tpu.aggregation.driver import (aggregate, make_signers,
                                                     sign_all)
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.whir.config import default_whir_config_builder

    signers = make_signers(n_sigs)
    rng = np.random.default_rng(42)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]
    cfg = default_whir_config_builder(1)

    t0 = time.perf_counter()
    aggregate(message, pub_keys, sigs, cfg, native_check=False)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    # timed, un-profiled (true async pipeline)
    for i in range(2):
        t0 = time.perf_counter()
        aggregate(message, pub_keys, sigs, cfg, native_check=False)
        print(f"warm prove {i}: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)

    # profiled (per-phase device sync)
    os.environ["LMS_TRACING"] = "1"
    os.environ["LMS_DPROF"] = "1"
    from leanmultisig_tpu.utils import logs
    logs.init_tracing(True)
    t0 = time.perf_counter()
    aggregate(message, pub_keys, sigs, cfg, native_check=False)
    print(f"profiled prove: {time.perf_counter() - t0:.2f}s",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
