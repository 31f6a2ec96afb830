"""Measure device-prove kernel counts + wall time on the current backend.

Usage:
  python tools/measure_kernels.py small       # tiny fixture program
  python tools/measure_kernels.py bench N     # aggregation at N sigs

Prints: distinct AOT kernel count, dispatch count, phase wall times.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("LMS_DPROF", "1")
os.environ.setdefault("LMS_TRACING", "1")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    from leanmultisig_tpu.utils.xla_cache import configure_persistent_cache
    configure_persistent_cache()
    import jax
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    from leanmultisig_tpu.utils import aot_cache
    from leanmultisig_tpu.vm import ExecutionWitness

    t0 = time.time()
    if mode == "small":
        from test_e2e import _test_builder
        from test_vm import build_program
        from leanmultisig_tpu.dprover.dprove import prove_execution_dev
        bc = build_program()
        pub = [5, 6, 7]
        builder = _test_builder()
        proof, _ = prove_execution_dev(bc, pub, ExecutionWitness(), builder)
    else:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 70
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        os.environ["LMS_DPROVE"] = "1"
        import numpy as np
        from leanmultisig_tpu.aggregation.driver import (aggregate,
                                                         make_signers,
                                                         sign_all)
        from leanmultisig_tpu.field.constants import P
        from leanmultisig_tpu.whir.config import default_whir_config_builder
        signers = make_signers(n)
        rng = np.random.default_rng(42)
        message = rng.integers(0, P, size=8, dtype=np.uint32)
        sigs = sign_all(signers, message)
        pub_keys = [pk for _, pk in signers]
        cfg = default_whir_config_builder(1)
        t0 = time.time()
        for r in range(max(reps, 1)):
            t1 = time.time()
            aggregate(message, pub_keys, sigs, cfg, native_check=False)
            print(f"rep {r}: {time.time() - t1:.1f}s", file=sys.stderr,
                  flush=True)
    dt = time.time() - t0
    used = aot_cache._USED
    print(f"mode={mode} wall={dt:.1f}s dispatches={len(used)} "
          f"distinct_kernels={len(set(used))}")
    # histogram of per-kernel use counts
    from collections import Counter
    c = Counter(used)
    multi = sum(1 for v in c.values() if v > 1)
    print(f"kernels_used_once={sum(1 for v in c.values() if v == 1)} "
          f"kernels_reused={multi}")


if __name__ == "__main__":
    main()
