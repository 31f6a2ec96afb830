"""Poseidon-16 permutation throughput harness.

Mirror of the reference's harness
(crates/backend/koala-bear/src/benchmark_poseidons.rs:15-39): prints
millions of permutations per second for the batched device kernel
(poseidon/perm.py — lazy-split MDS matmul on the MXU) and, for
comparison, the host numpy and native-C paths.

Usage: python tools/bench_poseidon.py [log2_batch] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    log_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = 1 << log_batch

    import jax
    import jax.numpy as jnp

    from leanmultisig_tpu.field import jnp_field as jf
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.poseidon import perm
    from leanmultisig_tpu.poseidon import np_poseidon

    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(n, 16), dtype=np.uint32)

    # --- device kernel ---------------------------------------------------
    # Timed as a CHAIN of dependent permutes inside one jit: back-to-back
    # independent calls overlap asynchronously on device, which a
    # wall-clock min-over-reps then under-reports by the overlap factor.
    CHAIN = 8
    dev = jnp.asarray(jf.to_monty_np(states))

    @jax.jit
    def chain(x):
        for _ in range(CHAIN):
            x = perm.permute(x)
        return x

    # completion is forced with a scalar FETCH, not block_until_ready:
    # the axon (tunneled-TPU) backend's block_until_ready returns before
    # the computation finishes, which over-reports throughput ~1000x.
    def run_once():
        out = chain(dev)
        return int(np.asarray(jax.device_get(out[0, 0])))

    run_once()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    plat = jax.devices()[0].platform
    print(f"device [{plat}] batch=2^{log_batch} x{CHAIN}: "
          f"{n * CHAIN / best / 1e6:.1f} M perms/s "
          f"({best * 1e3:.2f} ms/chain incl. one scalar fetch)")
    # correctness spot-check vs the host path
    got = jf.from_monty_np(np.asarray(perm.permute_jit(dev[:4])))
    assert np.array_equal(got, np_poseidon.permute(states[:4])), \
        "device permute mismatch"

    # --- host (numpy front end -> native C kernel) ------------------------
    small = states[: min(n, 1 << 18)]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np_poseidon.permute(small)
        best = min(best, time.perf_counter() - t0)
    print(f"host (native C) batch=2^{small.shape[0].bit_length() - 1}: "
          f"{small.shape[0] / best / 1e6:.2f} M perms/s")


if __name__ == "__main__":
    main()
