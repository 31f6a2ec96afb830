"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline (round 1): Poseidon-16 permutations/s on one chip — the
kernel floor of the whole proving pipeline (the reference's analog harness:
crates/backend/koala-bear/src/benchmark_poseidons.rs:15-39). Once the
end-to-end prover lands this switches to XMSS signatures proven/sec vs the
reference's 1319 XMSS/s (M4 Max, README.md:35).
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_poseidon(batch: int = 1 << 18, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    from leanmultisig_tpu.poseidon import perm

    rng = np.random.default_rng(0)
    p = 2**31 - 2**24 + 1
    states = jnp.asarray(rng.integers(0, p, size=(batch, 16), dtype=np.uint32))

    f = jax.jit(perm.permute)
    f(states).block_until_ready()  # compile

    t0 = time.perf_counter()
    out = states
    for _ in range(iters):
        out = f(out)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> None:
    perms_per_s = bench_poseidon()
    # Reference proxy: M4 Max SIMD Poseidon throughput is ~10-20 M perm/s;
    # use 15e6 as the baseline denominator until the XMSS/s metric lands.
    baseline = 15e6
    print(json.dumps({
        "metric": "poseidon16_permutations_per_s",
        "value": round(perms_per_s),
        "unit": "perm/s",
        "vs_baseline": round(perms_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
