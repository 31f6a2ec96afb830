"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: XMSS signatures proven per second — type-1 aggregation at full
protocol security (124-bit, WHIR rate 1/2), matching the reference's
headline setup (`xmss --n-signatures N --log-inv-rate 1`, README.md:29-36;
baseline 1319 XMSS/s on M4 Max CPU).

Prover selection:
  - a TPU/accelerator is visible  -> device-resident prover (dprover/)
  - CPU only                      -> host (numpy + native C) prover
  - BENCH_PROVER=host|device overrides.

The first device run compiles several hundred shape-specialized kernels
(persistently cached in .jax_cache); an untimed warmup run absorbs
compile + tracing, then BENCH_REPS timed reps report the min.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_XMSS_PER_S = 1319.0  # reference README.md:35


def _select_prover() -> str:
    forced = os.environ.get("BENCH_PROVER")
    if forced in ("host", "device"):
        return forced
    # Probe the accelerator in a SUBPROCESS with a deadline: initializing
    # a tunneled-TPU backend can hang indefinitely when the tunnel is
    # unhealthy, and a hung probe must not take the whole benchmark down
    # with it — fall back to the host prover instead.
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240")))
        platform = r.stdout.strip().splitlines()[-1] if r.stdout else "cpu"
        return "device" if (r.returncode == 0 and platform != "cpu") \
            else "host"
    except (subprocess.TimeoutExpired, OSError):
        return "host"


def bench_xmss_aggregation(n_sigs: int, prover: str) -> dict:
    from leanmultisig_tpu.aggregation.driver import (aggregate, make_signers,
                                                     sign_all,
                                                     verify_aggregate)
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.whir.config import default_whir_config_builder

    signers = make_signers(n_sigs)
    rng = np.random.default_rng(42)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]
    cfg = default_whir_config_builder(1)  # rate 1/2, 124-bit, proven regime

    # compile guest + native kernels outside the timed region (all are
    # cached on disk across runs)
    from leanmultisig_tpu.aggregation.driver import get_aggregation_bytecode
    get_aggregation_bytecode(n_sigs)
    from leanmultisig_tpu.air.native_eval import get_native_evaluator
    from leanmultisig_tpu.native import (get_fieldops_lib, get_lib,
                                         get_quintic_lib)
    get_lib(), get_fieldops_lib(), get_quintic_lib()
    from leanmultisig_tpu.vm import tables as _T
    for _t in _T.ALL_TABLES:
        get_native_evaluator(_t)
    from leanmultisig_tpu.vm.native_runner import get_vmrunner_lib
    get_vmrunner_lib()

    if prover == "device":
        os.environ["LMS_DPROVE"] = "1"
        # warmup run: XLA compiles + tracing, untimed
        t0 = time.perf_counter()
        aggregate(message, pub_keys, sigs, cfg, native_check=False)
        warmup_s = time.perf_counter() - t0
    else:
        os.environ.pop("LMS_DPROVE", None)
        warmup_s = 0.0

    # min-of-N timing: the shared host shows bursty multi-second steal
    # windows; the fastest rep reflects the prover, not the neighbors
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dt = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        bc, public_input, proof, metadata = aggregate(
            message, pub_keys, sigs, cfg, native_check=False)
        dt = min(dt, time.perf_counter() - t0)

    # proof must verify (not timed)
    verify_aggregate(bc, public_input, proof, cfg)

    sigs_per_s = n_sigs / dt
    return {
        "metric": "xmss_sigs_proven_per_s",
        "value": round(sigs_per_s, 4),
        "unit": "sigs/s",
        "vs_baseline": round(sigs_per_s / BASELINE_XMSS_PER_S, 6),
        "detail": {
            "n_sigs": n_sigs,
            "prove_s": round(dt, 2),
            "prover": prover,
            "warmup_s": round(warmup_s, 1),
            "proof_KiB": round(proof.proof_size_fe() * 4 / 1024, 1),
            "cycles": metadata["cycles"],
            "security": "124-bit johnson, rate 1/2",
        },
    }


def main() -> None:
    # 70 signatures fill the 2^16-row execution table exactly
    # (118 fixed + 932/sig cycles): best table occupancy per proof.
    n_sigs = int(os.environ.get("BENCH_N_SIGS", "70"))
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    prover = _select_prover()
    try:
        result = bench_xmss_aggregation(n_sigs, prover)
    except Exception as e:  # report a failed bench honestly
        result = {"metric": "xmss_sigs_proven_per_s", "value": 0,
                  "unit": "sigs/s", "vs_baseline": 0, "error": str(e)[:200]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
