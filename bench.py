"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: XMSS signatures proven per second — type-1 aggregation at full
protocol security (124-bit, WHIR rate 1/2), matching the reference's
headline setup (`xmss --n-signatures N --log-inv-rate 1`, README.md:29-36;
baseline 1319 XMSS/s on M4 Max CPU).

Reliability contract: this script ALWAYS prints a JSON line within
BENCH_DEADLINE_S (default 420 s), whatever the TPU tunnel does. The
device attempt (LMS_DPROVE prover on the axon chip) runs in a SUBPROCESS
with a hard wall-clock deadline; if it times out, crashes, or only a CPU
is visible, the parent falls back to the host (numpy + native C) prover
inline. BENCH_PROVER=host|device overrides the selection.

The first device run compiles several hundred shape-specialized kernels
(persistently cached in .jax_cache); an untimed warmup run absorbs
compile + tracing, then up to BENCH_REPS timed reps report the min.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_XMSS_PER_S = 1319.0  # reference README.md:35
T_START = time.time()


def _deadline() -> float:
    return T_START + float(os.environ.get("BENCH_DEADLINE_S", "480"))


def _remaining() -> float:
    return _deadline() - time.time()


def bench_xmss_aggregation(n_sigs: int, prover: str,
                           deadline_ts: float) -> dict:
    """Full aggregation bench; reps adapt to the absolute deadline."""
    from leanmultisig_tpu.aggregation.driver import (aggregate, make_signers,
                                                     sign_all,
                                                     verify_aggregate)
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.whir.config import default_whir_config_builder

    t0 = time.time()
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
    setup_s = time.time() - t0
    n_pre = 0

    if prover == "device":
        os.environ["LMS_DPROVE"] = "1"
        # parallel pre-warm from the recorded artifact manifest (loads +
        # compiles every kernel on a thread pool), then one untimed
        # warmup run that absorbs whatever the manifest missed
        from leanmultisig_tpu.utils.aot_cache import (prewarm,
                                                      record_manifest)
        import jax
        tag = f"bench_n{n_sigs}_r{cfg.starting_log_inv_rate}_" \
              f"{jax.default_backend()}"
        t0 = time.time()
        n_pre = prewarm(tag)
        prewarm_s = time.time() - t0
        if n_pre < 100:
            # no (or stale) manifest: one untimed warmup prove absorbs
            # the serial first-dispatch loads the prewarm missed
            aggregate(message, pub_keys, sigs, cfg, native_check=False)
        warmup_s = time.time() - t0
        print(f"[bench] prewarm {n_pre} kernels {prewarm_s:.0f}s; "
              f"warmup prove {warmup_s - prewarm_s:.0f}s", file=sys.stderr)
    else:
        os.environ.pop("LMS_DPROVE", None)
        warmup_s = 0.0

    # min-of-N timing: the shared host shows bursty multi-second steal
    # windows; the fastest rep reflects the prover, not the neighbors.
    # Rep count adapts to the absolute deadline: always one measured rep,
    # more only while time remains (reserving ~1.5 proof times for the
    # next rep plus the final untimed verify).
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dt = float("inf")
    n_done = 0
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        bc, public_input, proof, metadata = aggregate(
            message, pub_keys, sigs, cfg, native_check=False)
        dt = min(dt, time.perf_counter() - t0)
        n_done += 1
        print(f"[bench] rep {n_done}: {time.perf_counter() - t0:.1f}s "
              f"(deadline in {deadline_ts - time.time():.0f}s)",
              file=sys.stderr)
        if prover == "device" and n_done == 1:
            from leanmultisig_tpu.utils.aot_cache import STATS
            print(f"[bench] aot stats: {STATS}", file=sys.stderr)
        # next-rep cost estimate: the first rep carries residual
        # per-program loads later reps don't pay (measured: rep1 ~90 s,
        # steady ~15-25 s), so cap the estimate at 45 s — stopping on
        # rep1's inflated time forfeits the cheap steady-state reps
        # (plus ~25 s for the final verify)
        if time.time() + 1.3 * min(dt, 45.0) + 25 > deadline_ts:
            break

    if prover == "device":
        from leanmultisig_tpu.utils.aot_cache import record_manifest
        import jax
        record_manifest(f"bench_n{n_sigs}_r{cfg.starting_log_inv_rate}_"
                        f"{jax.default_backend()}")

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
            "reps": n_done,
            "warmup_s": round(warmup_s, 1),
            "prewarmed": n_pre if prover == "device" else 0,
            "setup_s": round(setup_s, 1),
            "proof_KiB": round(proof.proof_size_fe() * 4 / 1024, 1),
            "cycles": metadata["cycles"],
            "security": "124-bit johnson, rate 1/2",
        },
    }


def _configure_jax_cache() -> None:
    # the SAME fingerprinted dir as tests/tools (utils.xla_cache) — a
    # second cache root would recompile everything the tools already
    # compiled on this machine
    from leanmultisig_tpu.utils.xla_cache import configure_persistent_cache
    configure_persistent_cache()


def _device_child(n_sigs: int) -> int:
    """Runs in a subprocess: full device bench, prints the JSON line.
    Exit 3 = no accelerator visible (parent falls back to host)."""
    _configure_jax_cache()
    os.environ.setdefault("LMS_PREWARM_WORKERS", "32")  # loads are RTT-bound
    import jax
    if jax.devices()[0].platform == "cpu":
        return 3
    budget = float(os.environ.get("BENCH_CHILD_BUDGET_S", "240"))
    result = bench_xmss_aggregation(n_sigs, "device",
                                    deadline_ts=T_START + budget - 10)
    print(json.dumps(result), flush=True)
    return 0


def _spawn_device_subprocess(n_sigs: int, budget_s: float):
    env = dict(os.environ)
    env["BENCH_CHILD_BUDGET_S"] = str(budget_s)
    try:
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--device-child",
             str(n_sigs)],
            stdout=subprocess.PIPE, stderr=None, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
    except OSError as e:
        print(f"[bench] device spawn failed: {type(e).__name__}",
              file=sys.stderr)
        return None


def _collect_device_result(proc, timeout_s: float) -> dict | None:
    if proc is None:
        return None
    try:
        out, _ = proc.communicate(timeout=max(timeout_s, 1))
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        print("[bench] device attempt failed: TimeoutExpired",
              file=sys.stderr)
        return None
    if proc.returncode != 0:
        print(f"[bench] device child rc={proc.returncode}", file=sys.stderr)
        return None
    for line in reversed((out or "").strip().splitlines()):
        try:
            parsed = json.loads(line)
            if isinstance(parsed, dict) and "metric" in parsed:
                return parsed
        except json.JSONDecodeError:
            continue
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--device-child":
        sys.exit(_device_child(int(sys.argv[2])))

    # 70 signatures fill the 2^16-row execution table exactly
    # (118 fixed + 932/sig cycles): best table occupancy per proof.
    n_sigs = int(os.environ.get("BENCH_N_SIGS", "70"))
    forced = os.environ.get("BENCH_PROVER")
    host_reserve = float(os.environ.get("BENCH_HOST_RESERVE_S", "120"))

    # The device child and the host bench run CONCURRENTLY: the host
    # result is the guaranteed fallback (ready in ~2 min), the device
    # child (prewarm-dominated, mostly tunnel-wait) is preferred if it
    # delivers before the deadline. Worst case wall = the child budget,
    # not child + host as in the old sequential scheme.
    proc = None
    if forced != "host":
        budget = _remaining() - 30
        if budget > 60:
            proc = _spawn_device_subprocess(n_sigs, budget)

    host_result = None
    if forced != "device":
        try:
            host_result = bench_xmss_aggregation(
                n_sigs, "host",
                deadline_ts=max(_deadline() - 20, time.time() + 45))
        except Exception as e:  # report a failed bench honestly
            host_result = {"metric": "xmss_sigs_proven_per_s", "value": 0,
                           "unit": "sigs/s", "vs_baseline": 0,
                           "error": str(e)[:200]}

    result = _collect_device_result(proc, _remaining() - 5)
    if result is None:
        result = host_result
    if result is None:
        result = {"metric": "xmss_sigs_proven_per_s", "value": 0,
                  "unit": "sigs/s", "vs_baseline": 0,
                  "error": "device bench failed and BENCH_PROVER=device"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
