"""Reference-regime benchmark: the four README rows + recursion latency.

Mirrors the reference's headline table (README.md:29-60): n=1550 XMSS
signatures at WHIR rate 1/2 and 1/4, proven (Johnson) and conjectured
(prox-gaps capacity) soundness, plus a 1->1 recursion-latency row.

Usage:
  python tools/ref_regime_bench.py [--n 1550] [--prover host|device]
                                   [--rows 1/2p,1/2c,1/4p,1/4c,rec]

Prints one JSON line per row; paste into README.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1550)
    ap.add_argument("--prover", default="host", choices=["host", "device"])
    ap.add_argument("--rows", default="1/2p,1/2c,1/4p,1/4c,rec")
    args = ap.parse_args()

    if args.prover == "device":
        os.environ["LMS_DPROVE"] = "1"
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    else:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from leanmultisig_tpu.aggregation.driver import (aggregate, make_signers,
                                                     sign_all,
                                                     verify_aggregate)
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.whir.config import default_whir_config_builder

    rows = args.rows.split(",")
    n = args.n
    signers = make_signers(n)
    rng = np.random.default_rng(42)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]

    def run_row(name, rate_log, conjectured):
        cfg = default_whir_config_builder(rate_log, conjectured=conjectured)
        warmup_s = 0.0
        if args.prover == "device":
            # parallel kernel pre-warm + one untimed run (compiles)
            from leanmultisig_tpu.utils.aot_cache import (prewarm,
                                                          record_manifest)
            import jax
            tag = f"refreg_{name.replace('/', '_')}_n{n}_" \
                  f"{jax.default_backend()}"
            t0 = time.perf_counter()
            prewarm(tag)
            aggregate(message, pub_keys, sigs, cfg, native_check=False)
            record_manifest(tag)
            warmup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        bc, pub, proof, md = aggregate(message, pub_keys, sigs, cfg,
                                       native_check=False)
        dt = time.perf_counter() - t0
        verify_aggregate(bc, pub, proof, cfg)
        out = {
            "row": name, "n_sigs": n, "prover": args.prover,
            "prove_s": round(dt, 2),
            "sigs_per_s": round(n / dt, 1),
            "proof_KiB": round(proof.proof_size_fe() * 4 / 1024, 1),
            "cycles": md["cycles"], "warmup_s": round(warmup_s, 1),
        }
        print(json.dumps(out), flush=True)
        return bc, pub, proof

    kept = None
    for name, rate, conj in (("1/2p", 1, False), ("1/2c", 1, True),
                             ("1/4p", 2, False), ("1/4c", 2, True)):
        if name in rows:
            res = run_row(name, rate, conj)
            if name == "1/2p":
                kept = res

    if "rec" in rows and kept is not None:
        from leanmultisig_tpu.aggregation.recursion_driver import (
            _inner_shape, prove_recursively, verify_recursive)
        bc, pub, proof = kept
        cfg = default_whir_config_builder(1)
        log_memory, tlr, _ = _inner_shape(bc, pub, proof, cfg)
        t0 = time.perf_counter()
        obc, opub, oproof, md = prove_recursively(bc, pub, proof, cfg, cfg)
        dt = time.perf_counter() - t0
        verify_recursive(bc, obc, opub, oproof, cfg, log_memory, tlr,
                         len(pub), input_data=md["input_data"])
        print(json.dumps({
            "row": "recursion_1to1_1/2p", "prover": args.prover,
            "prove_s": round(dt, 2),
            "proof_KiB": round(oproof.proof_size_fe() * 4 / 1024, 1),
            "outer_cycles": md["cycles"],
        }), flush=True)


if __name__ == "__main__":
    main()
