"""CLI: `python -m leanmultisig_tpu <command>`.

Mirrors the reference binary (src/main.rs:8-52): the XMSS aggregation
benchmark with --n-signatures / --log-inv-rate / --tracing /
--profiling, plus proof artifact helpers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _cmd_xmss(args) -> int:
    if args.tracing:
        from .utils.logs import init_tracing
        init_tracing(True)
    import numpy as np

    from .aggregation.driver import (aggregate, get_aggregation_bytecode,
                                     make_signers, sign_all,
                                     verify_aggregate)
    from .field.constants import P
    from .whir.config import default_whir_config_builder

    if getattr(args, "device", False):
        os.environ["LMS_DPROVE"] = "1"
    n = args.n_signatures
    print(f"generating {n} XMSS signers...", file=sys.stderr)
    signers = make_signers(n)
    rng = np.random.default_rng(args.seed)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    cfg = default_whir_config_builder(args.log_inv_rate)
    get_aggregation_bytecode(n)  # compile outside the timed region

    t0 = time.perf_counter()
    bc, public_input, proof, metadata = aggregate(
        message, [pk for _, pk in signers], sigs, cfg, native_check=False)
    dt = time.perf_counter() - t0
    verify_aggregate(bc, public_input, proof, cfg)

    if args.profiling:
        from .aggregation.driver import _GUEST_CACHE  # noqa: F401
        print("(guest profiling: use diagnostics.profile_execution on the "
              "execution result)", file=sys.stderr)
    if args.output:
        from .serialize import proof_to_bytes
        with open(args.output, "wb") as f:
            f.write(proof_to_bytes(proof))
        print(f"proof written to {args.output}", file=sys.stderr)

    print(json.dumps({
        "n_signatures": n,
        "prove_s": round(dt, 3),
        "sigs_per_s": round(n / dt, 3),
        "proof_KiB": round(proof.proof_size_fe() * 4 / 1024, 1),
        "cycles": metadata["cycles"],
        "log_inv_rate": args.log_inv_rate,
    }))
    return 0


def _cmd_prove(args) -> int:
    """Prove a zkDSL program from a source file."""
    if args.tracing:
        from .utils.logs import init_tracing
        init_tracing(True)
    from .compiler import compile_program
    from .prover.prove import prove_execution
    from .serialize import proof_to_bytes
    from .vm import ExecutionWitness
    from .whir.config import default_whir_config_builder

    src = open(args.source).read()
    bytecode = compile_program(src)
    public_input = [int(x) for x in args.public_input.split(",")] \
        if args.public_input else []
    proof, metadata = prove_execution(bytecode, public_input,
                                      ExecutionWitness(),
                                      default_whir_config_builder(
                                          args.log_inv_rate))
    with open(args.output, "wb") as f:
        f.write(proof_to_bytes(proof))
    print(json.dumps({"cycles": metadata["cycles"],
                      "proof_KiB": round(proof.proof_size_fe() * 4 / 1024,
                                         1),
                      "output": args.output}))
    return 0


def _cmd_recursion(args) -> int:
    """1->1 recursion latency (reference `recursion` subcommand,
    src/main.rs:8-52 / README.md:53)."""
    if args.tracing:
        from .utils.logs import init_tracing
        init_tracing(True)
    import numpy as np

    from .aggregation.driver import aggregate, make_signers, sign_all
    from .aggregation.recursion_driver import (_inner_shape,
                                               prove_recursively,
                                               verify_recursive)
    from .field.constants import P
    from .whir.config import default_whir_config_builder

    n = args.n_signatures
    signers = make_signers(n)
    rng = np.random.default_rng(args.seed)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    cfg = default_whir_config_builder(args.log_inv_rate)
    bc, pub, proof, _ = aggregate(message, [pk for _, pk in signers], sigs,
                                  cfg, native_check=False)
    log_memory, tlr, _ = _inner_shape(bc, pub, proof, cfg)
    t0 = time.perf_counter()
    obc, opub, oproof, md = prove_recursively(bc, pub, proof, cfg, cfg)
    dt = time.perf_counter() - t0
    verify_recursive(bc, obc, opub, oproof, cfg, log_memory, tlr, len(pub),
                     input_data=md["input_data"])
    print(json.dumps({
        "inner_n_signatures": n,
        "recursion_prove_s": round(dt, 3),
        "outer_proof_KiB": round(oproof.proof_size_fe() * 4 / 1024, 1),
        "outer_cycles": md["cycles"],
    }))
    return 0


def _cmd_tree_bench(args) -> int:
    from .aggregation.benchmark import (AggregationTopology, render_tree,
                                        run_aggregation_benchmark,
                                        run_unified_benchmark)
    from .whir.config import default_whir_config_builder
    fanouts = [int(x) for x in args.fanouts.split(",")]
    builder = default_whir_config_builder(args.log_inv_rate)
    if args.unified:
        report = run_unified_benchmark(AggregationTopology(fanouts),
                                       builder, seed=args.seed,
                                       reps=args.reps)
    else:
        report = run_aggregation_benchmark(
            AggregationTopology(fanouts), builder, seed=args.seed,
            warmup=args.warmup, reps=args.reps)
    print(render_tree(report), file=sys.stderr)
    print(json.dumps(report))
    return 0


def _cmd_fancy_bench(args) -> int:
    """The reference FancyAggregation preset (src/main.rs:114-178) over
    the unified self-referential program."""
    from .aggregation.benchmark import (fancy_topology, render_tree,
                                        run_tree_topology_benchmark)
    from .whir.config import default_whir_config_builder
    builder = default_whir_config_builder(args.log_inv_rate)
    tree = fancy_topology(scale=args.scale)
    report = run_tree_topology_benchmark(tree, builder, seed=args.seed,
                                         reps=args.reps)
    print(render_tree(report), file=sys.stderr)
    print(json.dumps(report))
    return 0


def _cmd_verify(args) -> int:
    from .compiler import compile_program
    from .prover.verify import verify_execution
    from .serialize import proof_from_bytes
    from .whir.config import default_whir_config_builder

    bytecode = compile_program(open(args.source).read())
    public_input = [int(x) for x in args.public_input.split(",")] \
        if args.public_input else []
    proof = proof_from_bytes(open(args.proof, "rb").read())
    verify_execution(bytecode, public_input, proof,
                     default_whir_config_builder(args.log_inv_rate))
    print("proof OK")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="leanmultisig_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    x = sub.add_parser("xmss", help="XMSS aggregation benchmark")
    x.add_argument("--n-signatures", type=int, default=8)
    x.add_argument("--log-inv-rate", type=int, default=1)
    x.add_argument("--seed", type=int, default=42)
    x.add_argument("--tracing", action="store_true")
    x.add_argument("--profiling", action="store_true")
    x.add_argument("--output", help="write serialized proof here")
    x.add_argument("--device", action="store_true",
                   help="use the device-resident prover (LMS_DPROVE)")
    x.set_defaults(fn=_cmd_xmss)

    r = sub.add_parser("recursion",
                       help="1->1 recursion latency (src/main.rs)")
    r.add_argument("--n-signatures", type=int, default=8)
    r.add_argument("--log-inv-rate", type=int, default=1)
    r.add_argument("--seed", type=int, default=42)
    r.add_argument("--tracing", action="store_true")
    r.set_defaults(fn=_cmd_recursion)

    pr = sub.add_parser("prove", help="prove a zkDSL program")
    pr.add_argument("source")
    pr.add_argument("--public-input", default="")
    pr.add_argument("--log-inv-rate", type=int, default=1)
    pr.add_argument("--output", default="proof.bin")
    pr.add_argument("--tracing", action="store_true")
    pr.set_defaults(fn=_cmd_prove)

    tb = sub.add_parser("tree-bench",
                        help="aggregation-tree benchmark (benchmark.rs)")
    tb.add_argument("--fanouts", default="4,2",
                    help="sigs-per-leaf,then merge fanouts (e.g. 4,2,2)")
    tb.add_argument("--log-inv-rate", type=int, default=1)
    tb.add_argument("--seed", type=int, default=42)
    tb.add_argument("--unified", action="store_true",
                    help="use the unified self-referential program "
                         "(one bytecode for every node)")
    tb.add_argument("--warmup", type=int, default=1,
                    help="untimed warmup proves before timing")
    tb.add_argument("--reps", type=int, default=3,
                    help="timed reps per node (mean +/- 95%% CI)")
    tb.set_defaults(fn=_cmd_tree_bench)

    fb = sub.add_parser("fancy-bench",
                        help="the reference FancyAggregation topology "
                             "(depth-5 mixed raw/recursive tree, "
                             "src/main.rs:114-178) on unified bytecode")
    fb.add_argument("--scale", type=int, default=1,
                    help="divide every raw-signature count by this "
                         "(same shape, smaller nodes)")
    fb.add_argument("--log-inv-rate", type=int, default=1)
    fb.add_argument("--seed", type=int, default=42)
    fb.add_argument("--reps", type=int, default=1)
    fb.set_defaults(fn=_cmd_fancy_bench)

    v = sub.add_parser("verify", help="verify a proof artifact")
    v.add_argument("source")
    v.add_argument("proof")
    v.add_argument("--public-input", default="")
    v.add_argument("--log-inv-rate", type=int, default=1)
    v.set_defaults(fn=_cmd_verify)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
