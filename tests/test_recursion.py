"""Recursive proving roundtrip: an inner ExecutionProof wrapped in an
outer proof of its complete in-circuit verification, then verified
(outer proof + host-side bytecode-claim reduction).

The single-child roundtrip (~40 s warm) runs in the DEFAULT suite — it is
the flagship path. The multi-child / type-2 / tree variants stay behind
LMS_SLOW_TESTS=1 (several minutes each).
"""

import os

import numpy as np
import pytest

from leanmultisig_tpu.fs.verifier import ProofError
from leanmultisig_tpu.prover.prove import prove_execution
from leanmultisig_tpu.vm import ExecutionWitness

slow = pytest.mark.skipif(
    not os.environ.get("LMS_SLOW_TESTS"),
    reason="multi-child recursive prove is slow; set LMS_SLOW_TESTS=1")


def test_recursive_roundtrip():
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.aggregation.recursion_driver import (
        _inner_shape, prove_recursively, verify_recursive)

    builder = _test_builder()
    bc = build_program()
    pub = [5, 6, 7]
    proof, _ = prove_execution(bc, pub, ExecutionWitness(), builder)
    log_memory, tlr, _ds = _inner_shape(bc, pub, proof, builder)

    outer_bc, outer_pub, outer_proof, md = prove_recursively(
        bc, pub, proof, builder, builder)
    inner_pub = verify_recursive(bc, outer_bc, outer_pub, outer_proof,
                                 builder, log_memory, tlr, len(pub),
                                 input_data=md["input_data"])
    assert inner_pub == pub
    # the outer public input is a FIXED-SIZE digest of the claim data
    assert len(outer_pub) == 8

    # tampered claim data (bytecode claim value) must fail the digest
    # binding / bytecode check
    from leanmultisig_tpu.protocols.logup import (compute_total_active_len,
                                                  sort_tables_by_height)
    total_gkr = (compute_total_active_len(
        log_memory, bc.log_size(), sort_tables_by_height(tlr))
        - 1).bit_length()
    k = total_gkr * 5 + 10
    bad = list(md["input_data"])
    bad[k] = (bad[k] + 1) % (2**31 - 2**24 + 1)
    with pytest.raises((ProofError, AssertionError)):
        verify_recursive(bc, outer_bc, outer_pub, outer_proof, builder,
                         log_memory, tlr, len(pub), input_data=bad)
    # ... and a digest recomputed over tampered data fails the outer FS
    from leanmultisig_tpu.aggregation.recursion_driver import \
        input_data_digest
    bad_pub = [int(x) for x in input_data_digest(bad)]
    with pytest.raises((ProofError, AssertionError)):
        verify_recursive(bc, outer_bc, bad_pub, outer_proof, builder,
                         log_memory, tlr, len(pub), input_data=bad)


@slow
def test_two_child_aggregation_roundtrip():
    """Type-1 structure: ONE outer proof attesting to TWO inner proofs
    (shared guest function, per-child hint streams + claims)."""
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.aggregation.recursion_driver import (
        _inner_shape, prove_aggregated, verify_recursive)

    builder = _test_builder()
    bc = build_program()
    children = []
    for pub in ([5, 6, 7], [9, 10, 11]):
        proof, _ = prove_execution(bc, pub, ExecutionWitness(), builder)
        children.append((pub, proof))
    log_memory, tlr, _ds = _inner_shape(bc, children[0][0], children[0][1],
                                        builder)

    outer_bc, outer_pub, outer_proof, md = prove_aggregated(
        bc, children, builder, builder)
    assert md["n_children"] == 2
    inner_pubs = verify_recursive(bc, outer_bc, outer_pub, outer_proof,
                                  builder, log_memory, tlr, 3,
                                  input_data=md["input_data"])
    assert inner_pubs == [[5, 6, 7], [9, 10, 11]]


@slow
def test_two_level_xmss_aggregation():
    """The reference's aggregation story: XMSS signature-aggregation
    proofs (different messages - the type-2 shape) wrapped in ONE
    recursive proof, verified end to end."""
    import numpy as np
    from leanmultisig_tpu.aggregation.driver import (aggregate,
                                                     make_signers, sign_all)
    from leanmultisig_tpu.aggregation.recursion_driver import (
        _inner_shape, prove_aggregated, verify_recursive)
    from leanmultisig_tpu.field.constants import P
    from test_e2e import _test_builder

    cfg = _test_builder()
    signers = make_signers(2)
    rng = np.random.default_rng(42)
    children = []
    bc = None
    for _ in range(2):
        msg = rng.integers(0, P, size=8, dtype=np.uint32)
        sigs = sign_all(signers, msg)
        bc, pub, proof, _md = aggregate(msg, [pk for _, pk in signers],
                                        sigs, cfg, native_check=False)
        children.append((pub, proof))

    log_memory, tlr, _ = _inner_shape(bc, children[0][0], children[0][1],
                                      cfg)
    outer_bc, outer_pub, outer_proof, md = prove_aggregated(
        bc, children, cfg, cfg)
    inner_pubs = verify_recursive(bc, outer_bc, outer_pub, outer_proof,
                                  cfg, log_memory, tlr,
                                  len(children[0][0]),
                                  input_data=md["input_data"])
    assert len(inner_pubs) == 2
    assert inner_pubs[0] == [int(x) for x in children[0][0]]
    assert inner_pubs[1] == [int(x) for x in children[1][0]]


@slow
def test_aggregation_tree_benchmark():
    """Tree runner: leaves + recursive merge with per-node stats
    (benchmark.rs analog)."""
    from test_e2e import _test_builder
    from leanmultisig_tpu.aggregation.benchmark import (
        AggregationTopology, render_tree, run_aggregation_benchmark)
    rep = run_aggregation_benchmark(AggregationTopology([2, 2]),
                                    _test_builder())
    assert rep["total_signatures"] == 4
    assert rep["root"]["kind"] == "merge"
    assert len(rep["root"]["children"]) == 2
    assert "leaf" in render_tree(rep)


@slow
def test_type2_merge_verify_split():
    """type_2_aggregation.rs API surface: merge_many_type_1 bundles
    independent components into one proof; verify_type_2 recovers each
    claim; split_type_2 re-proves one component standalone."""
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.aggregation.type2 import (Type1Proof,
                                                    merge_many_type_1,
                                                    split_type_2,
                                                    verify_type_2)

    builder = _test_builder()
    bc = build_program()
    components = []
    for pub in ([5, 6, 7], [9, 10, 11]):
        proof, md = prove_execution(bc, pub, ExecutionWitness(), builder)
        components.append(Type1Proof(bc, pub, proof, md))

    t2 = merge_many_type_1(components, builder, builder)
    assert t2.metadata["n_children"] == 2
    claims = verify_type_2(t2, bc, builder, builder)
    assert claims == [[5, 6, 7], [9, 10, 11]]

    # the outer bytecode is regenerated from the trusted inner bytecode:
    # substituting a different inner guest must fail (ADVICE r1: no trust
    # root meant forgeable component claims)
    from leanmultisig_tpu.vm import Bytecode, CodeEntry, Computation, Constant
    tampered = Bytecode(
        bc.code[:-1] + [CodeEntry(
            Computation("add", Constant(1), Constant(0), Constant(1)), ())],
        starting_frame_memory=bc.starting_frame_memory,
        ending_pc=bc.ending_pc)
    with pytest.raises(Exception):
        verify_type_2(t2, tampered, builder, builder)

    # split component 1 out as a standalone recursive proof
    solo = split_type_2(t2, 1, builder, builder)
    assert verify_type_2(solo, bc, builder, builder) == [[9, 10, 11]]

    # a tampered split index is rejected
    with pytest.raises(IndexError):
        split_type_2(t2, 5, builder, builder)
