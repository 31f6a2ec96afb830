"""In-circuit WHIR verification of a REAL standalone WHIR proof: FS
replay, per-round commitment parsing, pow grinding, STIR queries with
in-guest Merkle re-hashing, leaf folds, and the final constraint-weights
evaluation — all inside the zkVM.
"""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.aggregation.recursion import generate_whir_standalone
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError
from leanmultisig_tpu.whir import (SparseStatement, WhirConfig, commit, open_,
                                   parse_commitment, verify)
from leanmultisig_tpu.whir.statement import SparseValue

rng = np.random.default_rng(99)


def test_guest_verifies_whir_proof():
    from test_whir import _small_builder
    n_vars = 12
    cfg = WhirConfig(_small_builder(), n_vars)
    poly = rng.integers(0, P, size=1 << n_vars, dtype=np.uint32)

    point = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
    value = pp.eval_mle(poly, point)
    sub_point = rng.integers(0, P, size=(n_vars - 2, 5), dtype=np.uint32)
    sel = 3
    sub_value = pp.eval_mle(
        poly[sel << (n_vars - 2):(sel + 1) << (n_vars - 2)], sub_point)
    statements = [SparseStatement.dense(point, value),
                  SparseStatement(n_vars, sub_point,
                                  [SparseValue(sel, sub_value)])]

    ps = ProverState()
    witness = commit(cfg, ps, poly)
    open_(cfg, ps, statements, witness, poly)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    pc = parse_commitment(vs, n_vars, cfg.commitment_ood_samples)
    verify(cfg, vs, pc, statements)
    raw = vs.into_raw_proof()

    src, pub_len, preamble_len = generate_whir_standalone(
        cfg, [(n_vars, 0), (n_vars - 2, sel)], int(raw.transcript.size))
    guest_bc = compile_program(src, import_resolver=resolve_guest_lib)

    outer_pub = ([int(x) for x in point.reshape(-1)]
                 + [int(x) for x in value]
                 + [int(x) for x in sub_point.reshape(-1)]
                 + [int(x) for x in sub_value])
    assert len(outer_pub) == pub_len

    def witness_for(transcript, leaf_tweak=None):
        leafs = [[int(x) for x in op.leaf_data.reshape(-1)]
                 for op in raw.merkle_openings]
        if leaf_tweak is not None:
            leafs[leaf_tweak][0] = (leafs[leaf_tweak][0] + 1) % P
        return ExecutionWitness(
            preamble_memory_len=preamble_len,
            hints={"raw_transcript": [[int(x) for x in transcript]],
                   "whir_leaf": leafs,
                   "whir_path": [[int(x) for x in op.path.reshape(-1)]
                                 for op in raw.merkle_openings]})

    res = execute_bytecode(guest_bc, outer_pub, witness_for(raw.transcript))
    assert res.metadata["cycles"] > 0

    # tamper: transcript cell in the WHIR region must fail
    bad = raw.transcript.copy()
    pos = len(bad) // 2
    bad[pos] = (int(bad[pos]) + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub, witness_for(bad))

    # tamper: corrupt a hinted leaf -> merkle check must fail
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub,
                         witness_for(raw.transcript, leaf_tweak=0))

    # tamper: wrong claimed value in the public input must fail
    bad_pub = list(outer_pub)
    bad_pub[n_vars * 5] = (bad_pub[n_vars * 5] + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, bad_pub, witness_for(raw.transcript))
