"""In-circuit sumcheck verification: the guest replays a REAL host product
sumcheck from the raw transcript — target updates, c0-binding constraint,
and challenge sampling all inside the zkVM (recursion building block)."""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.sumcheck.np_sumcheck import (ProductComputation,
                                                   sumcheck_prove,
                                                   sumcheck_verify)
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError

rng = np.random.default_rng(55)


def test_guest_verifies_product_sumcheck():
    n_vars = 4
    evals = rng.integers(0, P, size=(1 << n_vars, 5), dtype=np.uint32)
    weights = rng.integers(0, P, size=(1 << n_vars, 5), dtype=np.uint32)
    claim = pp.EZERO.copy()
    for i in range(1 << n_vars):
        claim = nf.eadd(claim, nf.emul(evals[i], weights[i]))

    ps = ProverState()
    sumcheck_prove([evals, weights], ProductComputation(), None, None, ps,
                   claim)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    challenges, final_target = sumcheck_verify(vs, n_vars, 2, claim)
    raw = vs.into_raw_proof()
    tlen = int(raw.transcript.size)

    # guest: verify all rounds in-circuit; public input =
    # [claim(5) | final_target(5)]
    src = f'''
from fs_lib import *
from ef_lib import *

TLEN = {tlen}
N_VARS = {n_vars}
PUB_LEN = 16
ONE_EF_PTR = PUB_LEN
ZERO_EFS_PTR = PUB_LEN + 5

def main():
    pub = 0
    pre = 0
    pre[ONE_EF_PTR] = 1
    for i in unroll(1, 5):
        pre[ONE_EF_PTR + i] = 0
    for i in unroll(0, 15):
        pre[ZERO_EFS_PTR + i] = 0

    t = Array(TLEN)
    hint_witness("raw_transcript", t)
    fs = fs_new(t)
    target = pub  # claim at pub[0..5]
    for rnd in unroll(0, N_VARS):
        fs, target, r = sumcheck_round(fs, target, 3)
    ef_assert_eq(target, pub + 5)
    return
'''
    bytecode = compile_program(src, import_resolver=resolve_guest_lib)
    public_input = [int(x) for x in claim] + [int(x) for x in final_target]
    witness = ExecutionWitness(
        preamble_memory_len=20,
        hints={"raw_transcript": [[int(x) for x in raw.transcript]]})
    execute_bytecode(bytecode, public_input, witness)

    # tampered transcript -> in-circuit rejection
    bad = [int(x) for x in raw.transcript]
    bad[2] = (bad[2] + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, public_input, ExecutionWitness(
            preamble_memory_len=20, hints={"raw_transcript": [bad]}))

    # wrong final target -> rejection
    bad_pub = list(public_input)
    bad_pub[7] = (bad_pub[7] + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, bad_pub, witness)
