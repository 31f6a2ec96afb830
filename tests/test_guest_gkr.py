"""In-circuit quotient-GKR verification of a REAL host GKR proof:
top values, claim evaluation, and every layer's sumcheck + eq + beta-fold
checked inside the zkVM (the logup-GKR recursion component)."""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.protocols.gkr import (prove_gkr_quotient,
                                            verify_gkr_quotient)
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError

rng = np.random.default_rng(77)


def test_guest_verifies_gkr_quotient():
    log_n = 7
    n = 1 << log_n
    nums = rng.integers(0, P, size=n, dtype=np.uint32)
    dens = rng.integers(1, P, size=(n, 5), dtype=np.uint32)

    ps = ProverState()
    quotient, point_p = prove_gkr_quotient(ps, nums, dens)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    quotient_v, point_v, claim_num, claim_den = verify_gkr_quotient(vs, log_n)
    raw = vs.into_raw_proof()
    tlen = int(raw.transcript.size)

    # public input: [final point (log_n*5) | claim_num(5) | claim_den(5)]
    src = f'''
from fs_lib import *
from ef_lib import *
from gkr_lib import *

TLEN = {tlen}
LOG_N = {log_n}
PUB_LEN = {log_n * 5 + 10}
PUB_POT = {1 << (log_n * 5 + 10 - 1).bit_length()}
ONE_EF_PTR = PUB_POT
ZERO_EFS_PTR = PUB_POT + 5

def main():
    pre = 0
    pre[ONE_EF_PTR] = 1
    for i in unroll(1, 5):
        pre[ONE_EF_PTR + i] = 0
    for i in unroll(0, 20):
        pre[ZERO_EFS_PTR + i] = 0

    t = Array(TLEN)
    hint_witness("raw_transcript", t)
    fs = fs_new(t)

    # top layer: 32 nums + 32 dens (two absorb groups, rate-aligned)
    top_nums = fs[16]
    fs = fs_observe_transcript(fs, 20)
    top_dens = fs[16]
    fs = fs_observe_transcript(fs, 20)

    point5 = Array(25)
    fs = fs_sample_ef_vec(fs, point5, 5)

    num: Mut = Array(5)
    ef_eval_mle(top_nums, point5, num, 5)
    den: Mut = Array(5)
    ef_eval_mle(top_dens, point5, den, 5)

    point: Mut = point5
    fs, point, num, den = gkr_verify_layer(fs, point, num, den, 5)
    fs, point, num, den = gkr_verify_layer(fs, point, num, den, 6)

    pub = 0
    for i in unroll(0, LOG_N * 5):
        assert point[i] == pub[i]
    ef_assert_eq(num, pub + LOG_N * 5)
    ef_assert_eq(den, pub + LOG_N * 5 + 5)
    return
'''
    bytecode = compile_program(src, import_resolver=resolve_guest_lib)
    public_input = ([int(x) for x in point_v.reshape(-1)]
                    + [int(x) for x in claim_num]
                    + [int(x) for x in claim_den])
    pub_pot = 1 << (len(public_input) - 1).bit_length()
    witness = ExecutionWitness(
        preamble_memory_len=25,
        hints={"raw_transcript": [[int(x) for x in raw.transcript]]})
    execute_bytecode(bytecode, public_input, witness)

    # tamper: corrupt an inner-eval region of the transcript
    bad = [int(x) for x in raw.transcript]
    bad[330] = (bad[330] + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, public_input, ExecutionWitness(
            preamble_memory_len=25, hints={"raw_transcript": [bad]}))
