"""Bytecode-claim reduction (bytecode_claims.rs analog): host prover +
in-circuit verifier roundtrip."""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation import claims as C
from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError

N_VARS = 9
N_CLAIMS = 4


def _random_claims(rng, bc, n):
    out = []
    for _ in range(n):
        pt = rng.integers(0, P, size=(N_VARS, 5), dtype=np.uint32)
        out.append((pt, pp.eval_mle(bc, pt)))
    return out


def test_host_reduction_roundtrip():
    rng = np.random.default_rng(7)
    bc = rng.integers(0, P, size=1 << N_VARS, dtype=np.uint32)
    claims = _random_claims(rng, bc, N_CLAIMS)
    fp, fv, transcript = C.reduce_claims(claims, bc)
    assert C.verify_reduced_claim(fp, fv, bc)
    assert transcript.size == C.reduction_transcript_len(N_VARS)

    # a tampered claim value propagates to an unverifiable reduced claim
    bad = list(claims)
    bpt, bval = bad[1]
    bval = bval.copy()
    bval[0] = np.uint32((int(bval[0]) + 1) % P)
    bad[1] = (bpt, bval)
    fp2, fv2, _ = C.reduce_claims(bad, bc)
    assert not C.verify_reduced_claim(fp2, fv2, bc)


GUEST = f'''
from fs_lib import *
from ef_lib import *
from gkr_lib import *
from claims_lib import *

N_VARS = {N_VARS}
N_CLAIMS = {N_CLAIMS}
CLAIM_PADDED = {C.claim_padded_size(N_VARS)}
RED_TLEN = {C.reduction_transcript_len(N_VARS)}
ONE_EF_PTR = 8
ZERO_EF_PTR = 13
ZERO_EFS_PTR = 13
POW2_EFS_PTR = 13

def main():
    pre = 0
    pre[ONE_EF_PTR] = 1
    for i in unroll(1, 5):
        pre[ONE_EF_PTR + i] = 0
    for i in unroll(0, 170):
        pre[ZERO_EFS_PTR + i] = 0
    claims = Array(N_CLAIMS * CLAIM_PADDED)
    hint_witness("claims", claims)
    rt = Array(RED_TLEN)
    hint_witness("red_transcript", rt)
    ptrs = Array(N_CLAIMS)
    for i in unroll(0, N_CLAIMS):
        ptrs[i] = claims + i * CLAIM_PADDED
    out_point = Array(N_VARS * 5)
    out_value = Array(5)
    reduce_claims_check(ptrs, N_CLAIMS, rt, out_point, out_value, N_VARS)
    exp = Array((N_VARS + 1) * 5)
    hint_witness("expected", exp)
    for i in unroll(0, N_VARS * 5):
        assert out_point[i] == exp[i]
    for i in unroll(0, 5):
        assert out_value[i] == exp[N_VARS * 5 + i]
    return
'''


def test_guest_reduction_check():
    rng = np.random.default_rng(8)
    bc = rng.integers(0, P, size=1 << N_VARS, dtype=np.uint32)
    claims = _random_claims(rng, bc, N_CLAIMS)
    fp, fv, transcript = C.reduce_claims(claims, bc)

    guest = compile_program(GUEST, import_resolver=resolve_guest_lib)
    flat = np.concatenate(
        [C.flatten_claim(pt, v, pad=True) for pt, v in claims])

    def witness(tr, expected):
        return ExecutionWitness(
            preamble_memory_len=175,
            hints={"claims": [[int(x) for x in flat]],
                   "red_transcript": [[int(x) for x in tr]],
                   "expected": [[int(x) for x in expected]]})

    expected = C.flatten_claim(fp, fv)
    pub = [0] * 8
    res = execute_bytecode(guest, pub, witness(transcript, expected))
    assert res.metadata["cycles"] > 0

    # tampered transcript -> fails in-circuit
    bad = transcript.copy()
    bad[20] = np.uint32((int(bad[20]) + 1) % P)
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest, pub, witness(bad, expected))

    # wrong expected claim -> fails
    bad_exp = expected.copy()
    bad_exp[3] = np.uint32((int(bad_exp[3]) + 1) % P)
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest, pub, witness(transcript, bad_exp))
