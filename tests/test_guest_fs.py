"""In-VM Fiat-Shamir replay: the guest sponge (fs_lib) reproduces the host
challenger over a real raw transcript — the core recursion mechanism
(guest verifier consumes VerifierState's RawProof format)."""

import numpy as np

from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode

rng = np.random.default_rng(33)


def test_guest_sponge_replays_host_transcript():
    data1 = rng.integers(0, P, size=8, dtype=np.uint32)
    data2 = rng.integers(0, P, size=16, dtype=np.uint32)

    ps = ProverState()
    ps.add_base_scalars(data1)
    ps.pow_grinding(6)
    s1 = ps.challenger.state[8:].copy()
    ps.add_base_scalars(data2)
    ps.duplex()
    s2 = ps.challenger.state[8:].copy()
    proof = ps.into_proof()

    # verifier replay -> raw transcript (zero-padded groups, grinding chunk)
    vs = VerifierState(proof)
    assert np.array_equal(vs.next_base_scalars_vec(8), data1)
    vs.check_pow_grinding(6)
    assert np.array_equal(vs.challenger.state[8:], s1)
    assert np.array_equal(vs.next_base_scalars_vec(16), data2)
    vs.duplex()
    assert np.array_equal(vs.challenger.state[8:], s2)
    raw = vs.into_raw_proof()
    tlen = int(raw.transcript.size)
    assert tlen % 8 == 0

    src = f'''
from fs_lib import *

TLEN = {tlen}

def main():
    pub = 0
    t = Array(TLEN)
    hint_witness("raw_transcript", t)
    fs = fs_new(t)
    fs = fs_observe_transcript(fs, 1)
    fs = fs_check_grinding(fs, 6)
    r = fs_sample_ptr(fs)
    for i in unroll(0, 8):
        assert r[i] == pub[i]
    fs = fs_observe_transcript(fs, 2)
    fs = fs_duplex(fs)
    r2 = fs_sample_ptr(fs)
    for i in unroll(0, 8):
        assert r2[i] == pub[8 + i]
    return
'''
    bytecode = compile_program(src, import_resolver=resolve_guest_lib)
    public_input = [int(x) for x in s1] + [int(x) for x in s2]
    witness = ExecutionWitness(
        hints={"raw_transcript": [[int(x) for x in raw.transcript]]})
    res = execute_bytecode(bytecode, public_input, witness)
    # 1 + 1 (grinding) + 2 + 1 (duplex) poseidon permutes
    assert res.metadata["n_poseidons"] == 5

    # tampered transcript must fail the in-circuit comparison
    bad = [int(x) for x in raw.transcript]
    bad[3] ^= 1
    import pytest
    from leanmultisig_tpu.vm.memory import RunnerError
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, public_input,
                         ExecutionWitness(hints={"raw_transcript": [bad]}))
