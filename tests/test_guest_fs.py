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


def test_guest_merkle_verify():
    """In-circuit Merkle path verification against a real host tree."""
    from leanmultisig_tpu.hash import merkle as hmerkle, sponge

    height = 5
    digests = rng.integers(0, P, size=(1 << height, 8), dtype=np.uint32)
    tree = hmerkle.MerkleTree.from_first_layer(digests)
    index = 13
    siblings = tree.open_siblings(index, height)
    bits = [(index >> i) & 1 for i in range(height)]

    src = f'''
from fs_lib import *
from ef_lib import *
from whir_lib import *

HEIGHT = {height}
ONE_EF_PTR = 32
ZERO_EFS_PTR = 37

def main():
    pub = 0
    digest = pub
    root = pub + 8
    bits_buf = Array(HEIGHT)
    hint_witness("index_bits", bits_buf)
    nodes = Array(HEIGHT * 8)
    hint_witness("siblings", nodes)
    merkle_verify_leaf_digest(digest, root, bits_buf, nodes, HEIGHT)
    return
'''
    bytecode = compile_program(src, import_resolver=resolve_guest_lib)
    public_input = ([int(x) for x in digests[index]]
                    + [int(x) for x in tree.root()])
    witness = ExecutionWitness(hints={
        "index_bits": [bits],
        "siblings": [[int(x) for x in siblings.reshape(-1)]]})
    res = execute_bytecode(bytecode, public_input, witness)
    assert res.metadata["n_poseidons"] == height

    # wrong sibling -> rejection
    bad = [int(x) for x in siblings.reshape(-1)]
    bad[9] = (bad[9] + 1) % P
    import pytest
    from leanmultisig_tpu.vm.memory import RunnerError
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, public_input, ExecutionWitness(
            hints={"index_bits": [bits], "siblings": [bad]}))

    # wrong path direction -> rejection
    bad_bits = list(bits)
    bad_bits[2] ^= 1
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bytecode, public_input, ExecutionWitness(
            hints={"index_bits": [bad_bits],
                   "siblings": [[int(x) for x in siblings.reshape(-1)]]}))
