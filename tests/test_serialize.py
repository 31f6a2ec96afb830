"""Proof serialization roundtrip: serialized proofs re-verify."""

import numpy as np

from leanmultisig_tpu.prover.prove import prove_execution
from leanmultisig_tpu.prover.verify import verify_execution
from leanmultisig_tpu.serialize import proof_from_bytes, proof_to_bytes
from leanmultisig_tpu.vm import ExecutionWitness


def test_proof_bytes_roundtrip():
    from test_e2e import _test_builder
    from test_vm import build_program
    builder = _test_builder()
    bc = build_program()
    pub = [5, 6, 7]
    proof, _ = prove_execution(bc, pub, ExecutionWitness(), builder)

    blob = proof_to_bytes(proof)
    restored = proof_from_bytes(blob)
    assert np.array_equal(restored.transcript, proof.transcript)
    assert restored.proof_size_fe() == proof.proof_size_fe()
    verify_execution(bc, pub, restored, builder)
    # compression actually compresses vs raw u32 dump
    assert len(blob) < proof.proof_size_fe() * 4
