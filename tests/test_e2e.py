"""End-to-end zkVM test: execute -> prove -> verify, with tamper probes.

Model: lean_prover/src/test_zkvm.rs (real pipeline at reduced security).
"""

import numpy as np
import pytest

from leanmultisig_tpu.fs.prover import Proof
from leanmultisig_tpu.fs.verifier import ProofError
from leanmultisig_tpu.prover.prove import prove_execution
from leanmultisig_tpu.prover.verify import verify_execution
from leanmultisig_tpu.vm import ExecutionWitness
from leanmultisig_tpu.whir.config import FoldingFactor, WhirConfigBuilder


def _test_builder():
    """Reduced-security WHIR config (fast grinding; structure identical)."""
    return WhirConfigBuilder(
        starting_log_inv_rate=1,
        max_num_variables_to_send_coeffs=8,
        rs_domain_initial_reduction_factor=5,
        folding_factor=FoldingFactor(7, 5),
        soundness_type="johnson",
        security_level=60,
        pow_bits=10,
    )


def test_prove_verify_roundtrip():
    from test_vm import build_program
    bytecode = build_program()
    public_input = [5, 6, 7]

    proof, metadata = prove_execution(bytecode, public_input,
                                      ExecutionWitness(), _test_builder())
    assert metadata["n_poseidons"] >= 1
    assert metadata["n_extension_ops"] >= 1

    bytecode_eval, raw_proof = verify_execution(bytecode, public_input, proof,
                                                _test_builder())
    assert bytecode_eval is not None
    assert raw_proof.transcript.size > 0

    # wrong public input must fail
    with pytest.raises((ProofError, AssertionError)):
        verify_execution(bytecode, [5, 6, 8], proof, _test_builder())

    # tampered transcript must fail
    for pos in [10, len(proof.transcript) // 2, len(proof.transcript) - 5]:
        bad = proof.transcript.copy()
        bad[pos] ^= 1
        with pytest.raises((ProofError, AssertionError)):
            verify_execution(bytecode, public_input,
                             Proof(bad, proof.merkle_paths), _test_builder())
