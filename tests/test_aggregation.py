"""XMSS aggregation tests: in-circuit verification of real signatures.

Model: tests/test_multisignatures.rs (aggregation sizes, invalid-input
rejection) at reduced scale/security.
"""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation.driver import (aggregate,
                                                 build_witness,
                                                 get_aggregation_bytecode,
                                                 make_signers, sign_all,
                                                 verify_aggregate)
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.vm import execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError

rng = np.random.default_rng(42)


@pytest.fixture(scope="module")
def setup():
    signers = make_signers(2)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]
    return signers, message, sigs, pub_keys


def test_guest_executes_with_real_signatures(setup):
    _, message, sigs, pub_keys = setup
    bc = get_aggregation_bytecode(2)
    public_input, witness = build_witness(message, pub_keys, sigs)
    res = execute_bytecode(bc, public_input, witness)
    # 166 poseidons per signature: 2 encoding + 110 chain steps + 1 pk IV
    # + 21 sponge chunks + 32 merkle levels; plus 185 per proof for the
    # tweak-table hash binding (runtime slot)
    assert res.metadata["n_poseidons"] == 2 * 166 + 185


def test_guest_rejects_invalid_signature(setup):
    _, message, sigs, pub_keys = setup
    bc = get_aggregation_bytecode(2)
    # tamper with one chain tip -> merkle root equality must fail in-circuit
    from leanmultisig_tpu.xmss.scheme import XmssSignature
    bad_tips = sigs[1].chain_tips.copy()
    bad_tips[7, 2] = (bad_tips[7, 2] + 1) % P
    bad_sig = XmssSignature(bad_tips, sigs[1].randomness, sigs[1].merkle_proof)
    public_input, witness = build_witness(message, pub_keys, [sigs[0], bad_sig])
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bc, public_input, witness)


def test_guest_rejects_wrong_message(setup):
    _, message, sigs, pub_keys = setup
    bc = get_aggregation_bytecode(2)
    bad_message = message.copy()
    bad_message[3] = (bad_message[3] + 1) % P
    public_input, witness = build_witness(bad_message, pub_keys, sigs)
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bc, public_input, witness)


@pytest.mark.slow
def test_aggregate_prove_verify(setup):
    from test_e2e import _test_builder
    _, message, sigs, pub_keys = setup
    bc, public_input, proof, metadata = aggregate(message, pub_keys, sigs,
                                                  _test_builder())
    verify_aggregate(bc, public_input, proof, _test_builder())


def test_parse_type1_claim_roundtrip():
    """type2.parse_type1_claim inverts driver.build_witness's public
    input layout (build_type1_input_data analog)."""
    import numpy as np
    from leanmultisig_tpu.aggregation.driver import (build_witness,
                                                     make_signers, sign_all)
    from leanmultisig_tpu.aggregation.type2 import parse_type1_claim
    from leanmultisig_tpu.field.constants import P

    signers = make_signers(2)
    rng = np.random.default_rng(7)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub, _w = build_witness(message, [pk for _, pk in signers], sigs)
    n, msg, pks = parse_type1_claim(pub)
    assert n == 2 and np.array_equal(msg, message)
    for (root, pp_), (_, pk) in zip(pks, signers):
        assert np.array_equal(root, np.asarray(pk.merkle_root, np.uint32))
        assert np.array_equal(pp_, np.asarray(pk.public_param, np.uint32))
