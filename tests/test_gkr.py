"""Quotient GKR tests (model: quotient_gkr/mod.rs:192-302)."""

import numpy as np
import pytest

from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import Proof, ProverState
from leanmultisig_tpu.fs.verifier import ProofError, VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.protocols.gkr import (prove_gkr_quotient,
                                            verify_gkr_quotient)

rng = np.random.default_rng(11)


@pytest.mark.parametrize("log_n,active_frac", [(7, 1.0), (8, 0.6), (9, 0.8)])
def test_gkr_quotient_roundtrip(log_n, active_frac):
    n = 1 << log_n
    active = int(n * active_frac)
    nums = np.zeros(n, np.uint32)
    nums[:active] = rng.integers(0, P, size=active, dtype=np.uint32)
    dens = np.zeros((n, 5), np.uint32)
    dens[:, 0] = 1  # padding denominators = 1
    dens[:active] = rng.integers(1, P, size=(active, 5), dtype=np.uint32)

    # true quotient
    expected = pp.EZERO.copy()
    for i in range(active):
        expected = nf.eadd(expected,
                           nf.escalar_mul(nf.einv(dens[i]), nums[i]))

    ps = ProverState()
    quotient_p, point_p = prove_gkr_quotient(ps, nums, dens)
    assert np.array_equal(quotient_p, expected)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    quotient_v, point_v, claim_num, claim_den = verify_gkr_quotient(vs, log_n)
    assert np.array_equal(quotient_v, expected)
    assert np.array_equal(point_p, point_v)
    # claims hold against the natural-order MLEs
    assert np.array_equal(pp.eval_mle(nums, point_v), claim_num)
    assert np.array_equal(pp.eval_mle(dens, point_v), claim_den)

    # tamper probe
    bad = proof.transcript.copy()
    bad[7] ^= 1
    vs2 = VerifierState(Proof(bad, proof.merkle_paths))
    with pytest.raises((ProofError, AssertionError)):
        verify_gkr_quotient(vs2, log_n)
