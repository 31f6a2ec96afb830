"""Bytecode-claim reduction: fold many delegated bytecode-MLE claims
into ONE via a hinted product sumcheck (reference:
rec_aggregation/src/bytecode_claims.rs:35-136).

Every in-VM proof verification delegates one claim about the verified
program's bytecode MLE: (point, value) with
point = gkr_point suffix ++ logup alphas suffix (recursion_driver).
A recursion node accumulates 2 claims per child (the child's own
embedded reduced claim from its input data + the fresh claim produced by
verifying the child's proof) and reduces them to a single claim that it
writes into its OWN input data — so claim size stays constant with
depth/fan-in, and one host-side check at the tree root pins everything.

The reduction is a random-linear-combination product sumcheck over the
bytecode multilinear, proven here with its OWN Fiat-Shamir transcript
(seeded by the hash of all claims) and re-verified in-circuit by the
guest (`CLAIMS_LIB` in guest_lib.py):

    sum_x [ sum_i alpha^i eq(point_i, x) ] * bytecode(x)
        == sum_i alpha^i value_i

Wire note: unlike the reference (which stores all 3 round coefficients,
bytecode_claims.rs:133-136), this transcript uses the repo's c0-elided
sumcheck encoding; the guest consumes the VERIFIER-reconstructed raw
transcript, same as every other hinted transcript here.
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..fs.prover import ProverState
from ..fs.verifier import VerifierState
from ..poly import np_poly as pp
from ..sumcheck.np_sumcheck import (ProductComputation, sumcheck_prove,
                                    sumcheck_verify)
from ..vm.poseidon_host import (poseidon_compress_slice,
                                poseidon16_compress_pair)

EXT = 5
DIGEST_LEN = 8


def claim_flat_size(point_n_vars: int) -> int:
    return (point_n_vars + 1) * EXT


def claim_padded_size(point_n_vars: int) -> int:
    return -(-claim_flat_size(point_n_vars) // DIGEST_LEN) * DIGEST_LEN


def flatten_claim(point: np.ndarray, value: np.ndarray,
                  pad: bool = False) -> np.ndarray:
    """[point coords | value] as base scalars, optionally zero-padded to
    a whole number of digest chunks (flatten_bytecode_claim)."""
    flat = np.concatenate([np.asarray(point, np.uint32).reshape(-1),
                           np.asarray(value, np.uint32).reshape(-1)])
    if pad:
        flat = np.concatenate(
            [flat, np.zeros(-len(flat) % DIGEST_LEN, np.uint32)])
    return flat


def unflatten_claim(flat, point_n_vars: int):
    """-> (point (n,5), value (5,)) from a (possibly padded) flat claim."""
    flat = np.asarray(flat, np.uint32).reshape(-1)
    k = point_n_vars * EXT
    return flat[:k].reshape(point_n_vars, EXT), flat[k:k + EXT]


def hash_claims(claims: list) -> np.ndarray:
    """Running compress over per-claim T-sponge hashes
    (hash_bytecode_claims, bytecode_claims.rs:119-131)."""
    running = np.zeros(DIGEST_LEN, np.uint32)
    for point, value in claims:
        data = flatten_claim(point, value, pad=True)
        claim_hash = poseidon_compress_slice(data, use_iv=False)
        running = poseidon16_compress_pair(running, claim_hash)
    return running


def zero_claim(bytecode, point_n_vars: int):
    """The no-children claim: all-zero point; value = bytecode MLE at
    0..0 = its first coefficient (compute_bytecode_value_at fast path)."""
    point = np.zeros((point_n_vars, EXT), np.uint32)
    value = np.zeros(EXT, np.uint32)
    value[0] = np.uint32(bytecode.instructions_multilinear[0])
    return point, value


def reduce_claims(claims: list, instructions_multilinear: np.ndarray):
    """Prove the reduction of `claims` = [(point (n,5), value (5,))] about
    the bytecode MLE `instructions_multilinear` (2^n base scalars).

    Returns (final_point (n,5), final_value (5,), raw_transcript) where
    raw_transcript is the VERIFIER-reconstructed base-scalar stream the
    guest consumes (bytecode_claims.rs:57-100)."""
    bc = np.asarray(instructions_multilinear, np.uint32)
    n_vars = int(bc.shape[0]).bit_length() - 1
    assert bc.shape[0] == 1 << n_vars
    assert claims
    for point, _ in claims:
        assert point.shape == (n_vars, EXT), (point.shape, n_vars)

    claims_hash = hash_claims(claims)
    prover = ProverState()
    prover.add_base_scalars(claims_hash)
    alpha = prover.sample()

    # weights w(x) = sum_i alpha^i eq(point_i, x); claimed = sum alpha^i v_i
    alpha_i = pp.EONE
    weights = np.zeros((1 << n_vars, EXT), np.uint32)
    claimed = np.zeros(EXT, np.uint32)
    for point, value in claims:
        pp.add_scaled_eq(weights, point, alpha_i)
        claimed = nf.eadd(claimed, nf.emul(alpha_i, value))
        alpha_i = nf.emul(alpha_i, alpha)

    challenges, folded, _ = sumcheck_prove(
        [bc, weights], ProductComputation(), None, None, prover, claimed)

    # verifier-side replay -> the raw transcript the guest re-verifies
    vs = VerifierState(prover.into_proof())
    received_hash = vs.next_base_scalars_vec(DIGEST_LEN)
    assert np.array_equal(received_hash, claims_hash)
    _alpha_v = vs.sample()
    v_challenges, v_target = sumcheck_verify(vs, n_vars, 2, claimed)
    assert np.array_equal(v_challenges, challenges)
    raw = vs.into_raw_proof()

    # the reduced value is DEFINED as target / w(r) — exactly the guest's
    # division (main.py reduce_bytecode_claims); for honest claims this
    # equals the folded bytecode constant
    w_r = np.zeros(EXT, np.uint32)
    alpha_i = pp.EONE
    for point, _ in claims:
        w_r = nf.eadd(w_r, nf.emul(alpha_i, eq_at(point, challenges)))
        alpha_i = nf.emul(alpha_i, alpha)
    final_value = nf.emul(v_target, nf.einv(w_r))

    return challenges, final_value, raw.transcript


def eq_at(point_a, point_b) -> np.ndarray:
    """eq(a, b) = prod_j (a_j b_j + (1-a_j)(1-b_j)) for two EF points."""
    a = np.asarray(point_a, np.uint32).reshape(-1, EXT)
    b = np.asarray(point_b, np.uint32).reshape(-1, EXT)
    out = pp.EONE
    for j in range(a.shape[0]):
        ab = nf.emul(a[j], b[j])
        term = nf.eadd(ab, nf.emul(nf.esub(pp.EONE, a[j]),
                                   nf.esub(pp.EONE, b[j])))
        out = nf.emul(out, term)
    return out


def reduction_transcript_len(point_n_vars: int) -> int:
    """Raw-transcript length of the reduction proof: the claims-hash
    chunk + per round one c0-elided degree-2 polynomial re-expanded to 3
    EF coefficients (observed as 2 rate chunks)."""
    return DIGEST_LEN + point_n_vars * 2 * DIGEST_LEN


def verify_reduced_claim(point, value, instructions_multilinear) -> bool:
    """Host-side root check: the single reduced claim against the actual
    bytecode (bytecode_claims.rs compute_bytecode_value_at)."""
    expected = pp.eval_mle(np.asarray(instructions_multilinear, np.uint32),
                           np.asarray(point, np.uint32))
    return bool(np.array_equal(expected, np.asarray(value, np.uint32)))
