"""Fiat-Shamir verifier state: transcript reader mirroring the prover.

Semantics per the reference VerifierState
(crates/backend/fiat-shamir/src/verifier.rs:15-197):
  * every read is re-absorbed into the duplex sponge;
  * a RAW transcript is reconstructed during verification (zero-padded to
    rate multiples, grinding witness padded to a full chunk, elided
    sumcheck coefficients re-inserted, Merkle paths restored from pruned
    form) — the exact format the in-VM recursion verifier consumes.
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from .challenger import CAPACITY, EXT_DIM, RATE, Challenger, sample_vec_ef
from .merkle_pruning import restore
from .prover import MerklePath, Proof, expand_bare_to_full


class ProofError(Exception):
    pass


class MerkleOpening:
    __slots__ = ("leaf_data", "path")

    def __init__(self, leaf_data: np.ndarray, path: np.ndarray):
        self.leaf_data = leaf_data
        self.path = path


class RawProof:
    def __init__(self, transcript: np.ndarray, merkle_openings: list):
        self.transcript = transcript
        self.merkle_openings = merkle_openings


class VerifierState:
    def __init__(self, proof: Proof):
        from ..field.constants import P
        self.challenger = Challenger()
        self.transcript = np.asarray(proof.transcript, np.uint32)
        # Reject non-canonical encodings (value >= P): the reference rejects
        # them at deserialization; accepting value+P would make every proof
        # malleable (distinct byte encodings of one accepted transcript).
        if self.transcript.size and int(self.transcript.max()) >= P:
            raise ProofError("non-canonical transcript scalar")
        self.offset = 0
        self.merkle_openings: list[MerkleOpening] = []
        for pruned in proof.merkle_paths:
            paths = restore(pruned)
            if paths is None:
                raise ProofError("invalid pruned merkle paths")
            for p in paths:
                if ((p.leaf_data.size and int(p.leaf_data.max()) >= P)
                        or (p.sibling_hashes.size
                            and int(p.sibling_hashes.max()) >= P)):
                    raise ProofError("non-canonical merkle path scalar")
                self.merkle_openings.append(
                    MerkleOpening(p.leaf_data, p.sibling_hashes))
        self.merkle_opening_index = 0
        self.raw_transcript: list[np.ndarray] = []

    # --- plumbing -----------------------------------------------------------
    def _read(self, n: int) -> np.ndarray:
        if self.offset + n > len(self.transcript):
            raise ProofError("exceeded transcript")
        out = self.transcript[self.offset:self.offset + n]
        self.offset += n
        return out

    def _absorb_and_record(self, scalars: np.ndarray) -> None:
        self.challenger.observe_many(scalars)
        padded = -(-len(scalars) // RATE) * RATE
        self.raw_transcript.append(scalars)
        if padded > len(scalars):
            self.raw_transcript.append(np.zeros(padded - len(scalars), np.uint32))

    # --- FSVerifier ----------------------------------------------------------
    def next_base_scalars_vec(self, n: int) -> np.ndarray:
        scalars = self._read(n)
        self._absorb_and_record(scalars)
        return scalars

    def next_extension_scalars_vec(self, n: int) -> np.ndarray:
        return self.next_base_scalars_vec(n * EXT_DIM).reshape(n, EXT_DIM)

    def next_extension_scalar(self) -> np.ndarray:
        return self.next_extension_scalars_vec(1)[0]

    def observe_scalars(self, scalars) -> None:
        self.challenger.observe_many(np.asarray(scalars, np.uint32).ravel())

    def duplex(self) -> None:
        self.challenger.duplex()

    def next_merkle_opening(self) -> MerkleOpening:
        if self.merkle_opening_index >= len(self.merkle_openings):
            raise ProofError("exceeded merkle openings")
        opening = self.merkle_openings[self.merkle_opening_index]
        self.merkle_opening_index += 1
        return opening

    def check_pow_grinding(self, bits: int) -> None:
        if bits == 0:
            return
        witness = self._read(1)
        self.challenger.observe_many(witness)
        if int(self.challenger.state[CAPACITY]) & ((1 << bits) - 1) != 0:
            raise ProofError("invalid grinding witness")
        self.raw_transcript.append(witness)
        self.raw_transcript.append(np.zeros(RATE - 1, np.uint32))

    def next_sumcheck_polynomial(self, n_coeffs: int, claimed_sum: np.ndarray,
                                 eq_alpha: np.ndarray | None = None) -> np.ndarray:
        """Returns (n_coeffs, 5) coefficients; reconstructs the elided c0/h0."""
        if eq_alpha is None:
            rest = self._read((n_coeffs - 1) * EXT_DIM).reshape(-1, EXT_DIM)
            total = rest[0].copy()
            for r in rest[1:]:
                total = nf.eadd(total, r)
            # c0 = (claimed_sum - sum(rest)) / 2
            diff = nf.esub(np.asarray(claimed_sum, np.uint32), total)
            c0 = _ehalve(diff)
            full = np.concatenate([c0[None], rest], axis=0)
            self._absorb_and_record(full.ravel())
            return full
        rest_bare = self._read((n_coeffs - 2) * EXT_DIM).reshape(-1, EXT_DIM)
        total = np.zeros(EXT_DIM, np.uint32)
        for r in rest_bare:
            total = nf.eadd(total, r)
        h0 = nf.esub(np.asarray(claimed_sum, np.uint32),
                     nf.emul(np.asarray(eq_alpha, np.uint32), total))
        bare = np.concatenate([h0[None], rest_bare], axis=0)
        full = expand_bare_to_full(bare, eq_alpha)
        self._absorb_and_record(full.ravel())
        return full

    # --- ChallengeSampler ----------------------------------------------------
    def sample_vec(self, length: int) -> np.ndarray:
        return sample_vec_ef(self.challenger, length)

    def sample(self) -> np.ndarray:
        return self.sample_vec(1)[0]

    def sample_in_range(self, bits: int, n_samples: int) -> list[int]:
        return self.challenger.sample_in_range(bits, n_samples)

    def into_raw_proof(self) -> RawProof:
        transcript = (np.concatenate(self.raw_transcript)
                      if self.raw_transcript else np.zeros(0, np.uint32))
        return RawProof(transcript, self.merkle_openings)


def _ehalve(x: np.ndarray) -> np.ndarray:
    from ..field.constants import P
    x = x.astype(np.uint64)
    half = np.where(x % 2 == 0, x // 2, (x + P) // 2)
    return half.astype(np.uint32)
