"""Fiat-Shamir prover state: transcript accumulation + challenge sampling.

Mirrors the reference ProverState (crates/backend/fiat-shamir/src/prover.rs):
  * `add_base_scalars` absorbs into the duplex sponge AND appends to the
    transcript; `observe_scalars` absorbs only.
  * `add_sumcheck_polynomial` elides c0 (reconstructed by the verifier from
    the claimed sum, prover.rs:100-114).
  * `pow_grinding` searches a witness w with
    permute([capacity | w,0..0])[8] ≡ 0 mod 2^bits (prover.rs:120-177);
    here a numpy-batched search (device grind kernel: fs/grinding.py).

Extension scalars are (…, 5) canonical-uint32 arrays, flattened in basis
order.
"""

from __future__ import annotations

import time

import numpy as np

from ..field import np_field as nf
from ..poseidon import np_poseidon as npp
from .challenger import CAPACITY, EXT_DIM, RATE, WIDTH, Challenger, sample_vec_ef

POW_GRINDING_SECONDS = [0.0]


class MerklePath:
    __slots__ = ("leaf_data", "sibling_hashes", "leaf_index")

    def __init__(self, leaf_data: np.ndarray, sibling_hashes: np.ndarray,
                 leaf_index: int):
        self.leaf_data = np.asarray(leaf_data, np.uint32)
        self.sibling_hashes = np.asarray(sibling_hashes, np.uint32)
        self.leaf_index = int(leaf_index)


class Proof:
    """transcript: canonical uint32 vector; merkle_paths: list of path groups."""

    def __init__(self, transcript: np.ndarray, merkle_paths: list):
        self.transcript = transcript
        self.merkle_paths = merkle_paths

    def proof_size_fe(self) -> int:
        total = len(self.transcript)
        for group in self.merkle_paths:
            total += group.size_fe()
        return total


class ProverState:
    def __init__(self) -> None:
        self.challenger = Challenger()
        self.transcript: list[np.ndarray] = []
        self.merkle_paths: list = []

    # --- absorption -------------------------------------------------------
    def add_base_scalars(self, scalars) -> None:
        scalars = np.asarray(scalars, np.uint32).ravel()
        self.challenger.observe_many(scalars)
        self.transcript.append(scalars)

    def observe_scalars(self, scalars) -> None:
        self.challenger.observe_many(np.asarray(scalars, np.uint32).ravel())

    def duplex(self) -> None:
        self.challenger.duplex()

    def add_extension_scalars(self, scalars) -> None:
        scalars = np.asarray(scalars, np.uint32)
        assert scalars.shape[-1] == EXT_DIM
        self.add_base_scalars(scalars.ravel())

    def add_extension_scalar(self, scalar) -> None:
        self.add_extension_scalars(np.asarray(scalar, np.uint32)[None, :])

    def add_sumcheck_polynomial(self, coeffs: np.ndarray,
                                eq_alpha: np.ndarray | None = None) -> None:
        """coeffs: (n, 5) EF coefficients of the round polynomial.

        Without eq_alpha: absorb all, transcript gets coeffs[1:] (c0 elided).
        With eq_alpha: bare h(X) given; absorb g = eq(alpha,X)*h(X) in full,
        transcript gets bare[1:] (h0 elided). (prover.rs:100-114)
        """
        coeffs = np.asarray(coeffs, np.uint32)
        if eq_alpha is None:
            self.challenger.observe_many(coeffs.ravel())
            self.transcript.append(coeffs[1:].ravel().copy())
        else:
            full = expand_bare_to_full(coeffs, np.asarray(eq_alpha, np.uint32))
            self.challenger.observe_many(full.ravel())
            self.transcript.append(coeffs[1:].ravel().copy())

    def hint_merkle_paths(self, paths: list[MerklePath]) -> None:
        from .merkle_pruning import prune
        self.merkle_paths.append(prune(paths))

    # --- sampling ---------------------------------------------------------
    def sample_vec(self, length: int) -> np.ndarray:
        return sample_vec_ef(self.challenger, length)

    def sample(self) -> np.ndarray:
        return self.sample_vec(1)[0]

    def sample_in_range(self, bits: int, n_samples: int) -> list[int]:
        return self.challenger.sample_in_range(bits, n_samples)

    # --- pow grinding -----------------------------------------------------
    def pow_grinding(self, bits: int) -> None:
        assert bits < 31
        if bits == 0:
            return
        t0 = time.perf_counter()
        from ..device import enabled as device_enabled
        if device_enabled():
            from ..device.kernels import grind as device_grind
            witness = device_grind(self.challenger.state[:CAPACITY], bits)
        else:
            witness = grind(self.challenger.state[:CAPACITY], bits)
        self.challenger.observe_many(np.array([witness], np.uint32))
        assert int(self.challenger.state[CAPACITY]) & ((1 << bits) - 1) == 0
        self.transcript.append(np.array([witness], np.uint32))
        POW_GRINDING_SECONDS[0] += time.perf_counter() - t0

    def into_proof(self) -> Proof:
        transcript = (np.concatenate(self.transcript)
                      if self.transcript else np.zeros(0, np.uint32))
        return Proof(transcript, self.merkle_paths)


def grind(capacity: np.ndarray, bits: int, batch: int = 1 << 15) -> int:
    """Witness w with permute([cap | w,0,..,0])[8] % 2^bits == 0.

    Native multicore search when available; chunks scan from zero and
    return the chunk's smallest hit, keeping the witness identical to a
    sequential scan (host/device transcript parity)."""
    from ..field.constants import P
    from ..native import get_lib
    lib = get_lib()
    if lib is not None and hasattr(lib, "poseidon16_grind"):
        import ctypes
        cap = np.ascontiguousarray(capacity, np.uint32)
        capp = cap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        base = 0
        chunk = max(1 << 14, 1 << bits)
        while base < P:
            end = min(base + chunk, P)
            w = lib.poseidon16_grind(capp, bits, base, end)
            if w >= 0:
                return int(w)
            base = end
        raise RuntimeError("failed to find grinding witness")
    mask = (1 << bits) - 1
    base = 0
    while base < P:
        n = min(batch, P - base)
        states = np.zeros((n, WIDTH), np.uint32)
        states[:, :CAPACITY] = capacity
        states[:, CAPACITY] = np.arange(base, base + n, dtype=np.uint32)
        out = npp.permute(states)
        hits = np.nonzero((out[:, CAPACITY] & mask) == 0)[0]
        if hits.size:
            return base + int(hits[0])
        base += n
    raise RuntimeError("failed to find grinding witness")


def expand_bare_to_full(bare: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """g(X) = eq(alpha, X) * h(X) coefficient expansion (utils.rs:30-42)."""
    bare = np.asarray(bare, np.uint32)
    one = np.zeros(EXT_DIM, np.uint32)
    one[0] = 1
    one_minus_alpha = nf.esub(one, alpha)
    two_alpha_minus_one = nf.esub(nf.eadd(alpha, alpha), one)
    d = len(bare) - 1
    full = [nf.emul(one_minus_alpha, bare[0])]
    for k in range(1, d + 1):
        full.append(nf.eadd(nf.emul(one_minus_alpha, bare[k]),
                            nf.emul(two_alpha_minus_one, bare[k - 1])))
    full.append(nf.emul(two_alpha_minus_one, bare[d]))
    return np.stack(full)
