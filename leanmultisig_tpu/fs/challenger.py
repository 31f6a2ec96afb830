"""Duplex-sponge challenger (width 16, rate 8) over Poseidon.

Host-side sequential transcript logic; semantics mirror the reference
challenger (crates/backend/fiat-shamir/src/challenger.rs:9-76) exactly —
every observe overwrites the rate half and permutes; sample requires a
fresh rate (explicit duplex() calls are part of the bit-exact transcript).

All values are canonical uint32 KoalaBear elements.
"""

from __future__ import annotations

import numpy as np

from ..poseidon import np_poseidon as npp

RATE = 8
WIDTH = 16
CAPACITY = 8
EXT_DIM = 5


class Challenger:
    def __init__(self) -> None:
        self.state = np.zeros(WIDTH, np.uint32)
        self.rate_fresh = False

    def observe(self, value: np.ndarray) -> None:
        value = np.asarray(value, np.uint32)
        assert value.shape == (RATE,)
        self.state = self.state.copy()
        self.state[CAPACITY:] = value
        self.state = npp.permute(self.state)
        self.rate_fresh = True

    def observe_many(self, scalars) -> None:
        scalars = np.asarray(scalars, np.uint32).ravel()
        for off in range(0, len(scalars), RATE):
            chunk = scalars[off:off + RATE]
            buf = np.zeros(RATE, np.uint32)
            buf[:len(chunk)] = chunk
            self.observe(buf)

    def duplex(self) -> None:
        self.observe(np.zeros(RATE, np.uint32))

    def sample(self) -> np.ndarray:
        assert self.rate_fresh, "stale rate. insert a duplex() before."
        self.rate_fresh = False
        return self.state[CAPACITY:].copy()

    def sample_many(self, n: int) -> list[np.ndarray]:
        if n == 0:
            return []
        out = [self.sample()]
        for _ in range(1, n):
            self.duplex()
            out.append(self.sample())
        return out

    def sample_in_range(self, bits: int, n_samples: int) -> list[int]:
        """Low `bits` bits of sampled elements — 'not perfectly uniform'
        by design (challenger.rs:66-75)."""
        assert bits < 31
        fes = np.concatenate(self.sample_many(-(-n_samples // RATE)))
        return [int(fe) & ((1 << bits) - 1) for fe in fes[:n_samples]]


def sample_vec_ef(challenger: Challenger, length: int) -> np.ndarray:
    """Sample `length` extension-field elements -> (length, 5) uint32.

    (fiat-shamir/src/utils.rs:44-59)"""
    need = length * EXT_DIM
    fes = np.concatenate(challenger.sample_many(-(-need // RATE))) if need else \
        np.zeros(0, np.uint32)
    return fes[:need].reshape(length, EXT_DIM)
