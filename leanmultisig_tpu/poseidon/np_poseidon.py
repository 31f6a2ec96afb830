"""Host-side (numpy) Poseidon-16 permutation over KoalaBear.

Standard Poseidon schedule (2019/458): 4 initial full rounds, 20 partial
rounds, 4 terminal full rounds, S-box x^3, circulant MDS. This is the
mathematical form; the reference's sparse-matrix partial-round decomposition
(poseidon1_koalabear_16.rs:840-931) is an equivalent optimization — outputs
are identical (checked against the reference test vector in tests).

Vectorized over a leading batch axis: state shape (batch, 16), canonical u32.
"""

from __future__ import annotations

import numpy as np

from ..field.constants import P
from . import constants as C

PNP = np.uint64(P)

_MDS = np.array(
    [[C.MDS_COL[(i - j) % 16] for j in range(16)] for i in range(16)],
    np.uint64,
)
_RC = np.array(C.ROUND_CONSTANTS, np.uint64)  # (28, 16)


def _sbox(x: np.ndarray) -> np.ndarray:
    x2 = (x * x) % PNP
    return (x2 * x) % PNP


def _mds(state: np.ndarray) -> np.ndarray:
    # (batch, 16) @ (16, 16)^T with entries < 2^7: products < 2^38,
    # row sums < 2^42 — safe in uint64.
    return (state @ _MDS.T) % PNP


def permute(state: np.ndarray) -> np.ndarray:
    """Poseidon-16 permutation, batched. state: (..., 16) canonical uint32.

    Small batches route to the native C kernel (the sequential duplex
    sponge cannot batch — numpy per-call overhead dominates there)."""
    st = np.asarray(state)
    n_rows = 1 if st.ndim == 1 else int(np.prod(st.shape[:-1]))
    if True:  # native beats numpy at every batch size (u64 matmul != BLAS)
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            import ctypes
            buf = np.ascontiguousarray(st, np.uint32).copy()
            lib.poseidon16_permute_batch(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                n_rows)
            return buf
    s = np.asarray(state, np.uint64)
    squeeze = s.ndim == 1
    if squeeze:
        s = s[None]
    r = 0
    for _ in range(C.HALF_FULL_ROUNDS):
        s = _mds(_sbox((s + _RC[r]) % PNP))
        r += 1
    for _ in range(C.PARTIAL_ROUNDS):
        s = (s + _RC[r]) % PNP
        s[:, 0] = _sbox(s[:, 0])
        s = _mds(s)
        r += 1
    for _ in range(C.HALF_FULL_ROUNDS):
        s = _mds(_sbox((s + _RC[r]) % PNP))
        r += 1
    out = s.astype(np.uint32)
    return out[0] if squeeze else out


def compress(state: np.ndarray) -> np.ndarray:
    """Compression mode: permute(x) + x (feed-forward), full width.

    The 8-element digest is the first half of this output
    (poseidon1_koalabear_16.rs:1020-1031)."""
    s = np.asarray(state, np.uint64)
    return ((permute(state).astype(np.uint64) + s) % PNP).astype(np.uint32)
