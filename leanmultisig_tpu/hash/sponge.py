"""T-sponge helpers over the width-16 / rate-8 Poseidon compression.

Host-side (numpy, canonical form) implementations of the reference sponge
semantics (crates/backend/symetric/src/sponge.rs, compression.rs):

  * state = [capacity(8) | rate(8)]; compression = permute + full-width
    feed-forward; digest = first 8 limbs.
  * `hash_slice` absorbs RIGHT-TO-LEFT: the state is seeded with the *last*
    16 elements, then earlier chunks overwrite the rate half, last chunk
    first... down to chunk 0 (sponge.rs:7-26).
  * `precompute_zero_suffix_state(n)` = sponge state after absorbing n
    all-zero chunks (sponge.rs:29-49), making zero-padded Merkle leaves O(1).

Device-side batched equivalents live in the whir/merkle modules.
"""

from __future__ import annotations

import numpy as np

from ..poseidon import np_poseidon as npp

WIDTH = 16
RATE = 8
OUT = 8
DIGEST_ELEMS = 8


def compress16(state: np.ndarray) -> np.ndarray:
    """Full-width compression: permute + feed-forward. (..., 16) -> (..., 16)."""
    return npp.compress(state)


def compress_pair(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """2-to-1 digest compression (compression.rs:5-16). (...,8)x2 -> (...,8)."""
    state = np.concatenate([left, right], axis=-1)
    return compress16(state)[..., :OUT]


def hash_slice(data: np.ndarray) -> np.ndarray:
    """Sponge hash of a flat array whose length is a multiple of RATE, >= 16.

    Right-to-left absorption per sponge.rs:7-26."""
    data = np.asarray(data, np.uint32)
    n = data.shape[-1]
    assert n % RATE == 0 and n >= 2 * RATE, n
    state = data[..., n - WIDTH:].copy()
    state = compress16(state)
    n_chunks = n // RATE
    for chunk_idx in range(n_chunks - 3, -1, -1):
        state = state.copy()
        state[..., WIDTH - RATE:] = data[..., chunk_idx * RATE:(chunk_idx + 1) * RATE]
        state = compress16(state)
    return state[..., :OUT]


def precompute_zero_suffix_state(n_zero_chunks: int) -> np.ndarray:
    """State after absorbing n_zero_chunks all-zero chunks (sponge.rs:29-49)."""
    assert n_zero_chunks >= 2
    state = np.zeros(WIDTH, np.uint32)
    state = compress16(state)
    for _ in range(n_zero_chunks - 2):
        state = state.copy()
        state[WIDTH - RATE:] = 0
        state = compress16(state)
    return state


def hash_rtl(data: np.ndarray, initial_state: np.ndarray | None = None) -> np.ndarray:
    """Hash with right-to-left element order (sponge.rs:52-90).

    `data` is consumed from its END towards the start, i.e. equivalent to
    hash_rtl_iter(data.reversed()). Without an initial state the length must
    be a multiple of RATE and >= WIDTH.
    """
    data = np.asarray(data, np.uint32)
    n = data.shape[-1]
    if initial_state is None:
        assert n % RATE == 0 and n >= WIDTH
        # iterator yields data reversed; first WIDTH items fill positions
        # 15..0, i.e. state = last 16 elements in order.
        state = data[n - WIDTH:].copy()
        state = compress16(state)
        consumed = WIDTH
    else:
        assert n % RATE == 0
        state = np.asarray(initial_state, np.uint32).copy()
        consumed = 0
    remaining = n - consumed
    assert remaining % RATE == 0
    for chunk_idx in range(remaining // RATE - 1, -1, -1):
        state = state.copy()
        state[WIDTH - RATE:] = data[chunk_idx * RATE:(chunk_idx + 1) * RATE]
        state = compress16(state)
    return state[:OUT]
