"""Scalar/host Poseidon helpers used by the VM (mirrors utils/src/poseidon.rs)."""

from __future__ import annotations

import numpy as np

from ..poseidon import np_poseidon as npp


def poseidon16_permute(x: np.ndarray) -> np.ndarray:
    return npp.permute(np.asarray(x, np.uint32))


def poseidon16_compress(x: np.ndarray) -> np.ndarray:
    return npp.compress(np.asarray(x, np.uint32))[..., :8]


def poseidon16_compress_pair(left, right) -> np.ndarray:
    return poseidon16_compress(np.concatenate([np.asarray(left, np.uint32),
                                               np.asarray(right, np.uint32)]))


_P16_OF_ZERO = None


def get_poseidon_16_of_zero() -> np.ndarray:
    global _P16_OF_ZERO
    if _P16_OF_ZERO is None:
        _P16_OF_ZERO = poseidon16_compress(np.zeros(16, np.uint32))
    return _P16_OF_ZERO


def poseidon_compress_slice(data: np.ndarray, use_iv: bool) -> np.ndarray:
    """(utils/src/poseidon.rs:41-70)"""
    data = np.asarray(data, np.uint32)
    assert data.size > 0 and data.size % 8 == 0
    if use_iv:
        h = np.zeros(8, np.uint32)
        for off in range(0, data.size, 8):
            block = np.concatenate([h, data[off:off + 8]])
            h = poseidon16_compress(block)
        return h
    if data.size <= 16:
        padded = np.zeros(16, np.uint32)
        padded[:data.size] = data
        return poseidon16_compress(padded)
    h = poseidon16_compress(data[:16])
    for off in range(16, data.size, 8):
        block = np.concatenate([h, data[off:off + 8]])
        h = poseidon16_compress(block)
    return h
