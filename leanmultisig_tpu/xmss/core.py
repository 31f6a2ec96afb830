"""XMSS/WOTS constants and hash-input builders.

Protocol data mirrors the reference (crates/xmss/src/lib.rs, xmss.md):
V=42 chains, W=3, CHAIN_LENGTH=8, TARGET_SUM=184, LOG_LIFETIME=32;
tweak packing (type<<26)+(hi<<10)+sub, lo (lib.rs:43-52).
"""

from __future__ import annotations

import numpy as np

XMSS_DIGEST_LEN = 4
TWEAK_LEN = 2
V = 42
W = 3
CHAIN_LENGTH = 1 << W
NUM_CHAIN_HASHES = 110
TARGET_SUM = V * (CHAIN_LENGTH - 1) - NUM_CHAIN_HASHES  # 184
RANDOMNESS_LEN_FE = 6
MESSAGE_LEN_FE = 8
PUBLIC_PARAM_LEN_FE = 4
PUB_KEY_FLAT_SIZE = XMSS_DIGEST_LEN + PUBLIC_PARAM_LEN_FE
WOTS_SIG_SIZE_FE = RANDOMNESS_LEN_FE + V * XMSS_DIGEST_LEN
LOG_LIFETIME = 32

TWEAK_TYPE_CHAIN = 0
TWEAK_TYPE_WOTS_PK = 1
TWEAK_TYPE_MERKLE = 2
TWEAK_TYPE_ENCODING = 3


def make_tweak(tweak_type: int, sub_position, index) -> np.ndarray:
    """Vectorized over sub_position/index; trailing axis = 2."""
    sub = np.asarray(sub_position, np.uint64)
    idx = np.asarray(index, np.uint64)
    assert tweak_type < 4
    lo = idx & 0xFFFF
    hi = idx >> 16
    first = (np.uint64(tweak_type) << np.uint64(26)) + (hi << np.uint64(10)) + sub
    return np.stack([first.astype(np.uint32), lo.astype(np.uint32)], axis=-1)


def build_merkle_data(tweak, public_param, left_child, right_child) -> np.ndarray:
    """[tweak(2) | 00 | pp(4) | left(4) | right(4)] -> (..., 16)."""
    tweak = np.asarray(tweak, np.uint32)
    shape = tweak.shape[:-1]
    out = np.zeros(shape + (16,), np.uint32)
    out[..., :2] = tweak
    out[..., 4:8] = public_param
    out[..., 8:12] = left_child
    out[..., 12:16] = right_child
    return out


def build_chain_inputs(tweak, data, public_param) -> np.ndarray:
    """left = [tweak(2) | 00 | data(4)], right = [pp(4) | 0000] -> (..., 16)."""
    tweak = np.asarray(tweak, np.uint32)
    shape = tweak.shape[:-1]
    out = np.zeros(shape + (16,), np.uint32)
    out[..., :2] = tweak
    out[..., 4:8] = data
    out[..., 8:12] = public_param
    return out
