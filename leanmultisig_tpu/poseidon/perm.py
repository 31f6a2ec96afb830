"""Batched Poseidon-16 permutation on device (JAX, Montgomery lanes).

TPU-first design:
  * State is one (..., 16) uint32 array. The circulant MDS (integer entries
    <= 101) is applied as a *matmul with lazy 16-bit split*:
    x = x_hi*2^16 + x_lo, each half contracted against the 16x16 integer
    MDS with uint32 accumulation (row sums < 2^27 — exact, no per-term
    modular reduction), recombined with ONE Montgomery multiply by
    2^48 mod p per output element. The contraction is a real dot_general,
    so XLA can tile it onto the MXU/VPU instead of 512 scalar multiplies.
  * Rounds are unrolled at trace time (28 rounds, ~70 primitives each) —
    small enough to compile fast, big enough for XLA to fuse whole rounds.

Mathematical schedule mirrors the reference permutation
(poseidon1_koalabear_16.rs:866-1018): 4 full / 20 partial / 4 full rounds,
S-box x^3. The reference's sparse partial-round decomposition is an
equivalent CPU-SIMD optimization we do not need — bit-exactness is checked
against its test vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_field as jf
from ..field.constants import P
from . import constants as C

# Montgomery-form round constants, shaped (28, 16).
_RC_MONTY = np.array(
    [[(v << 32) % P for v in row] for row in C.ROUND_CONSTANTS], np.uint32
)
# 2^48 mod p: recombination constant for the lazy MDS split.
_C48 = np.uint32((1 << 48) % P)
_MASK16 = np.uint32(0xFFFF)

# MDS^T so that y = x @ MDS^T gives y_i = sum_j mds[i][j] x_j.
_MDS_T = np.array(
    [[C.MDS_COL[(i - j) % 16] for i in range(16)] for j in range(16)],
    np.uint32,
)


def _mds(state):
    """Circulant MDS multiply: (..., 16) -> (..., 16), 1 reduction/element."""
    lo = state & _MASK16
    hi = state >> 16
    mds_t = jnp.asarray(_MDS_T)
    # integer contractions, exact in uint32 (sums < 2^27)
    s_lo = jax.lax.dot_general(lo, mds_t, (((lo.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.uint32)
    s_hi = jax.lax.dot_general(hi, mds_t, (((hi.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.uint32)
    return jf.add(jf.mul(s_hi, jnp.asarray(_C48)), s_lo)


def permute(state):
    """Poseidon-16 permutation of a (..., 16) monty-form uint32 array."""
    r = 0
    for _ in range(C.HALF_FULL_ROUNDS):
        state = _mds(jf.cube(jf.add(state, jnp.asarray(_RC_MONTY[r]))))
        r += 1
    for _ in range(C.PARTIAL_ROUNDS):
        state = jf.add(state, jnp.asarray(_RC_MONTY[r]))
        s0 = jf.cube(state[..., :1])
        state = _mds(jnp.concatenate([s0, state[..., 1:]], axis=-1))
        r += 1
    for _ in range(C.HALF_FULL_ROUNDS):
        state = _mds(jf.cube(jf.add(state, jnp.asarray(_RC_MONTY[r]))))
        r += 1
    return state


def compress(state):
    """(..., 16) -> (..., 16) feed-forward compression (digest = first 8)."""
    return jf.add(permute(state), state)


def compress_pair(left, right):
    """2-to-1 digest compression: (...,8),(...,8) -> (...,8)."""
    return compress(jnp.concatenate([left, right], axis=-1))[..., :8]


permute_jit = jax.jit(permute)
compress_jit = jax.jit(compress)
