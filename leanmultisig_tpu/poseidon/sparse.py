"""Sparse partial-round decomposition of the Poseidon-16 permutation.

Derives, from the round constants + circulant MDS, the equivalent "sparse"
schedule used by the Poseidon AIR and its trace generator (reference:
poseidon1_koalabear_16.rs:397-480 compute_equivalent_matrices /
equivalent_round_constants; AIR schedule tables/poseidon_16/mod.rs:385-449).

The sparse form compresses each partial round to ONE S-box column:
  state <- initial 2x(full rounds) ... then
  state += first_round_constants; state = m_i @ state
  per partial round r: s0 = s0^3 (recorded); s0 += rc[r] (not last);
    new_s0 = dot(first_row[r], state); state[1:] += old_s0 * v[r][:15]
  then final full rounds.
All constants are canonical uint32; derivation is exact integer math mod P.
"""

from __future__ import annotations

import numpy as np

from ..field.constants import P
from . import constants as C

WIDTH = 16
HALF_FULL = C.HALF_FULL_ROUNDS  # 4
PARTIAL = C.PARTIAL_ROUNDS  # 20


def _minv(a: int) -> int:
    return pow(a, P - 2, P)


def _mat_mul(a, b, n=16):
    return [[sum(a[i][k] * b[k][j] for k in range(n)) % P for j in range(n)]
            for i in range(n)]


def _mat_vec(m, v, n=16):
    return [sum(m[i][j] * v[j] for j in range(n)) % P for i in range(n)]


def _transpose(m, n=16):
    return [[m[j][i] for j in range(n)] for i in range(n)]


def _mat_inverse(m, n):
    aug = [row[:] for row in m]
    inv = [[1 if i == j else 0 for j in range(n)] for i in range(n)]
    for col in range(n):
        pivot = next(r for r in range(col, n) if aug[r][col] % P != 0)
        if pivot != col:
            aug[col], aug[pivot] = aug[pivot], aug[col]
            inv[col], inv[pivot] = inv[pivot], inv[col]
        pinv = _minv(aug[col][col] % P)
        aug[col] = [(x * pinv) % P for x in aug[col]]
        inv[col] = [(x * pinv) % P for x in inv[col]]
        for i in range(n):
            if i == col:
                continue
            f = aug[i][col] % P
            if f == 0:
                continue
            aug[i] = [(aug[i][j] - f * aug[col][j]) % P for j in range(n)]
            inv[i] = [(inv[i][j] - f * inv[col][j]) % P for j in range(n)]
    return inv


def _derive():
    mds = [[C.MDS_COL[(16 + i - j) % 16] for j in range(16)] for i in range(16)]
    rc = C.ROUND_CONSTANTS
    partial_rc = [list(r) for r in rc[HALF_FULL:HALF_FULL + PARTIAL]]

    # equivalent_round_constants (poseidon1_koalabear_16.rs:460-480)
    mds_inv = _mat_inverse(mds, 16)
    opt = [0] * PARTIAL
    tmp = list(partial_rc[PARTIAL - 1])
    for i in range(PARTIAL - 2, -1, -1):
        inv_cip = _mat_vec(mds_inv, tmp)
        opt[i + 1] = inv_cip[0]
        tmp = list(partial_rc[i])
        for j in range(1, 16):
            tmp[j] = (tmp[j] + inv_cip[j]) % P
    first_round_constants = tmp
    scalar_round_constants = opt[1:]

    # compute_equivalent_matrices (poseidon1_koalabear_16.rs:399-456)
    mds_t = _transpose(mds)
    m_mul = [row[:] for row in mds_t]
    m_i = [[0] * 16 for _ in range(16)]
    v_collection = []
    w_hat_collection = []
    for _ in range(PARTIAL):
        v_arr = [m_mul[0][j + 1] if j < 15 else 0 for j in range(16)]
        w = [m_mul[i + 1][0] for i in range(15)]
        m_hat_inv = _mat_inverse([[m_mul[i + 1][j + 1] for j in range(15)]
                                  for i in range(15)], 15)
        w_hat = [sum(m_hat_inv[i][k] * w[k] for k in range(15)) % P
                 for i in range(15)] + [0]
        v_collection.append(v_arr)
        w_hat_collection.append(w_hat)
        m_i = [row[:] for row in m_mul]
        m_i[0][0] = 1
        for i in range(1, 16):
            m_i[i][0] = 0
            m_i[0][i] = 0
        m_mul = _mat_mul(mds_t, m_i)
    m_i = _transpose(m_i)
    v_collection.reverse()
    w_hat_collection.reverse()

    mds_0_0 = mds[0][0]
    first_rows = [[mds_0_0] + w[:15] for w in w_hat_collection]

    return {
        "first_round_constants": np.array(first_round_constants, np.uint32),
        "scalar_round_constants": np.array(scalar_round_constants, np.uint32),
        "m_i": np.array(m_i, np.uint32),
        "first_rows": np.array(first_rows, np.uint32),  # (PARTIAL, 16)
        "v": np.array(v_collection, np.uint32),  # (PARTIAL, 16)
        "mds": np.array(mds, np.uint32),
        "initial_constants": np.array(rc[:HALF_FULL], np.uint32),
        "final_constants": np.array(rc[HALF_FULL + PARTIAL:], np.uint32),
    }


_CACHE = None


def sparse_constants():
    global _CACHE
    if _CACHE is None:
        _CACHE = _derive()
    return _CACHE


# ----------------------------------------------------------------------------
# Vectorized sparse replay (trace generation): rows of 16-wide states.
# ----------------------------------------------------------------------------


def _cube(x):
    from ..field import np_field as nf
    return nf.mul(nf.mul(x, x), x)


def _full_2_rounds(state, rc1, rc2, mds):
    from ..field import np_field as nf
    state = _cube(nf.add(state, rc1[None, :]))
    state = nf.mul_mat(state, mds)
    state = _cube(nf.add(state, rc2[None, :]))
    return nf.mul_mat(state, mds)


def generate_trace_rows(inputs: np.ndarray, flag_permute: np.ndarray) -> dict:
    """Vectorized AIR trace replay (trace_gen.rs:44-165).

    inputs: (N, 16) canonical uint32; flag_permute: (N,) 0/1.
    Returns dict with 'beginning_full_rounds' (2, N, 16), 'partial_rounds'
    (PARTIAL, N), 'ending_full_rounds' (1, N, 16), 'outputs_left' (N, 8),
    'outputs_right' (N, 8).
    """
    from ..field import np_field as nf
    k = sparse_constants()
    mds = k["mds"]
    state = inputs.copy()

    beginning = []
    init_c = k["initial_constants"]
    for r in range(HALF_FULL // 2):
        state = _full_2_rounds(state, init_c[2 * r], init_c[2 * r + 1], mds)
        beginning.append(state.copy())

    state = nf.add(state, k["first_round_constants"][None, :])
    state = nf.mul_mat(state, k["m_i"])

    partial_cols = []
    for r in range(PARTIAL):
        s0 = _cube(state[:, 0])
        partial_cols.append(s0.copy())
        if r < PARTIAL - 1:
            s0 = nf.add(s0, np.uint32(k["scalar_round_constants"][r]))
        state = state.copy()
        state[:, 0] = s0
        old_s0 = s0
        new_s0 = nf.sum_mod(nf.mul(state, k["first_rows"][r][None, :]), axis=1)
        rest = nf.add(state[:, 1:], nf.mul(old_s0[:, None], k["v"][r][None, :15]))
        state = np.concatenate([new_s0[:, None], rest], axis=1)

    ending = []
    fin_c = k["final_constants"]
    for r in range(HALF_FULL // 2 - 1):
        state = _full_2_rounds(state, fin_c[2 * r], fin_c[2 * r + 1], mds)
        ending.append(state.copy())

    last = HALF_FULL // 2 - 1
    state = _full_2_rounds(state, fin_c[2 * last], fin_c[2 * last + 1], mds)

    fp = flag_permute.astype(np.uint32)
    not_fp = (1 - fp).astype(np.uint32)
    compression = nf.add(state[:, :8], inputs[:, :8])
    outputs_left = nf.add(nf.mul(not_fp[:, None], compression),
                          nf.mul(fp[:, None], state[:, :8]))
    outputs_right = nf.mul(fp[:, None], state[:, 8:])

    return {
        "beginning_full_rounds": np.stack(beginning),
        "partial_rounds": np.stack(partial_cols),
        "ending_full_rounds": np.stack(ending),
        "outputs_left": outputs_left,
        "outputs_right": outputs_right,
    }
