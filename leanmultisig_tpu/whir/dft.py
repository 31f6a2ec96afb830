"""DFT on the evaluation basis (Reed-Solomon encoding of multilinears).

Semantics mirror the reference EvalsDft (crates/whir/src/dft.rs:5-25):
given a multilinear P by its hypercube evals (big-endian index), output
index i holds P(g^i, g^(2i), g^(4i), ...) where g generates the size-N
subgroup — computed by layered "evals butterflies"
    (u, v) -> (u + (v-u)*t,  u - (v-u)*t)
with layer s in 0..log N pairing rows distance 2^s apart and twiddles
t_j = g^(j * N / 2^(s+1)).

TPU-first structure: the whole transform is a data-parallel reshape +
elementwise pass per layer (log N fused VPU passes); `reorder_and_dft`
exploits the RS-repetition structure (first log_inv_rate layers are the
identity on repeated inputs) so the working set starts at matrix shape
(2^(n-k) rows) and only expands to the full 2^(n+r-k) after layer r.
The reference instead gathers an explicit repeated matrix and runs all
layers (utils.rs:128-150); the outputs are identical.
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..field.constants import P

_TWIDDLE_CACHE: dict[int, np.ndarray] = {}


def _root_row(log_n: int) -> np.ndarray:
    """[1, g, g^2, ..., g^(n/2 - 1)] for g = two_adic_generator(log_n)."""
    if log_n in _TWIDDLE_CACHE:
        return _TWIDDLE_CACHE[log_n]
    from ..field.np_field import two_adic_generator
    g = two_adic_generator(log_n)
    half = 1 << (log_n - 1)
    out = np.empty(half, np.uint32)
    acc = 1
    for i in range(half):
        out[i] = acc
        acc = (acc * g) % P
    _TWIDDLE_CACHE[log_n] = out
    return out


def twiddles_for_layer(log_n: int, s: int) -> np.ndarray:
    """Layer-s twiddles: g^(j * N/2^(s+1)) for j in 0..2^s."""
    row = _root_row(log_n)
    return row[:: 1 << (log_n - 1 - s)].copy() if s < log_n - 1 else row


def dft_evals(mat: np.ndarray, start_layer: int = 0) -> np.ndarray:
    """Evals-basis DFT over axis 0 of `mat` ((N, ...) base or (N, ..., 5) ext
    with base-field twiddles broadcast over trailing axes).

    `start_layer` skips the first layers (valid when rows within each
    2^start_layer block are identical — the RS-repetition case).
    """
    n = mat.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    x = np.ascontiguousarray(mat, np.uint32).copy()
    tail = x.shape[1:]

    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is not None:
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        tail_n = int(np.prod(tail)) if tail else 1
        for s in range(start_layer, log_n):
            t = np.ascontiguousarray(twiddles_for_layer(log_n, s))
            lib.dft_layer(x.ctypes.data_as(u32p), t.ctypes.data_as(u32p),
                          n, 1 << s, tail_n)
        return x

    for s in range(start_layer, log_n):
        L = 1 << s
        t = twiddles_for_layer(log_n, s)  # (L,)
        v4 = x.reshape((n >> (s + 1), 2, L) + tail)
        u = v4[:, 0]
        v = v4[:, 1]
        tb = t.reshape((1, L) + (1,) * len(tail))
        w = nf.mul(nf.sub(v, u), np.broadcast_to(tb, u.shape))
        x = np.stack([nf.add(u, w), nf.sub(u, w)], axis=1).reshape((n,) + tail)
    return x


def reorder_and_dft(evals: np.ndarray, folding_factor: int, log_inv_rate: int,
                    dft_n_cols: int) -> np.ndarray:
    """RS-encode: -> (block_size, dft_n_cols[, 5]) leaf matrix.

    Matches reference reorder_and_dft (whir/src/utils.rs:69-150):
    M[row, j] = evals[j * 2^(n-k) + (row >> r)], then per-column DFT.
    The first r layers are skipped (identity on the repeated input).
    """
    n_evals = evals.shape[0]
    log_n = n_evals.bit_length() - 1
    assert 1 << log_n == n_evals
    k = folding_factor
    r = log_inv_rate
    tail = evals.shape[1:]
    n_blocks = 1 << k
    block_size = (n_evals << r) >> k

    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is not None and hasattr(lib, "reorder_repeat"):
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        cells = int(np.prod(tail)) if tail else 1
        ev = np.ascontiguousarray(evals, np.uint32)
        mat = np.empty((block_size, dft_n_cols) + tail, np.uint32)
        lib.reorder_repeat(ev.ctypes.data_as(u32p), n_evals, k, r,
                           dft_n_cols, cells, mat.ctypes.data_as(u32p))
        return dft_evals(mat, start_layer=r)

    # columns = top-k-bit blocks of the eval table, truncated to dft_n_cols
    cols = evals.reshape((n_blocks, n_evals >> k) + tail)[:dft_n_cols]
    mat = np.moveaxis(cols, 0, 1)  # (2^(n-k), dft_n_cols, ...)
    mat = np.repeat(mat, 1 << r, axis=0)  # (block_size, dft_n_cols, ...)
    assert mat.shape[0] == block_size
    return dft_evals(mat, start_layer=r)
