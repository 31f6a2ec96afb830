"""Device-resident evals-basis DFT (RS encoding) in Montgomery form.

Same semantics as whir/dft.py (reference crates/whir/src/dft.rs) but the
input is already a monty device array and the output stays on device —
no host round trips. Twiddle tables are uploaded once per (log_n, layer)
and cached as device arrays.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=128)
def _twiddles_dev(log_n: int, s: int):
    _, jnp = _jax()
    from ..field import jnp_field as jf
    from ..whir.dft import twiddles_for_layer
    return jnp.asarray(jf.to_monty_np(twiddles_for_layer(log_n, s)))


@functools.cache
def _dft_fn(log_n: int, start_layer: int, tail: tuple):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    n = 1 << log_n

    @aot_jit
    def dft(x, *twiddles):
        for li, s in enumerate(range(start_layer, log_n)):
            length = 1 << s
            t = twiddles[li]
            v4 = x.reshape((n >> (s + 1), 2, length) + tail)
            u = v4[:, 0]
            v = v4[:, 1]
            tb = t.reshape((1, length) + (1,) * len(tail))
            w = jf.mul(jf.sub(v, u), jnp.broadcast_to(tb, u.shape))
            x = jnp.stack([jf.add(u, w), jf.sub(u, w)], axis=1).reshape(
                (n,) + tail)
        return x

    return dft


def dft_evals_dev(mat, start_layer: int = 0):
    """Evals-basis DFT over axis 0 of a monty device array."""
    n = mat.shape[0]
    log_n = n.bit_length() - 1
    tail = tuple(mat.shape[1:])
    tw = [_twiddles_dev(log_n, s) for s in range(start_layer, log_n)]
    return _dft_fn(log_n, start_layer, tail)(mat, *tw)


@functools.cache
def _reorder_fn(shape: tuple, k: int, r: int, dft_n_cols: int):
    jax, jnp = _jax()

    @aot_jit
    def reorder(evals):
        n_evals = evals.shape[0]
        tail = evals.shape[1:]
        n_blocks = 1 << k
        cols = evals.reshape((n_blocks, n_evals >> k) + tail)[:dft_n_cols]
        mat = jnp.moveaxis(cols, 0, 1)
        mat = jnp.repeat(mat, 1 << r, axis=0)
        return mat

    return reorder


def reorder_and_dft_dev(evals, folding_factor: int, log_inv_rate: int,
                        dft_n_cols: int):
    """RS-encode a monty device eval table -> (block_size, dft_n_cols[,5])
    monty device leaf matrix (whir/src/utils.rs:69-150 semantics)."""
    mat = _reorder_fn(tuple(evals.shape), folding_factor, log_inv_rate,
                      dft_n_cols)(evals)
    return dft_evals_dev(mat, start_layer=log_inv_rate)
