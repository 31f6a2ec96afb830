"""Device (TPU) kernels for the proving hot paths.

All kernels take/return canonical uint32 numpy arrays; internally they run
in Montgomery form on jnp uint32 lanes (field.jnp_field). Each is jitted
with static shapes so XLA fuses the modular-arithmetic chains into single
VPU loops; the Poseidon MDS runs as an int32 matmul pair on the MXU
(poseidon/perm.py).

Enabled in the pipeline via `leanmultisig_tpu.device.enabled()` —
set LMS_DEVICE=1 (bench/TPU runs) or leave off for the pure-host path.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..field.constants import P, TWO_ADIC_GENERATORS


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


# ---------------------------------------------------------------------------
# PoW grinding
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _grind_fn(batch: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from ..poseidon import perm

    @aot_jit
    def grind_batch(capacity_monty, base):
        # states: [capacity(8) | base+i, 0...0]
        idx = base + jnp.arange(batch, dtype=jnp.uint32)
        states = jnp.zeros((batch, 16), jnp.uint32)
        states = states.at[:, :8].set(capacity_monty[None, :])
        states = states.at[:, 8].set(jf.from_u32(idx))
        out = perm.permute(states)
        return jf.to_u32(out[:, 8])

    return grind_batch


def grind(capacity: np.ndarray, bits: int, batch: int = 1 << 16) -> int:
    """Find min witness w: permute([cap | w,0..])[8] % 2^bits == 0."""
    from ..field import jnp_field as jf
    _, jnp = _jax()
    fn = _grind_fn(batch)
    cap_monty = jnp.asarray(jf.to_monty_np(capacity))
    mask = (1 << bits) - 1
    base = 0
    while base < P:
        out = np.asarray(fn(cap_monty, np.uint32(base)))
        hits = np.nonzero((out & mask) == 0)[0]
        if hits.size:
            return base + int(hits[0])
        base += batch
    raise RuntimeError("grinding failed")


# ---------------------------------------------------------------------------
# Merkle: batched leaf hashing + tree reduction
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _leaf_hash_fn(width: int):
    """Sponge hash of rows (..., width) -> (..., 8); width mult of 8, >=16.
    Right-to-left absorption (symetric/sponge.rs:7-26)."""
    jax, jnp = _jax()
    from ..poseidon import perm

    n_chunks = width // 8

    @aot_jit
    def leaf_hash(rows_monty):
        state = rows_monty[:, width - 16:]
        state = perm.compress(state)
        for chunk_idx in range(n_chunks - 3, -1, -1):
            chunk = rows_monty[:, chunk_idx * 8:(chunk_idx + 1) * 8]
            state = jnp.concatenate([state[:, :8], chunk], axis=1)
            state = perm.compress(state)
        return state[:, :8]

    return leaf_hash


@functools.lru_cache(maxsize=32)
def _tree_fn(log_n: int):
    jax, jnp = _jax()
    from ..poseidon import perm

    @aot_jit
    def reduce_tree(digests_monty):
        layers = []
        cur = digests_monty
        for _ in range(log_n):
            pairs = cur.reshape(-1, 16)
            cur = perm.compress(pairs)[:, :8]
            layers.append(cur)
        return layers

    return reduce_tree


def merkle_build(leaf_base: np.ndarray, full_width: int):
    """leaf_base: (H, eff_w) canonical -> list of digest layers (canonical),
    layer 0 = leaf digests."""
    from ..field import jnp_field as jf
    _, jnp = _jax()
    h, eff_w = leaf_base.shape
    if full_width > eff_w:
        leaf_base = np.concatenate(
            [leaf_base, np.zeros((h, full_width - eff_w), np.uint32)], axis=1)
    rows_m = jnp.asarray(jf.to_monty_np(leaf_base))
    digests_m = _leaf_hash_fn(full_width)(rows_m)
    log_n = h.bit_length() - 1
    upper_m = _tree_fn(log_n)(digests_m) if log_n else []
    layers = [jf.from_monty_np(np.asarray(digests_m))]
    for lm in upper_m:
        layers.append(jf.from_monty_np(np.asarray(lm)))
    return layers


# ---------------------------------------------------------------------------
# Evals-basis DFT (Reed-Solomon encoding)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _dft_fn(log_n: int, start_layer: int, tail: tuple):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    n = 1 << log_n

    @aot_jit
    def dft(x_monty, *twiddles_monty):
        x = x_monty
        for li, s in enumerate(range(start_layer, log_n)):
            L = 1 << s
            t = twiddles_monty[li]
            v4 = x.reshape((n >> (s + 1), 2, L) + tail)
            u = v4[:, 0]
            v = v4[:, 1]
            tb = t.reshape((1, L) + (1,) * len(tail))
            w = jf.mul(jf.sub(v, u), jnp.broadcast_to(tb, u.shape))
            x = jnp.stack([jf.add(u, w), jf.sub(u, w)], axis=1).reshape(
                (n,) + tail)
        return x

    return dft


@functools.lru_cache(maxsize=32)
def _twiddles_monty(log_n: int, start_layer: int):
    from ..field import jnp_field as jf
    from ..whir.dft import twiddles_for_layer
    return tuple(jf.to_monty_np(twiddles_for_layer(log_n, s))
                 for s in range(start_layer, log_n))


def dft_evals(mat: np.ndarray, start_layer: int = 0) -> np.ndarray:
    """Device evals-basis DFT over axis 0 (same semantics as whir.dft)."""
    from ..field import jnp_field as jf
    _, jnp = _jax()
    n = mat.shape[0]
    log_n = n.bit_length() - 1
    tail = tuple(mat.shape[1:])
    tw = _twiddles_monty(log_n, start_layer)
    fn = _dft_fn(log_n, start_layer, tail)
    out_m = fn(jnp.asarray(jf.to_monty_np(mat)),
               *[jnp.asarray(t) for t in tw])
    return jf.from_monty_np(np.asarray(out_m))


def reorder_and_dft(evals: np.ndarray, folding_factor: int, log_inv_rate: int,
                    dft_n_cols: int) -> np.ndarray:
    """Device RS encoding (same output as whir.dft.reorder_and_dft)."""
    n_evals = evals.shape[0]
    k, r = folding_factor, log_inv_rate
    tail = evals.shape[1:]
    n_blocks = 1 << k
    cols = evals.reshape((n_blocks, n_evals >> k) + tail)[:dft_n_cols]
    mat = np.moveaxis(cols, 0, 1)
    mat = np.repeat(mat, 1 << r, axis=0)
    return dft_evals(mat, start_layer=r)
