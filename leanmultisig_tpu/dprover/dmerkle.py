"""Device-resident WHIR Merkle tree (Montgomery form).

Leaf matrix sponge-hashing (right-to-left absorption, sponge.rs:7-26),
binary digest-layer reduction, and query opening all run as device ops;
the tree's digest layers stay resident on device for the opening gathers.
Openings return CANONICAL device arrays (leaf rows, sibling stacks,
indices) for the single end-of-proof fetch.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

EXT = 5
RATE = 8
WIDTH = 16
DIGEST = 8


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.cache
def _leaf_hash_fn(width: int):
    jax, jnp = _jax()
    from ..poseidon import perm
    n_chunks = width // RATE

    @aot_jit
    def leaf_hash(rows):
        state = rows[:, width - WIDTH:]
        state = perm.compress(state)
        if n_chunks > 3:
            # scan over the remaining chunks right-to-left (compile-light)
            chunks = jnp.stack(
                [rows[:, ci * RATE:(ci + 1) * RATE]
                 for ci in range(n_chunks - 3, -1, -1)])

            def body(st, chunk):
                st = jnp.concatenate([st[:, :DIGEST], chunk], axis=1)
                return perm.compress(st), None

            state, _ = jax.lax.scan(body, state, chunks)
        elif n_chunks == 3:
            chunk = rows[:, 0:RATE]
            state = jnp.concatenate([state[:, :DIGEST], chunk], axis=1)
            state = perm.compress(state)
        return state[:, :DIGEST]

    return leaf_hash


@functools.cache
def _tree_fn(log_n: int):
    jax, jnp = _jax()
    from ..poseidon import perm

    @aot_jit
    def reduce_tree(digests):
        layers = [digests]
        cur = digests
        for _ in range(log_n):
            pairs = cur.reshape(-1, WIDTH)
            cur = perm.compress(pairs)[:, :DIGEST]
            layers.append(cur)
        return layers

    return reduce_tree


@functools.cache
def _pad_fn(shape: tuple, full_width: int):
    jax, jnp = _jax()

    @aot_jit
    def pad(base):
        h, w = base.shape
        return jnp.concatenate(
            [base, jnp.zeros((h, full_width - w), jnp.uint32)], axis=1)

    return pad


@functools.cache
def _open_fn(n_levels: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def open_(leaf_base, indices, *layers):
        rows = jnp.take(leaf_base, indices, axis=0)  # (q, W) monty
        sibs = []
        for lvl in range(n_levels):
            sib_idx = (indices >> np.uint32(lvl)) ^ np.uint32(1)
            sibs.append(jnp.take(layers[lvl], sib_idx, axis=0))
        sib_stack = (jnp.stack(sibs, axis=1) if sibs
                     else jnp.zeros((indices.shape[0], 0, DIGEST),
                                    jnp.uint32))
        return jf.to_u32(rows), jf.to_u32(sib_stack)

    return open_


class DevMerkleTree:
    """leaf: (H, W) base monty or (H, W, 5) ext monty device matrix."""

    def __init__(self, leaf, full_base_width: int):
        _, jnp = _jax()
        # note: the unpadded leaf matrix is NOT retained (self.base, the
        # padded flat copy, serves all opens) — keeping both doubled the
        # per-tree HBM residency
        self.is_ext = leaf.ndim == 3
        base = leaf.reshape(leaf.shape[0], -1)
        eff_w = base.shape[1]
        assert full_base_width >= eff_w and full_base_width % 8 == 0
        assert full_base_width >= 16
        if full_base_width > eff_w:
            base = _pad_fn(tuple(base.shape), full_base_width)(base)
        self.base = base  # (H, full_width) monty
        self.full_base_width = full_base_width
        digests = _leaf_hash_fn(full_base_width)(base)
        log_n = base.shape[0].bit_length() - 1
        self.layers = _tree_fn(log_n)(digests)  # list, layers[0]=leaf digests
        self.log_n = log_n

    def root_monty(self):
        return self.layers[-1][0]

    def open_many(self, indices):
        """indices: (q,) uint32 device -> (leaf_rows (q, W) canonical,
        sibs (q, log_n, 8) canonical)."""
        return _open_fn(self.log_n)(self.base, indices,
                                    *self.layers[:self.log_n])
