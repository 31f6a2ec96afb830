"""WHIR Merkle commitment over RS-encoded leaf matrices.

Mirrors crates/whir/src/merkle.rs: leaf rows (base-flattened, zero-padded
to the full column width) are sponge-hashed right-to-left into 8-element
digests, then reduced by the binary Poseidon compression tree. Host path
is numpy-batched over rows (the device path batches the same schedule on
TPU via poseidon.perm).
"""

from __future__ import annotations

import numpy as np

from ..hash import merkle as hmerkle
from ..hash import sponge

EXT_DIM = 5
DIGEST_ELEMS = 8


class WhirMerkleTree:
    """leaf: (H, W) base or (H, W, 5) ext matrix; full_base_width includes
    the implicit zero-column suffix (merkle.rs:156-212)."""

    def __init__(self, leaf: np.ndarray, full_base_width: int):
        self.leaf = np.asarray(leaf, np.uint32)
        self.is_ext = self.leaf.ndim == 3
        base = self.leaf.reshape(self.leaf.shape[0], -1)
        eff_w = base.shape[1]
        assert full_base_width >= eff_w and full_base_width % 8 == 0
        assert full_base_width >= 16
        if full_base_width > eff_w:
            base = np.concatenate(
                [base, np.zeros((base.shape[0], full_base_width - eff_w),
                                np.uint32)], axis=1)
        self.full_base_width = full_base_width
        from ..device import enabled as device_enabled
        if device_enabled() and base.shape[0] >= 64:
            from ..device.kernels import merkle_build
            layers = merkle_build(base[:, :eff_w], full_base_width)
            self.tree = hmerkle.MerkleTree(layers)
        else:
            digests = sponge.hash_slice(base)  # batched over rows
            self.tree = hmerkle.MerkleTree.from_first_layer(digests)

    def root(self) -> np.ndarray:
        return self.tree.root()

    def log_height(self) -> int:
        return self.leaf.shape[0].bit_length() - 1

    def open(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (leaf base data padded to full width, sibling digests)."""
        row = self.leaf[index].reshape(-1)
        if self.full_base_width > len(row):
            row = np.concatenate(
                [row, np.zeros(self.full_base_width - len(row), np.uint32)])
        return row, self.tree.open_siblings(index, self.log_height())


def leaf_to_values(leaf_base: np.ndarray, is_ext: bool) -> np.ndarray:
    """Opened base data -> (W,) base or (W, 5) ext values."""
    leaf_base = np.asarray(leaf_base, np.uint32)
    if is_ext:
        assert len(leaf_base) % EXT_DIM == 0
        return leaf_base.reshape(-1, EXT_DIM)
    return leaf_base


def whir_merkle_verify(root: np.ndarray, height_log: int, index: int,
                       leaf_base: np.ndarray, siblings: np.ndarray) -> bool:
    """(merkle.rs:115-153): re-hash the full-width leaf row + walk path."""
    return hmerkle.merkle_verify(root, height_log, index, leaf_base, siblings)
