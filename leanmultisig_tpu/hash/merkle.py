"""Binary Merkle tree over 8-element Poseidon digests.

Host (numpy) tree builder + verifier matching the reference semantics
(crates/backend/symetric/src/merkle.rs): digest layers only, leaf layer
supplied pre-hashed, 2-to-1 compression, `open_siblings` path extraction,
`merkle_verify` re-hashing opened leaf data with the sponge.

Device (JAX) layer-reduction for large trees lives in whir/merkle_device.py.
"""

from __future__ import annotations

import numpy as np

from . import sponge

DIGEST_ELEMS = 8


class MerkleTree:
    """digest_layers[0] = leaf digests (n, 8); last layer = root (1, 8)."""

    def __init__(self, digest_layers: list[np.ndarray]):
        self.digest_layers = digest_layers

    @classmethod
    def from_first_layer(cls, first_layer: np.ndarray) -> "MerkleTree":
        first_layer = np.asarray(first_layer, np.uint32)
        assert first_layer.ndim == 2 and first_layer.shape[1] == DIGEST_ELEMS
        layers = [first_layer]
        while layers[-1].shape[0] > 1:
            prev = layers[-1]
            n = prev.shape[0]
            assert n % 2 == 0, "non-power-of-two layer"
            layers.append(sponge.compress_pair(prev[0::2], prev[1::2]))
        return cls(layers)

    def root(self) -> np.ndarray:
        return self.digest_layers[-1][0]

    def open_siblings(self, index: int, log_height: int) -> np.ndarray:
        """(log_height, 8) sibling digests, leaf->root (merkle.rs:44-49)."""
        return np.stack(
            [self.digest_layers[i][(index >> i) ^ 1] for i in range(log_height)]
        )


def merkle_verify(commit: np.ndarray, log_height: int, index: int,
                  opened_values: np.ndarray, opening_proof: np.ndarray) -> bool:
    """Re-hash opened leaf data and walk the path (merkle.rs:92-122)."""
    if len(opening_proof) != log_height:
        return False
    root = sponge.hash_slice(np.asarray(opened_values, np.uint32))
    for sibling in np.asarray(opening_proof, np.uint32):
        if index & 1 == 0:
            left, right = root, sibling
        else:
            left, right = sibling, root
        root = sponge.compress_pair(left, right)
        index >>= 1
    return bool(np.array_equal(root, np.asarray(commit, np.uint32)))
