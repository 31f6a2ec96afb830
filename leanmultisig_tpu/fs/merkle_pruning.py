"""Merkle path pruning: proof-size optimization for batched openings.

Matches the reference format (fiat-shamir/src/merkle_pruning.rs:6-170):
paths are sorted by leaf index, deduped, sibling hashes above the LCA with
the *previous* path are dropped, one additional sibling (the LCA-1 level
with the *next* path) is skipped because it is recomputable, and all-zero
leaf-data suffixes are stripped (n_trailing_zeros).

`restore` rebuilds the full openings by recomputing interior hashes —
the verifier-side consumption path.
"""

from __future__ import annotations

import numpy as np

from ..hash import sponge
from .prover import MerklePath

DIGEST = 8


def _lca_level(a: int, b: int) -> int:
    return (a ^ b).bit_length()


class PrunedMerklePaths:
    def __init__(self, merkle_height: int, original_order: list[int],
                 leaf_data: list[np.ndarray],
                 paths: list[tuple[int, list[np.ndarray]]],
                 n_trailing_zeros: int):
        self.merkle_height = merkle_height
        self.original_order = original_order
        self.leaf_data = leaf_data
        self.paths = paths
        self.n_trailing_zeros = n_trailing_zeros

    def size_fe(self) -> int:
        return (sum(len(d) for d in self.leaf_data)
                + sum(len(s) * DIGEST for _, s in self.paths))


def prune(path_list: list[MerklePath]) -> PrunedMerklePaths:
    assert path_list
    merkle_height = len(path_list[0].sibling_hashes)

    indexed = sorted(enumerate(path_list), key=lambda t: t[1].leaf_index)
    original_order = [0] * len(indexed)
    deduped: list[MerklePath] = []
    for orig_idx, path in indexed:
        if deduped and deduped[-1].leaf_index == path.leaf_index:
            original_order[orig_idx] = len(deduped) - 1
        else:
            original_order[orig_idx] = len(deduped)
            deduped.append(path)

    leaf_len = len(deduped[0].leaf_data)
    n_trailing_zeros = 0
    for offset in range(leaf_len - 1, -1, -1):
        if any(int(p.leaf_data[offset]) != 0 for p in deduped):
            break
        n_trailing_zeros += 1

    paths = []
    for i, path in enumerate(deduped):
        leaf_idx = path.leaf_index
        levels = (merkle_height if i == 0
                  else _lca_level(deduped[i - 1].leaf_index, leaf_idx))
        skip = (_lca_level(leaf_idx, deduped[i + 1].leaf_index) - 1
                if i + 1 < len(deduped) else None)
        siblings = [np.asarray(path.sibling_hashes[lvl], np.uint32)
                    for lvl in range(levels) if lvl != skip]
        paths.append((leaf_idx, siblings))

    leaf_data = [np.asarray(p.leaf_data[:leaf_len - n_trailing_zeros],
                            np.uint32) for p in deduped]
    return PrunedMerklePaths(merkle_height, original_order, leaf_data, paths,
                             n_trailing_zeros)


def restore(pruned: PrunedMerklePaths) -> list[MerklePath] | None:
    """Rebuild full openings, recomputing skipped interior hashes.

    Hash functions are the Poseidon sponge leaf hash + 2-to-1 compression
    (verifier.rs:70-90)."""
    n = len(pruned.paths)
    h = pruned.merkle_height
    if h >= 32 or pruned.n_trailing_zeros > 1024:
        return None

    leaf_data = [np.concatenate([d, np.zeros(pruned.n_trailing_zeros, np.uint32)])
                 for d in pruned.leaf_data]

    def levels(i: int) -> int:
        return h if i == 0 else _lca_level(pruned.paths[i - 1][0],
                                           pruned.paths[i][0])

    def skip(i: int):
        if i + 1 < n:
            return _lca_level(pruned.paths[i][0], pruned.paths[i + 1][0]) - 1
        return None

    # backward pass: subtree hashes for skipped-sibling restoration
    subtree: list[list[np.ndarray]] = [[] for _ in range(n)]
    for i in range(n - 1, -1, -1):
        leaf_idx, stored = pruned.paths[i]
        if leaf_idx >= (1 << h):
            return None
        it = iter(stored)
        cur = sponge.hash_slice(leaf_data[i])
        subtree[i].append(cur)
        for lvl in range(levels(i)):
            if skip(i) == lvl:
                nxt = subtree[i + 1]
                if lvl >= len(nxt):
                    return None
                sib = nxt[lvl]
            else:
                sib = next(it, None)
                if sib is None:
                    return None
            if (leaf_idx >> lvl) & 1 == 0:
                cur = sponge.compress_pair(cur, sib)
            else:
                cur = sponge.compress_pair(sib, cur)
            subtree[i].append(cur)

    # forward pass: full sibling arrays
    restored: list[MerklePath] = []
    for i in range(n):
        leaf_idx, stored = pruned.paths[i]
        it = iter(stored)
        siblings: list[np.ndarray] = []
        for lvl in range(levels(i)):
            if skip(i) == lvl:
                siblings.append(subtree[i + 1][lvl])
            else:
                sib = next(it, None)
                if sib is None:
                    return None
                siblings.append(sib)
        if restored:
            prev = restored[-1].sibling_hashes
            if levels(i) > len(prev):
                return None
            siblings.extend(list(prev[levels(i):]))
        restored.append(MerklePath(leaf_data[i],
                                   np.stack(siblings) if siblings else
                                   np.zeros((0, DIGEST), np.uint32),
                                   leaf_idx))

    return [restored[idx] for idx in pruned.original_order]
