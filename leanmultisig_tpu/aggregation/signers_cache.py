"""Signers disk cache as a plain .npz of key arrays.

Replaces the earlier pickle cache: a repo-shipped binary must not be
able to execute code on load (np.load with allow_pickle=False only
reads raw arrays). Layout per signer i:
  s{i}_meta  -> [slot_start, slot_end, n_merkle_levels] (int64)
  s{i}_pp    -> (4,) public_param
  s{i}_seed  -> (k,) uint8 keygen seed bytes
  s{i}_mt{l} -> level-l merkle node array
"""

from __future__ import annotations

import numpy as np


def save_signers(path: str, signers: list) -> None:
    import os
    arrays = {"n": np.array([len(signers)], np.int64)}
    for i, (sk, _pk) in enumerate(signers):
        arrays[f"s{i}_meta"] = np.array(
            [sk.slot_start, sk.slot_end, len(sk.merkle_tree)], np.int64)
        arrays[f"s{i}_pp"] = np.asarray(sk.public_param)
        arrays[f"s{i}_seed"] = np.frombuffer(sk.seed, np.uint8)
        for lvl, nodes in enumerate(sk.merkle_tree):
            arrays[f"s{i}_mt{lvl}"] = np.asarray(nodes)
    tmp = f"{path}.tmp.{os.getpid()}"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_signers(path: str, limit: int | None = None) -> list:
    """First min(limit, stored) signers; the whole file when limit=None.

    The cache accretes to the largest regime ever run (ref-regime: 1550
    signers); a 70-signer bench must not pay 1550 decompress+reconstructs
    (measured: 52 s full load vs ~2 s for the first 70)."""
    from ..xmss.scheme import XmssSecretKey
    out = []
    try:
        with np.load(path, allow_pickle=False) as z:
            n = int(z["n"][0])
            if limit is not None:
                n = min(n, limit)
            for i in range(n):
                meta = z[f"s{i}_meta"]
                sk = XmssSecretKey(
                    slot_start=int(meta[0]), slot_end=int(meta[1]),
                    public_param=z[f"s{i}_pp"],
                    seed=z[f"s{i}_seed"].tobytes(),
                    merkle_tree=[z[f"s{i}_mt{lvl}"]
                                 for lvl in range(int(meta[2]))])
                out.append((sk, sk.public_key()))
    except (OSError, KeyError, ValueError):
        return []
    return out
