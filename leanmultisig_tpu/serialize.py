"""Proof (de)serialization: compact little-endian binary + zlib.

Analog of the reference's postcard+lz4 proof artifacts
(rec_aggregation/type_1_aggregation.rs:81-89); zlib replaces lz4 (the
only codec in the stdlib) behind the same serialize/deserialize surface.

Format (after decompression), all u32 little-endian unless noted:
  magic "LMSP" | version u32 | transcript_len u32 | transcript u32[*]
  | n_groups u32 | per group:
      merkle_height u32 | n_trailing_zeros u32
      | n_order u32 | original_order u32[*]
      | n_leaves u32 | per leaf: len u32, data u32[*]
      | n_paths u32 | per path: index u32, n_sib u32, digests u32[n_sib*8]
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .fs.merkle_pruning import PrunedMerklePaths
from .fs.prover import Proof

MAGIC = b"LMSP"
VERSION = 1


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def u32(self, v: int):
        self.parts.append(struct.pack("<I", v))

    def arr(self, a: np.ndarray):
        self.parts.append(np.ascontiguousarray(a, np.uint32)
                          .astype("<u4").tobytes())

    def bytes(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def arr(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.buf, dtype="<u4", count=n,
                            offset=self.off).astype(np.uint32)
        self.off += 4 * n
        return out


def proof_to_bytes(proof: Proof, level: int = 6) -> bytes:
    w = _Writer()
    w.parts.append(MAGIC)
    w.u32(VERSION)
    w.u32(len(proof.transcript))
    w.arr(proof.transcript)
    w.u32(len(proof.merkle_paths))
    for g in proof.merkle_paths:
        w.u32(g.merkle_height)
        w.u32(g.n_trailing_zeros)
        w.u32(len(g.original_order))
        w.arr(np.asarray(g.original_order, np.uint32))
        w.u32(len(g.leaf_data))
        for leaf in g.leaf_data:
            w.u32(len(leaf))
            w.arr(leaf)
        w.u32(len(g.paths))
        for index, sibs in g.paths:
            w.u32(index)
            w.u32(len(sibs))
            for s in sibs:
                w.arr(s)
    return zlib.compress(w.bytes(), level)


def proof_from_bytes(data: bytes) -> Proof:
    r = _Reader(zlib.decompress(data))
    assert r.buf[:4] == MAGIC, "bad proof magic"
    r.off = 4
    version = r.u32()
    assert version == VERSION, f"unsupported proof version {version}"
    tlen = r.u32()
    transcript = r.arr(tlen)
    groups = []
    for _ in range(r.u32()):
        height = r.u32()
        n_tz = r.u32()
        order = [r.u32() for _ in range(r.u32())]
        leaves = []
        for _ in range(r.u32()):
            leaves.append(r.arr(r.u32()))
        paths = []
        for _ in range(r.u32()):
            index = r.u32()
            n_sib = r.u32()
            paths.append((index, [r.arr(8) for _ in range(n_sib)]))
        groups.append(PrunedMerklePaths(height, order, leaves, paths, n_tz))
    return Proof(transcript, groups)
