"""XMSS signature scheme: ranged-lifetime keygen, sign, verify.

Protocol semantics mirror the reference (crates/xmss/src/{wots,xmss}.rs):
target-sum WOTS encoding via randomness grinding, chain walking with
per-step tweaks, T-sponge public-key hash, Merkle walk over the 2^32
lifetime with PRF digests for out-of-range nodes.

TPU-first structure: keygen/verification batch ALL chains of ALL slots
into single (N, 16) Poseidon compressions (here numpy-batched; the same
arrays feed the device kernels).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..field.constants import P
from ..poseidon import np_poseidon as npp
from .core import (CHAIN_LENGTH, LOG_LIFETIME, MESSAGE_LEN_FE,
                   PUBLIC_PARAM_LEN_FE, RANDOMNESS_LEN_FE, TARGET_SUM,
                   TWEAK_TYPE_CHAIN, TWEAK_TYPE_ENCODING, TWEAK_TYPE_MERKLE,
                   TWEAK_TYPE_WOTS_PK, V, W, XMSS_DIGEST_LEN,
                   build_chain_inputs, build_merkle_data, make_tweak)


def _compress(x: np.ndarray) -> np.ndarray:
    return npp.compress(x)[..., :8]


def _prf_fields(seed: bytes, label: bytes, n: int, *args) -> np.ndarray:
    """Deterministic field elements from a seed (implementation detail —
    the reference uses Keccak-seeded StdRng, xmss.rs:41-66)."""
    h = hashlib.sha3_256()
    h.update(label)
    h.update(seed)
    for a in args:
        h.update(int(a).to_bytes(8, "little"))
    rng = np.random.default_rng(np.frombuffer(h.digest(), np.uint64))
    return rng.integers(0, P, size=n, dtype=np.uint32)


@dataclass
class XmssPublicKey:
    merkle_root: np.ndarray  # (4,)
    public_param: np.ndarray  # (4,)

    def flatten(self) -> np.ndarray:
        return np.concatenate([self.merkle_root, self.public_param])


@dataclass
class XmssSignature:
    chain_tips: np.ndarray  # (V, 4)
    randomness: np.ndarray  # (6,)
    merkle_proof: np.ndarray  # (LOG_LIFETIME, 4)


@dataclass
class XmssSecretKey:
    slot_start: int
    slot_end: int
    public_param: np.ndarray
    seed: bytes
    merkle_tree: list  # level -> (n_level, 4)

    def public_key(self) -> XmssPublicKey:
        return XmssPublicKey(self.merkle_tree[-1][0], self.public_param)


def _gen_pre_images(seed: bytes, slots: np.ndarray) -> np.ndarray:
    """(n_slots, V, 4) WOTS chain pre-images."""
    return np.stack([
        _prf_fields(seed, b"wots_secret_key", V * XMSS_DIGEST_LEN, s)
        .reshape(V, XMSS_DIGEST_LEN) for s in slots])


def _gen_random_node(seed: bytes, level: int, index: int) -> np.ndarray:
    return _prf_fields(seed, b"random_node", XMSS_DIGEST_LEN, level, index)


def chain_steps_batched(values: np.ndarray, start_steps: np.ndarray,
                        n_steps: np.ndarray, slots: np.ndarray,
                        chain_idx: np.ndarray, public_param: np.ndarray
                        ) -> np.ndarray:
    """Walk hash chains in lockstep with per-row step counts.

    values: (N, 4); all args (N,) — rows still walking are batched into one
    Poseidon call per global step (wots.rs:117-134 semantics)."""
    values = values.copy()
    max_steps = int(n_steps.max()) if n_steps.size else 0
    for j in range(max_steps):
        active = j < n_steps
        if not active.any():
            break
        sub = chain_idx[active] * CHAIN_LENGTH + start_steps[active] + j
        tweak = make_tweak(TWEAK_TYPE_CHAIN, sub, slots[active])
        inp = build_chain_inputs(tweak, values[active], public_param)
        values[active] = _compress(inp)[..., :XMSS_DIGEST_LEN]
    return values


def wots_public_keys_batched(pre_images: np.ndarray, slots: np.ndarray,
                             public_param: np.ndarray) -> np.ndarray:
    """(n, V, 4) pre-images -> (n, V, 4) chain tips (full walks)."""
    n = pre_images.shape[0]
    flat = pre_images.reshape(n * V, XMSS_DIGEST_LEN)
    slots_f = np.repeat(slots, V)
    chain_f = np.tile(np.arange(V, dtype=np.uint64), n)
    steps = np.full(n * V, CHAIN_LENGTH - 1, np.int64)
    out = chain_steps_batched(flat, np.zeros(n * V, np.uint64), steps,
                              slots_f, chain_f, public_param)
    return out.reshape(n, V, XMSS_DIGEST_LEN)


def wots_pk_hash_batched(chain_tips: np.ndarray, slots: np.ndarray,
                         public_param: np.ndarray) -> np.ndarray:
    """T-sponge with replacement (wots.rs:94-115). -> (n, 4)."""
    n = chain_tips.shape[0]
    state = np.zeros((n, 8), np.uint32)
    state[:, :2] = make_tweak(TWEAK_TYPE_WOTS_PK, np.zeros(n, np.uint64),
                              slots)
    state[:, 4:8] = public_param
    zeros = np.zeros((n, 8), np.uint32)
    state = _compress(np.concatenate([state, zeros], axis=1))
    for i in range(0, V, 2):
        chunk = np.concatenate([chain_tips[:, i], chain_tips[:, i + 1]],
                               axis=1)
        state = _compress(np.concatenate([state, chunk], axis=1))
    return state[:, :XMSS_DIGEST_LEN]


def wots_encode(message: np.ndarray, slot: int, pub_key: XmssPublicKey,
                randomness: np.ndarray) -> np.ndarray | None:
    """(wots.rs:152-186): two compresses -> 8x24-bit LE bits -> 3-bit limbs;
    reject -1 elements (uniformity) and non-target sums."""
    first_right = np.zeros(8, np.uint32)
    first_right[:RANDOMNESS_LEN_FE] = randomness
    first_right[RANDOMNESS_LEN_FE:RANDOMNESS_LEN_FE + 2] = \
        make_tweak(TWEAK_TYPE_ENCODING, 0, slot)
    pre = _compress(np.concatenate([np.asarray(message, np.uint32),
                                    first_right]))
    second_right = np.zeros(8, np.uint32)
    second_right[:PUBLIC_PARAM_LEN_FE] = pub_key.public_param
    compressed = _compress(np.concatenate([pre, second_right]))
    if np.any(compressed == P - 1):
        return None
    bits = []
    for kb in compressed:
        v = int(kb)
        bits.extend((v >> b) & 1 for b in range(24))
    encoding = []
    for c in range(V):
        chunk = bits[c * W:(c + 1) * W]
        encoding.append(sum(b << i for i, b in enumerate(chunk)))
    if any(e >= CHAIN_LENGTH for e in encoding):
        return None
    if sum(encoding) != TARGET_SUM:
        return None
    return np.array(encoding, np.int64)


def xmss_key_gen(seed: bytes, slot_start: int, slot_end: int
                 ) -> tuple[XmssSecretKey, XmssPublicKey]:
    """(xmss.rs:75-140): ranged keygen; out-of-range nodes are PRF digests."""
    assert slot_start <= slot_end < (1 << LOG_LIFETIME)
    public_param = _prf_fields(seed, b"public_param", PUBLIC_PARAM_LEN_FE)
    slots = np.arange(slot_start, slot_end + 1, dtype=np.uint64)
    pre_images = _gen_pre_images(seed, slots)
    tips = wots_public_keys_batched(pre_images, slots, public_param)
    leaves = wots_pk_hash_batched(tips, slots, public_param)

    merkle_tree = [leaves]
    for level in range(1, LOG_LIFETIME + 1):
        base = slot_start >> level
        top = slot_end >> level
        prev_base = slot_start >> (level - 1)
        prev_top = slot_end >> (level - 1)
        prev = merkle_tree[level - 1]
        n_nodes = top - base + 1
        lefts = np.zeros((n_nodes, XMSS_DIGEST_LEN), np.uint32)
        rights = np.zeros((n_nodes, XMSS_DIGEST_LEN), np.uint32)
        for k, i in enumerate(range(base, top + 1)):
            li, ri = 2 * i, 2 * i + 1
            lefts[k] = (prev[li - prev_base] if prev_base <= li <= prev_top
                        else _gen_random_node(seed, level - 1, li))
            rights[k] = (prev[ri - prev_base] if prev_base <= ri <= prev_top
                         else _gen_random_node(seed, level - 1, ri))
        tweaks = make_tweak(TWEAK_TYPE_MERKLE, np.full(n_nodes, level,
                                                       np.uint64),
                            np.arange(base, top + 1, dtype=np.uint64))
        data = build_merkle_data(tweaks, public_param, lefts, rights)
        merkle_tree.append(_compress(data)[..., :XMSS_DIGEST_LEN])

    sk = XmssSecretKey(slot_start, slot_end, public_param, seed, merkle_tree)
    return sk, sk.public_key()


def xmss_sign(secret_key: XmssSecretKey, message: np.ndarray, slot: int,
              rng=None) -> XmssSignature:
    """(xmss.rs:147-184)"""
    assert secret_key.slot_start <= slot <= secret_key.slot_end
    if rng is None:
        rng = np.random.default_rng()
    pub_key = secret_key.public_key()
    while True:
        randomness = rng.integers(0, P, size=RANDOMNESS_LEN_FE,
                                  dtype=np.uint32)
        encoding = wots_encode(message, slot, pub_key, randomness)
        if encoding is not None:
            break

    pre_images = _gen_pre_images(secret_key.seed,
                                 np.array([slot], np.uint64))[0]
    chain_idx = np.arange(V, dtype=np.uint64)
    tips = chain_steps_batched(
        pre_images, np.zeros(V, np.uint64), encoding,
        np.full(V, slot, np.uint64), chain_idx, secret_key.public_param)

    merkle_proof = np.zeros((LOG_LIFETIME, XMSS_DIGEST_LEN), np.uint32)
    for level in range(LOG_LIFETIME):
        neighbour = (slot >> level) ^ 1
        base = secret_key.slot_start >> level
        top = secret_key.slot_end >> level
        if base <= neighbour <= top:
            merkle_proof[level] = secret_key.merkle_tree[level][neighbour - base]
        else:
            merkle_proof[level] = _gen_random_node(secret_key.seed, level,
                                                   neighbour)
    return XmssSignature(tips, randomness, merkle_proof)


def xmss_verify(pub_key: XmssPublicKey, message: np.ndarray,
                signature: XmssSignature, slot: int) -> bool:
    """(xmss.rs:201-236)"""
    encoding = wots_encode(message, slot, pub_key, signature.randomness)
    if encoding is None:
        return False
    chain_idx = np.arange(V, dtype=np.uint64)
    remaining = (CHAIN_LENGTH - 1) - encoding
    recovered = chain_steps_batched(
        signature.chain_tips, encoding.astype(np.uint64), remaining,
        np.full(V, slot, np.uint64), chain_idx, pub_key.public_param)
    current = wots_pk_hash_batched(recovered[None], np.array([slot],
                                                             np.uint64),
                                   pub_key.public_param)[0]
    if signature.merkle_proof.shape[0] != LOG_LIFETIME:
        return False
    for level in range(LOG_LIFETIME):
        neighbour = signature.merkle_proof[level]
        is_left = ((slot >> level) & 1) == 0
        parent = slot >> (level + 1)
        left, right = ((current, neighbour) if is_left
                       else (neighbour, current))
        data = build_merkle_data(
            make_tweak(TWEAK_TYPE_MERKLE, level + 1, parent),
            pub_key.public_param, left, right)
        current = _compress(data)[:XMSS_DIGEST_LEN]
    return bool(np.array_equal(current, pub_key.merkle_root))
