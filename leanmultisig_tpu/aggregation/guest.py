"""Aggregation guest program generator: in-circuit XMSS verification.

Generates zkDSL source that verifies N_SIGS XMSS signatures inside the
zkVM — the type-1 aggregation leaf workload (reference guest:
rec_aggregation/zkdsl_implem/xmss_aggregate.py; host driver:
type_1_aggregation.rs). The bytecode is SLOT-INDEPENDENT: the slot enters
at runtime through the public input —

  * `merkle_chunks[8]`: the slot's 4-bit nibbles, dispatched per Merkle
    chunk with `match_range` over the 16 left/right patterns
    (xmss_aggregate.py:207-295, type_1_aggregation.rs:152-159);
  * `tweaks_hash[8]`: T-sponge hash of the slot's tweak table; the host
    writes the table into a fixed preamble region as a hint and the guest
    re-hashes it in-circuit (type_1_aggregation.rs:102-109), so all
    chain/Merkle tweaks stay compile-time ADDRESSES while their VALUES
    are runtime.

Public input layout: [n_sigs | message(8) | merkle_chunks(8) |
tweaks_hash(8) | per-sig: root(4) pp(4)].
Hints: "tweak_table" = the 1480-FE table once; "wots_sig" =
[randomness(6) | chain_tips(42*4)] per signature; "xmss_merkle_node" =
one 4-FE sibling per level per signature.

In-circuit checks per signature (paired-chunk design,
xmss_aggregate.py:59-110):
  * encoding re-derivation: two Poseidon compresses; 6-bit chunk
    decomposition of the 6 relevant 24-bit low parts — each chunk packs
    TWO chains' step counts (chunk_i = step_{2i} + 8*step_{2i+1});
    per-FE partial-sum recomposition with the inv(2^24) = -127 trick:
    remaining = (partial_sum - fe) * 127, assert remaining < 127
    (uniformity + overflow rejection);
  * target sum == 184, accumulated from per-pair constants;
  * chain walks per PAIR: match_range over CHAIN_LENGTH^2 = 64 variants,
    each step one `poseidon16_compress_half_hardcoded_left` against a
    tweak-table prefix;
  * WOTS pk T-sponge (22 compresses);
  * 32-level Merkle walk in 8 chunks of 4 levels via match_range over
    the public merkle_chunks nibbles; the final compress writes into the
    public root cells (write-once equality).
"""

from __future__ import annotations

from ..xmss.core import (CHAIN_LENGTH, LOG_LIFETIME, TARGET_SUM, V)

N_CHAIN_TWEAKS = V * CHAIN_LENGTH
# table: [encoding(4) | chains V*8*4 | wots_pk(4) | merkle 32*4]
TWEAK_LEN = 4
TWEAK_ENCODING_OFF = 0
TWEAK_CHAIN_OFF = TWEAK_LEN
TWEAK_WOTS_PK_OFF = TWEAK_CHAIN_OFF + N_CHAIN_TWEAKS * TWEAK_LEN
TWEAK_MERKLE_OFF = TWEAK_WOTS_PK_OFF + TWEAK_LEN
TWEAK_TABLE_SIZE = TWEAK_MERKLE_OFF + LOG_LIFETIME * TWEAK_LEN  # 1480
assert TWEAK_TABLE_SIZE % 8 == 0
N_MERKLE_CHUNKS = LOG_LIFETIME // 4
NUM_ENCODING_FE = -(-V // 8)  # 6: FE words feeding chain steps
CHUNKS_PER_FE = 4  # 24 bits / 6-bit chunks


def public_input_layout(n_sigs: int):
    """-> (total_len, msg_offset, sig_base, sig_stride)."""
    return 25 + 8 * n_sigs, 1, 25, 8


MERKLE_CHUNKS_OFF = 9
TWEAKS_HASH_OFF = 17


def preamble_layout(pub_len_padded: int):
    """Preamble: [tweak table (hint-written) 1480 | zeros 8]."""
    tweak_base = pub_len_padded
    zeros_base = tweak_base + TWEAK_TABLE_SIZE
    total = TWEAK_TABLE_SIZE + 8
    return tweak_base, zeros_base, total


def compute_tweak_table(slot: int) -> list[int]:
    """Host-side table for `slot` (compute_tweak_table,
    type_1_aggregation.rs:122-150)."""
    from ..xmss.core import (TWEAK_TYPE_CHAIN, TWEAK_TYPE_ENCODING,
                             TWEAK_TYPE_MERKLE, TWEAK_TYPE_WOTS_PK,
                             make_tweak)
    table: list[int] = []

    def push(tweak_type, sub, index):
        t = make_tweak(tweak_type, sub, index)
        table.extend([int(t[0]), int(t[1]), 0, 0])

    push(TWEAK_TYPE_ENCODING, 0, slot)
    for c in range(V):
        for s in range(CHAIN_LENGTH):
            push(TWEAK_TYPE_CHAIN, c * CHAIN_LENGTH + s, slot)
    push(TWEAK_TYPE_WOTS_PK, 0, slot)
    for level in range(LOG_LIFETIME):
        push(TWEAK_TYPE_MERKLE, level + 1, slot >> (level + 1))
    assert len(table) == TWEAK_TABLE_SIZE
    return table


def compute_merkle_chunks(slot: int) -> list[int]:
    """Public-input nibbles (compute_merkle_chunks_for_slot analog)."""
    return [(slot >> (4 * j)) & 0xF for j in range(N_MERKLE_CHUNKS)]


def compute_tweaks_hash(slot: int):
    import numpy as np
    from ..vm.poseidon_host import poseidon_compress_slice
    return poseidon_compress_slice(
        np.asarray(compute_tweak_table(slot), np.uint32), use_iv=True)


def generate_guest(n_sigs: int) -> str:
    pub_len, msg_off, sig_base, sig_stride = public_input_layout(n_sigs)
    pub_len_padded = 1 << max((pub_len - 1).bit_length(), 0)
    tweak_base, zeros_base, _ = preamble_layout(pub_len_padded)

    src = f'''
N_SIGS = {n_sigs}
V = {V}
TT = {tweak_base}
TT_CHAINS = {tweak_base + TWEAK_CHAIN_OFF}
TT_WOTS_PK = {tweak_base + TWEAK_WOTS_PK_OFF}
TT_MERKLE = {tweak_base + TWEAK_MERKLE_OFF}
TT_ENC = {tweak_base + TWEAK_ENCODING_OFF}
ZEROS8 = {zeros_base}
TARGET_SUM = {TARGET_SUM}
MC_OFF = {MERKLE_CHUNKS_OFF}
TH_OFF = {TWEAKS_HASH_OFF}

def main():
    pub = 0
    for i in unroll(0, 8):
        pub[ZEROS8 + i] = 0
    hint_witness("tweak_table", TT)
    check_tweak_table()
    for k in range(0, N_SIGS):
        verify_sig(k)
    return

def check_tweak_table():
    """T-sponge (IV mode) over the hinted table == public tweaks_hash
    (tweaks_hash binding, type_1_aggregation.rs:102-109)."""
    pub = 0
    cur: Mut = ZEROS8
    for i in unroll(0, {TWEAK_TABLE_SIZE // 8 - 1}):
        nxt = Array(8)
        poseidon16_compress(cur, TT + i * 8, nxt)
        cur = nxt
    final = Array(8)
    poseidon16_compress(cur, TT + {TWEAK_TABLE_SIZE - 8}, final)
    for i in unroll(0, 8):
        assert final[i] == pub[TH_OFF + i]
    return

def verify_sig(k):
    pub = 0
    sig_ptr = {sig_base} + k * {sig_stride}
    root = sig_ptr  # first 4: merkle root
    pp = sig_ptr + 4  # next 4: public parameter

    sig = Array({6 + V * 4})
    hint_witness("wots_sig", sig)
    rand = sig
    tips = sig + 6

    # pp_zeros = [pp(4) | 0000] (right chain input)
    pp0 = Array(8)
    for i in unroll(0, 4):
        pp0[i] = pp[i]
        pp0[i + 4] = 0

    # --- encoding re-derivation (2 compresses) ---
    first_right = Array(8)
    for i in unroll(0, 6):
        first_right[i] = rand[i]
    first_right[6] = TT_ENC[0]
    first_right[7] = TT_ENC[1]
    pre_comp = Array(8)
    poseidon16_compress({msg_off}, first_right, pre_comp)
    compressed = Array(8)
    poseidon16_compress(pre_comp, pp0, compressed)

    # --- 6-bit pair-chunk decomposition + per-FE recomposition ---
    chunks = Array({NUM_ENCODING_FE * CHUNKS_PER_FE})
    hint_decompose_bits_xmss(chunks, compressed, {NUM_ENCODING_FE}, 6)
    for i in unroll(0, {NUM_ENCODING_FE}):
        for j in unroll(0, {CHUNKS_PER_FE}):
            assert chunks[i * {CHUNKS_PER_FE} + j] <= 63
        ps0 = chunks[i * {CHUNKS_PER_FE}] + chunks[i * {CHUNKS_PER_FE} + 1] * 64
        ps1 = ps0 + chunks[i * {CHUNKS_PER_FE} + 2] * 4096
        partial = ps1 + chunks[i * {CHUNKS_PER_FE} + 3] * 262144
        # inv(2^24) = -127 mod p: remaining = (partial - fe) * 127
        remaining = (partial - compressed[i]) * 127
        assert remaining <= 126

    # --- paired chain walks -> contiguous pk buffer ---
    pk_buf = Array(V * 4)
    tsum0: Mut = 0
    for i in unroll(0, {V // 2}):
        s = match_range(chunks[i], range(0, 64),
                        lambda n: chain_pair(tips + (2 * i) * 4,
                                             pk_buf + (2 * i) * 4,
                                             pp0, i, n))
        tsum0 = tsum0 + s
    assert tsum0 == TARGET_SUM

    # --- WOTS pk T-sponge (replacement mode) ---
    state = Array(8)
    poseidon16_compress_hardcoded_left(pp, ZEROS8, state, TT_WOTS_PK)
    cur: Mut = state
    for i in unroll(0, {V // 2}):
        nxt = Array(8)
        poseidon16_compress(cur, pk_buf + i * 8, nxt)
        cur = nxt

    # --- Merkle walk: 8 chunks of 4 levels, directions from the public
    #     merkle_chunks nibbles (runtime slot) ---
    st0 = Array(4)
    match_range(pub[MC_OFF], range(0, 16),
                lambda b: do_4_merkle(cur, st0, pp, 0, b))
    st1 = Array(4)
    match_range(pub[MC_OFF + 1], range(0, 16),
                lambda b: do_4_merkle(st0, st1, pp, 1, b))
    st2 = Array(4)
    match_range(pub[MC_OFF + 2], range(0, 16),
                lambda b: do_4_merkle(st1, st2, pp, 2, b))
    st3 = Array(4)
    match_range(pub[MC_OFF + 3], range(0, 16),
                lambda b: do_4_merkle(st2, st3, pp, 3, b))
    st4 = Array(4)
    match_range(pub[MC_OFF + 4], range(0, 16),
                lambda b: do_4_merkle(st3, st4, pp, 4, b))
    st5 = Array(4)
    match_range(pub[MC_OFF + 5], range(0, 16),
                lambda b: do_4_merkle(st4, st5, pp, 5, b))
    st6 = Array(4)
    match_range(pub[MC_OFF + 6], range(0, 16),
                lambda b: do_4_merkle(st5, st6, pp, 6, b))
    # last chunk writes into the public root cells (write-once equality)
    match_range(pub[MC_OFF + 7], range(0, 16),
                lambda b: do_4_merkle(st6, root, pp, 7, b))
    return

@inline
def chain_pair(tips_a, out_a, pp0, i: Const, n: Const):
    """Walk chains 2i and 2i+1; n = step_a + 8*step_b. Returns the
    compile-time pair sum (xmss_aggregate.py chain_hash_pair)."""
    raw_a = n % 8
    raw_b = (n - raw_a) / 8
    chain_walk(tips_a, pp0, out_a, 2 * i, raw_a)
    chain_walk(tips_a + 4, pp0, out_a + 4, 2 * i + 1, raw_b)
    return raw_a + raw_b

@inline
def chain_walk(tip, pp0, target, c: Const, s: Const):
    if s == 7:
        for i in unroll(0, 4):
            target[i] = tip[i]
    else:
        cur: Mut = tip
        for j in unroll(s, 6):
            nxt = Array(4)
            poseidon16_compress_half_hardcoded_left(
                cur, pp0, nxt, TT_CHAINS + (c * 8 + j) * 4)
            cur = nxt
        poseidon16_compress_half_hardcoded_left(
            cur, pp0, target, TT_CHAINS + (c * 8 + 6) * 4)
    return

@inline
def do_4_merkle(state_in, state_out, pp, j: Const, b: Const):
    """4 Merkle levels 4j..4j+3; b = slot nibble (bits 4j..4j+3).
    Placement convention: direction bit 0 -> current node is the LEFT
    child (xmss/scheme.py:251-260). The incoming state is placed by bit
    4j; each compress output by the NEXT bit; the last output is raw
    (placed by the next chunk / written to the root)."""
    b0 = b % 2
    b1 = (b - b0) / 2 % 2
    b2 = ((b - b0) / 2 - b1) / 2 % 2
    b3 = (((b - b0) / 2 - b1) / 2 - b2) / 2

    buf0 = Array(8)
    for i in unroll(0, 4):
        buf0[i + b0 * 4] = state_in[i]
    hint_witness("xmss_merkle_node", buf0 + (1 - b0) * 4)

    buf1 = Array(8)
    poseidon16_compress_half_hardcoded_left(
        pp, buf0, buf1 + b1 * 4, TT_MERKLE + (j * 4) * 4)
    hint_witness("xmss_merkle_node", buf1 + (1 - b1) * 4)

    buf2 = Array(8)
    poseidon16_compress_half_hardcoded_left(
        pp, buf1, buf2 + b2 * 4, TT_MERKLE + (j * 4 + 1) * 4)
    hint_witness("xmss_merkle_node", buf2 + (1 - b2) * 4)

    buf3 = Array(8)
    poseidon16_compress_half_hardcoded_left(
        pp, buf2, buf3 + b3 * 4, TT_MERKLE + (j * 4 + 2) * 4)
    hint_witness("xmss_merkle_node", buf3 + (1 - b3) * 4)

    poseidon16_compress_half_hardcoded_left(
        pp, buf3, state_out, TT_MERKLE + (j * 4 + 3) * 4)
    return
'''
    return src
