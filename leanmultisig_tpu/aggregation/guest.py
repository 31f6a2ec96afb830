"""Aggregation guest program generator: in-circuit XMSS verification.

Generates zkDSL source that verifies N_SIGS XMSS signatures inside the
zkVM — the type-1 aggregation leaf workload (reference guest:
rec_aggregation/zkdsl_implem/xmss_aggregate.py; host driver:
type_1_aggregation.rs). All signatures share one benchmark slot
(signers_cache.rs BENCHMARK_SLOT convention), so chain/Merkle tweaks and
path directions are compile-time constants injected into the source —
the same placeholder-injection architecture as the reference
(compilation.rs:100-403).

Public input layout: [n_sigs, message(8), per-sig: root(4) | pp(4)].
Hints: "wots_sig" = [randomness(6) | chain_tips(42*4)] per signature;
"merkle_nodes" = [32*4] per signature; "encoding_high" = [8] per sig.

In-circuit checks per signature:
  * encoding re-derivation: two Poseidon compresses; 3-bit limb
    decomposition of each 24-bit low part (DecomposeBitsXMSS hint with
    chunk=3), recomposition x = sum l_i 8^i + h*2^24 with range checks
    l_i <= 7, h <= 126 (the h<127 bound rejects x = -1, mirroring the
    reference's uniformity check, xmss_aggregate.py:59-78);
  * target sum == 184;
  * chain walks via match_range over the 8 step counts, each step one
    `poseidon16_compress_half_hardcoded_left` against a preamble tweak
    prefix (xmss_aggregate.py:84-110 idiom);
  * WOTS pk T-sponge (22 compresses);
  * 32-level Merkle walk with constant directions, consuming hinted
    sibling nodes; root equality against the public input.
"""

from __future__ import annotations

from ..xmss.core import (CHAIN_LENGTH, LOG_LIFETIME, TARGET_SUM,
                         TWEAK_TYPE_CHAIN, TWEAK_TYPE_ENCODING,
                         TWEAK_TYPE_MERKLE, TWEAK_TYPE_WOTS_PK, V,
                         make_tweak)

N_CHAIN_TWEAKS = V * CHAIN_LENGTH  # one 4-FE prefix per (chain, step)


def public_input_layout(n_sigs: int):
    """-> (total_len, msg_offset, sig_base, sig_stride)."""
    return 1 + 8 + 8 * n_sigs, 1, 9, 8


def preamble_layout(pub_len_padded: int):
    """Preamble: [chain prefixes 336*4 | merkle prefixes 32*4 | zeros 8 |
    wots-pk-iv prefix 4 | pow8 EF table 8*5 | ones EF table V*5]."""
    base = pub_len_padded
    chain_base = base
    merkle_base = chain_base + N_CHAIN_TWEAKS * 4
    zeros_base = merkle_base + LOG_LIFETIME * 4
    pk_iv_base = zeros_base + 8
    pow8_base = pk_iv_base + 4
    ones_base = pow8_base + 8 * 5
    total = ones_base + V * 5 - base
    return chain_base, merkle_base, zeros_base, pk_iv_base, total


def generate_guest(n_sigs: int, slot: int) -> str:
    pub_len, msg_off, sig_base, sig_stride = public_input_layout(n_sigs)
    pub_len_padded = 1 << max((pub_len - 1).bit_length(), 0)
    chain_base, merkle_base, zeros_base, pk_iv_base, _ = \
        preamble_layout(pub_len_padded)
    pow8_base = pk_iv_base + 4
    ones_base = pow8_base + 8 * 5

    chain_tweaks = [
        [int(x) for x in make_tweak(TWEAK_TYPE_CHAIN,
                                    c * CHAIN_LENGTH + s, slot)]
        for c in range(V) for s in range(CHAIN_LENGTH)]
    merkle_tweaks = [
        [int(x) for x in make_tweak(TWEAK_TYPE_MERKLE, level + 1,
                                    slot >> (level + 1))]
        for level in range(LOG_LIFETIME)]
    enc_tweak = [int(x) for x in make_tweak(TWEAK_TYPE_ENCODING, 0, slot)]
    pk_tweak = [int(x) for x in make_tweak(TWEAK_TYPE_WOTS_PK, 0, slot)]
    dir_bits = [(slot >> level) & 1 for level in range(LOG_LIFETIME)]

    src = f'''
N_SIGS = {n_sigs}
V = {V}
CHAIN_BASE = {chain_base}
MERKLE_BASE = {merkle_base}
ZEROS8 = {zeros_base}
PK_IV = {pk_iv_base}
POW8_EFS = {pow8_base}
ONES_EFS = {ones_base}
CHAIN_TWEAKS = {chain_tweaks!r}
MERKLE_TWEAKS = {merkle_tweaks!r}
ENC_TWEAK = {enc_tweak!r}
PK_TWEAK = {pk_tweak!r}
DIR_BITS = {dir_bits!r}
TARGET_SUM = {TARGET_SUM}

def main():
    write_preamble()
    for k in range(0, N_SIGS):
        verify_sig(k)
    return

def write_preamble():
    pre = 0
    for c in unroll(0, V):
        for s in unroll(0, 8):
            e = c * 8 + s
            pre[CHAIN_BASE + e * 4] = CHAIN_TWEAKS[e][0]
            pre[CHAIN_BASE + e * 4 + 1] = CHAIN_TWEAKS[e][1]
            pre[CHAIN_BASE + e * 4 + 2] = 0
            pre[CHAIN_BASE + e * 4 + 3] = 0
    for level in unroll(0, 32):
        pre[MERKLE_BASE + level * 4] = MERKLE_TWEAKS[level][0]
        pre[MERKLE_BASE + level * 4 + 1] = MERKLE_TWEAKS[level][1]
        pre[MERKLE_BASE + level * 4 + 2] = 0
        pre[MERKLE_BASE + level * 4 + 3] = 0
    for i in unroll(0, 8):
        pre[ZEROS8 + i] = 0
    pre[PK_IV] = PK_TWEAK[0]
    pre[PK_IV + 1] = PK_TWEAK[1]
    pre[PK_IV + 2] = 0
    pre[PK_IV + 3] = 0
    for j in unroll(0, 8):
        pre[POW8_EFS + j * 5] = 8 ** j
        for t in unroll(1, 5):
            pre[POW8_EFS + j * 5 + t] = 0
    for j in unroll(0, V):
        pre[ONES_EFS + j * 5] = 1
        for t in unroll(1, 5):
            pre[ONES_EFS + j * 5 + t] = 0
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
    first_right[6] = ENC_TWEAK[0]
    first_right[7] = ENC_TWEAK[1]
    pre_comp = Array(8)
    poseidon16_compress({msg_off}, first_right, pre_comp)
    compressed = Array(8)
    poseidon16_compress(pre_comp, pp0, compressed)

    # --- 3-bit limb decomposition with recomposition + range checks ---
    limbs = Array(64)
    hint_decompose_bits_xmss(limbs, compressed, 8, 3)
    high = Array(8)
    hint_witness("encoding_high", high)
    for e in unroll(0, 8):
        s5 = Array(5)
        dot_product_be(limbs + e * 8, POW8_EFS, s5, 8)
        for j in unroll(0, 8):
            assert limbs[e * 8 + j] <= 7
        assert high[e] <= 126
        assert compressed[e] == s5[0] + high[e] * 16777216

    t5 = Array(5)
    dot_product_be(limbs, ONES_EFS, t5, V)
    assert t5[0] == TARGET_SUM

    # --- chain walks -> contiguous pk buffer ---
    pk_buf = Array(V * 4)
    for c in unroll(0, V):
        steps = limbs[c]
        match_range(steps, range(0, 8),
                    lambda s: chain_walk(tips + c * 4, pp0, pk_buf + c * 4, c, s))

    # --- WOTS pk T-sponge (replacement mode) ---
    state = Array(8)
    poseidon16_compress_hardcoded_left(pp, ZEROS8, state, PK_IV)
    cur: Mut = state
    for i in unroll(0, {V // 2}):
        nxt = Array(8)
        poseidon16_compress(cur, pk_buf + i * 8, nxt)
        cur = nxt

    # --- Merkle walk (constant directions; each hinted sibling lands
    #     DIRECTLY in its children buffer, each level = one compress
    #     writing into the next buffer's correct half) ---
    ch0 = Array(8)
    for i in unroll(0, 4):
        ch0[i + DIR_BITS[0] * 4] = cur[i]
    hint_witness("merkle_node", ch0 + (1 - DIR_BITS[0]) * 4)
    ch: Mut = ch0
    for level in unroll(0, 31):
        nxt = Array(8)
        poseidon16_compress_half_hardcoded_left(
            pp, ch, nxt + DIR_BITS[level + 1] * 4, MERKLE_BASE + level * 4)
        hint_witness("merkle_node", nxt + (1 - DIR_BITS[level + 1]) * 4)
        ch = nxt
    out = Array(4)
    poseidon16_compress_half_hardcoded_left(
        pp, ch, out, MERKLE_BASE + 31 * 4)
    for i in unroll(0, 4):
        assert out[i] == root[i]
    return

def chain_walk(tip, pp0, target, c: Const, s: Const):
    if s == 7:
        for i in unroll(0, 4):
            target[i] = tip[i]
    else:
        cur: Mut = tip
        for j in unroll(s, 6):
            nxt = Array(4)
            poseidon16_compress_half_hardcoded_left(
                cur, pp0, nxt, CHAIN_BASE + (c * 8 + j) * 4)
            cur = nxt
        poseidon16_compress_half_hardcoded_left(
            cur, pp0, target, CHAIN_BASE + (c * 8 + 6) * 4)
    return
'''
    return src
