"""The UNIFIED self-referential aggregation program (reference:
rec_aggregation/zkdsl_implem/main.py + src/compilation.rs:36-98).

ONE zkDSL program handles every node of an aggregation tree:

  * type-1 leaf/mixed nodes: verify n_sigs XMSS signatures — any mix of
    raw in-circuit verifications and recursive children (each child a
    proof of THIS SAME program), partition-checked via write-once buffer
    cover (main.py:162-236);
  * type-2 merge nodes: verify n_components type-1 proofs and bind their
    digests (main.py:49-71).

Self-reference without hash circularity (compilation.rs design): the
bytecode-hash domain separator used to replay each child's Fiat-Shamir
is a RUNTIME value read from the node's own input data; the node copies
its own domsep into every child's input-data buffer before re-hashing it
into the child's public-input digest, so by induction one host-side
check at the tree root (`domsep field == hash(trusted_bytecode, DS)`)
pins every level. Delegated bytecode-MLE claims are folded by the
in-circuit claim-reduction sumcheck (claims.py / CLAIMS_LIB) into the
single claim embedded in the node's own input data.

Input-data layout (8-FE chunks; main.py:14-31):

    [flag, count, 0*6]                  count = n_sigs | n_components
    bytecode_claim (CLAIM_PADDED)       reduced claim [point | value | 0s]
    own_domsep (8)
    T1: pubkeys_hash(8) | message(8) | merkle_chunks(8) | tweaks_hash(8)
    T2: count * digest(8)

The public input is the 8-FE T-sponge (IV) digest of the input data.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..vm.isa import N_INSTRUCTION_COLUMNS
from ..xmss.core import TARGET_SUM, V
from .claims import claim_padded_size, reduction_transcript_len
from .guest import (CHUNKS_PER_FE, NUM_ENCODING_FE, TWEAK_CHAIN_OFF,
                    TWEAK_ENCODING_OFF, TWEAK_MERKLE_OFF, TWEAK_TABLE_SIZE,
                    TWEAK_WOTS_PK_OFF)
from .recursion import generate_logup_verifier

TYPE_1_FLAG = 1
TYPE_2_FLAG = 2
DIGEST_LEN = 8
LOG_INSTR = (N_INSTRUCTION_COLUMNS - 1).bit_length()  # 4


@dataclass
class UnifiedParams:
    """Compile-time constants of one unified program instance (the
    reference's placeholder injections, compilation.rs:100-403)."""
    max_n_sigs: int
    max_recursions: int
    log_memory: int
    table_log_heights: dict
    tlen: int
    whir_config_builder: object
    log_bytecode: int
    bytecode_zero_eval: int
    commitment_ood_samples: int

    @property
    def bytecode_n_vars(self) -> int:
        return self.log_bytecode + LOG_INSTR

    @property
    def ending_pc(self) -> int:
        # the compiler pads with panics and puts the ending self-loop at
        # the last slot (vm/isa.py pad convention)
        return (1 << self.log_bytecode) - 1


def layout(p: UnifiedParams) -> dict:
    """Cell offsets (absolute memory addresses; pub occupies 0..8)."""
    cp = claim_padded_size(p.bytecode_n_vars)
    claim_off = DIGEST_LEN
    domsep_off = claim_off + cp
    component_off = domsep_off + DIGEST_LEN
    t1_size = component_off + 4 * DIGEST_LEN
    idata_max = component_off + max(4 * DIGEST_LEN,
                                    DIGEST_LEN * p.max_recursions)
    idata = DIGEST_LEN  # right after pub
    tt = idata + idata_max
    one_ef = tt + TWEAK_TABLE_SIZE
    zero_efs = one_ef + 5
    zero_region = 5 * 34  # >= 33 EFs of zeros (ef_sum windows) + zeros8
    pow2 = zero_efs + zero_region
    preamble_len = idata_max + TWEAK_TABLE_SIZE + 5 + zero_region + 24 * 5
    return {
        "CLAIM_OFF": claim_off, "CLAIM_PADDED": cp,
        "CLAIM_SIZE": (p.bytecode_n_vars + 1) * 5,
        "DOMSEP_OFF": domsep_off, "COMPONENT_OFF": component_off,
        "T1_SIZE": t1_size, "T1_CHUNKS": t1_size // 8,
        "TYPE2_BASE_CHUNKS": component_off // 8,
        "IDATA": idata, "IDATA_MAX": idata_max,
        "TT": tt, "ONE_EF_PTR": one_ef, "ZERO_EF_PTR": zero_efs,
        "ZERO_EFS_PTR": zero_efs, "ZEROS8": zero_efs,
        "POW2_EFS_PTR": pow2, "PREAMBLE_LEN": preamble_len,
        "RED_TLEN": reduction_transcript_len(p.bytecode_n_vars),
        # dynamic_unroll budgets: the trip count can reach max_n_sigs
        # itself (pubkeys hash loop), so ceil(log2(max+1)) bits
        "LOG_MAX_SIGS": p.max_n_sigs.bit_length(),
    }


def generate_unified(p: UnifiedParams) -> tuple:
    """-> (source, layout dict). The program's public input is always the
    8-FE digest; everything else arrives as hints."""
    L = layout(p)
    verify_child_src, total_gkr = generate_logup_verifier(
        log_memory=p.log_memory,
        log_bytecode=p.log_bytecode,
        table_log_heights=p.table_log_heights,
        commitment_ood_samples=p.commitment_ood_samples,
        inner_public_len=8,
        bytecode_hash_domsep=None,
        starting_log_inv_rate=p.whir_config_builder.starting_log_inv_rate,
        tlen=p.tlen, air_section=True,
        whir_config_builder=p.whir_config_builder,
        ending_pc=p.ending_pc, self_ref=True)

    consts = f"""
from fs_lib import *
from ef_lib import *
from gkr_lib import *
from whir_lib import *
from claims_lib import *
from rec_helpers import *

TLEN = {p.tlen}
BN = {p.bytecode_n_vars}
CLAIM_OFF = {L["CLAIM_OFF"]}
CLAIM_SIZE = {L["CLAIM_SIZE"]}
CLAIM_PADDED = {L["CLAIM_PADDED"]}
DOMSEP_OFF = {L["DOMSEP_OFF"]}
COMPONENT_OFF = {L["COMPONENT_OFF"]}
T1_SIZE = {L["T1_SIZE"]}
T1_CHUNKS = {L["T1_CHUNKS"]}
TYPE2_BASE_CHUNKS = {L["TYPE2_BASE_CHUNKS"]}
IDATA = {L["IDATA"]}
RED_TLEN = {L["RED_TLEN"]}
MAX_N_SIGS = {p.max_n_sigs}
MAX_RECURSIONS = {p.max_recursions}
LOG_MAX_SIGS = {L["LOG_MAX_SIGS"]}
BYTECODE_ZERO_EVAL = {p.bytecode_zero_eval}
ONE_EF_PTR = {L["ONE_EF_PTR"]}
ZERO_EF_PTR = {L["ZERO_EF_PTR"]}
ZERO_EFS_PTR = {L["ZERO_EFS_PTR"]}
ZEROS8 = {L["ZEROS8"]}
POW2_EFS_PTR = {L["POW2_EFS_PTR"]}
V = {V}
TT = {L["TT"]}
TT_CHAINS = {L["TT"] + TWEAK_CHAIN_OFF}
TT_WOTS_PK = {L["TT"] + TWEAK_WOTS_PK_OFF}
TT_MERKLE = {L["TT"] + TWEAK_MERKLE_OFF}
TT_ENC = {L["TT"] + TWEAK_ENCODING_OFF}
TARGET_SUM = {TARGET_SUM}
"""

    main_src = f"""
def main():
    pre = 0
    pre[ONE_EF_PTR] = 1
    for _i in unroll(1, 5):
        pre[ONE_EF_PTR + _i] = 0
    for _i in unroll(0, {L["POW2_EFS_PTR"] - L["ZERO_EFS_PTR"]}):
        pre[ZERO_EFS_PTR + _i] = 0
    for _j in unroll(0, 24):
        pre[POW2_EFS_PTR + _j * 5] = 2 ** _j
        for _k in unroll(1, 5):
            pre[POW2_EFS_PTR + _j * 5 + _k] = 0

    hint_witness("input_data", IDATA)
    data = IDATA
    for _k in unroll(2, 8):
        assert data[_k] == 0
    # own claim padding must be zero (it is hashed into the digest)
    for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
        assert data[CLAIM_OFF + _k] == 0

    own_domsep = IDATA + DOMSEP_OFF
    flag = data[0]
    if flag == {TYPE_2_FLAG}:
        verify_type2(data, own_domsep)
    else:
        assert flag == {TYPE_1_FLAG}
        verify_type1(data, own_domsep)
    return


def verify_type2(data, own_domsep):
    # Merge of n type-1 multi-signatures (main.py:49-71).
    pub = 0
    n_components = data[1]
    assert n_components != 0
    assert n_components <= MAX_RECURSIONS
    claims_ptrs = Array(2 * n_components + 1)
    for c in range(0, n_components):
        comp_digest = IDATA + COMPONENT_OFF + c * 8
        tb = Array(T1_SIZE)
        hint_witness("component_layout", tb)
        assert tb[0] == {TYPE_1_FLAG}
        for _k in unroll(2, 8):
            assert tb[_k] == 0
        for _k in unroll(0, 8):
            assert tb[DOMSEP_OFF + _k] == own_domsep[_k]
        dig = slice_hash_iv(tb, T1_CHUNKS)
        for _k in unroll(0, 8):
            assert dig[_k] == comp_digest[_k]
        out_claim = Array(CLAIM_PADDED)
        for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
            out_claim[_k] = 0
        verify_child(comp_digest, own_domsep, out_claim)
        claims_ptrs[2 * c] = tb + CLAIM_OFF
        claims_ptrs[2 * c + 1] = out_claim
    reduce_and_bind(data, claims_ptrs, 2 * n_components)
    h = slice_hash_iv_dyn(IDATA, TYPE2_BASE_CHUNKS + n_components,
                          {(L["TYPE2_BASE_CHUNKS"] + p.max_recursions).bit_length()})
    for _k in unroll(0, 8):
        assert h[_k] == pub[_k]
    return


def verify_type1(data, own_domsep):
    n_sigs = data[1]
    assert n_sigs != 0
    assert n_sigs - 1 < MAX_N_SIGS
    is_split = Array(1)
    hint_witness("is_split", is_split)
    if is_split[0] == 1:
        verify_split(data, own_domsep)
    else:
        assert is_split[0] == 0
        verify_type1_general(data, own_domsep)
    return


def verify_split(data, own_domsep):
    # type-1 split: extract component `kept` from a type-2 proof
    # (main.py:75-108 is_split path). The node's own T1 statement fields
    # must EQUAL the kept component's (bound through its digest inside
    # the verified type-2 input data).
    pub = 0
    meta2 = Array(2)
    hint_witness("type2_meta", meta2)
    n_components = meta2[0]
    kept = meta2[1]
    assert n_components != 0
    assert n_components <= MAX_RECURSIONS
    assert kept < n_components

    t2 = Array(COMPONENT_OFF + 8 * n_components)
    hint_witness("inner_type2_layout", t2)
    assert t2[0] == {TYPE_2_FLAG}
    assert t2[1] == n_components
    for _k in unroll(2, 8):
        assert t2[_k] == 0
    for _k in unroll(0, 8):
        assert t2[DOMSEP_OFF + _k] == own_domsep[_k]
    for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
        assert t2[CLAIM_OFF + _k] == 0

    kept_buf = Array(T1_SIZE)
    hint_witness("kept_type1_buff", kept_buf)
    assert kept_buf[0] == {TYPE_1_FLAG}
    assert kept_buf[1] == data[1]
    for _k in unroll(2, 8):
        assert kept_buf[_k] == 0
    for _k in unroll(0, 8):
        assert kept_buf[DOMSEP_OFF + _k] == own_domsep[_k]
    for _k in unroll(0, 32):
        assert kept_buf[COMPONENT_OFF + _k] == data[COMPONENT_OFF + _k]
    for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
        assert kept_buf[CLAIM_OFF + _k] == 0
    dig_kept = slice_hash_iv(kept_buf, T1_CHUNKS)
    for _k in unroll(0, 8):
        assert dig_kept[_k] == t2[COMPONENT_OFF + kept * 8 + _k]

    t2d = slice_hash_iv_dyn(t2, TYPE2_BASE_CHUNKS + n_components,
                            {(L["TYPE2_BASE_CHUNKS"] + p.max_recursions).bit_length()})
    out_claim = Array(CLAIM_PADDED)
    for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
        out_claim[_k] = 0
    verify_child(t2d, own_domsep, out_claim)
    claims_ptrs = Array(2)
    claims_ptrs[0] = t2 + CLAIM_OFF
    claims_ptrs[1] = out_claim
    reduce_and_bind(data, claims_ptrs, 2)

    h = slice_hash_iv(IDATA, T1_CHUNKS)
    for _k in unroll(0, 8):
        assert h[_k] == pub[_k]
    return


def verify_type1_general(data, own_domsep):
    # n_sigs XMSS signatures: raw verifications + recursive children
    # partition-checked by write-once buffer cover (main.py:110-236).
    pub = 0
    n_sigs = data[1]

    message = IDATA + COMPONENT_OFF + 8
    merkle_chunks = IDATA + COMPONENT_OFF + 16
    tweaks_hash = IDATA + COMPONENT_OFF + 24

    meta = Array(2)
    hint_witness("meta", meta)
    n_recursions = meta[0]
    n_raw = meta[1]
    assert n_recursions <= MAX_RECURSIONS

    hint_witness("tweak_table", TT)
    check_tweak_table(tweaks_hash)

    all_pubkeys = Array(n_sigs * 8)
    hint_witness("pubkeys", all_pubkeys)
    ph = slice_hash_iv_dyn(all_pubkeys, n_sigs, LOG_MAX_SIGS)
    for _k in unroll(0, 8):
        assert ph[_k] == data[COMPONENT_OFF + _k]

    buffer = Array(n_sigs)
    raw_indices = Array(n_raw + 1)
    hint_witness("raw_indices", raw_indices)
    for i in range(0, n_raw):
        idx = raw_indices[i]
        assert idx < n_sigs
        buffer[idx] = i
        xmss_verify(all_pubkeys + idx * 8, message, merkle_chunks)

    counter: Mut = n_raw
    aggregate_sizes = Array(n_recursions + 1)
    hint_witness("aggregate_sizes", aggregate_sizes)
    claims_ptrs = Array(2 * n_recursions + 1)
    for r in range(0, n_recursions):
        n_sub = aggregate_sizes[r]
        assert n_sub != 0
        assert n_sub - 1 < MAX_N_SIGS
        sub_indices = Array(n_sub)
        hint_witness("sub_indices", sub_indices)
        idx0 = sub_indices[0]
        assert idx0 < n_sigs
        buffer[idx0] = counter
        counter = counter + 1
        rh0 = Array(8)
        poseidon16_compress(ZEROS8, all_pubkeys + idx0 * 8, rh0)
        rh: Mut = rh0
        for j in dynamic_unroll(1, n_sub, LOG_MAX_SIGS):
            idx = sub_indices[j]
            assert idx < n_sigs
            buffer[idx] = counter
            counter = counter + 1
            nh = Array(8)
            poseidon16_compress(rh, all_pubkeys + idx * 8, nh)
            rh = nh

        cb = Array(T1_SIZE)
        cb[0] = {TYPE_1_FLAG}
        cb[1] = n_sub
        for _k in unroll(2, 8):
            cb[_k] = 0
        hint_witness("inner_bytecode_claim", cb + CLAIM_OFF)
        for _k in unroll(0, 8):
            cb[DOMSEP_OFF + _k] = own_domsep[_k]
            cb[COMPONENT_OFF + _k] = rh[_k]
            cb[COMPONENT_OFF + 8 + _k] = message[_k]
            cb[COMPONENT_OFF + 16 + _k] = merkle_chunks[_k]
            cb[COMPONENT_OFF + 24 + _k] = tweaks_hash[_k]
        dig = slice_hash_iv(cb, T1_CHUNKS)
        out_claim = Array(CLAIM_PADDED)
        for _k in unroll(CLAIM_SIZE, CLAIM_PADDED):
            out_claim[_k] = 0
        verify_child(dig, own_domsep, out_claim)
        claims_ptrs[2 * r] = cb + CLAIM_OFF
        claims_ptrs[2 * r + 1] = out_claim

    assert counter == n_sigs
    if n_recursions == 0:
        for _k in unroll(0, BN * 5):
            assert data[CLAIM_OFF + _k] == 0
        assert data[CLAIM_OFF + BN * 5] == BYTECODE_ZERO_EVAL
        for _k in unroll(1, 5):
            assert data[CLAIM_OFF + BN * 5 + _k] == 0
    else:
        reduce_and_bind(data, claims_ptrs, 2 * n_recursions)

    h = slice_hash_iv(IDATA, T1_CHUNKS)
    for _k in unroll(0, 8):
        assert h[_k] == pub[_k]
    return


def reduce_and_bind(data, claims_ptrs, n_claims):
    # Reduce all delegated claims; bind the result to the node's own
    # embedded claim field (main.py reduce_bytecode_claims call sites).
    rt = Array(RED_TLEN)
    hint_witness("reduction_transcript", rt)
    outp = Array(BN * 5)
    outv = Array(5)
    reduce_claims_check(claims_ptrs, n_claims, rt, outp, outv, BN)
    for _k in unroll(0, BN * 5):
        assert outp[_k] == data[CLAIM_OFF + _k]
    for _k in unroll(0, 5):
        assert outv[_k] == data[CLAIM_OFF + BN * 5 + _k]
    return


def slice_hash_iv(d, n_chunks: Const):
    # T-sponge IV-mode hash over n_chunks 8-FE chunks
    # (poseidon_compress_slice use_iv=True).
    cur: Mut = ZEROS8
    for i in unroll(0, n_chunks):
        nxt = Array(8)
        poseidon16_compress(cur, d + i * 8, nxt)
        cur = nxt
    return cur


def slice_hash_iv_dyn(d, n_chunks, bits: Const):
    # Runtime-count IV-mode slice hash (slice_hash_with_iv_dynamic).
    h: Mut = ZEROS8
    for i in dynamic_unroll(0, n_chunks, bits):
        nh = Array(8)
        poseidon16_compress(h, d + i * 8, nh)
        h = nh
    return h


def check_tweak_table(expected):
    # T-sponge (IV) over the hinted table == the input-data tweaks_hash
    # (type_1_aggregation.rs:102-109).
    cur: Mut = ZEROS8
    for i in unroll(0, {TWEAK_TABLE_SIZE // 8}):
        nxt = Array(8)
        poseidon16_compress(cur, TT + i * 8, nxt)
        cur = nxt
    for i in unroll(0, 8):
        assert cur[i] == expected[i]
    return
"""

    xmss_src = f"""
def xmss_verify(pk, msg, mc):
    # One XMSS verification against a runtime slot (guest.py
    # verify_sig with pointer arguments; xmss_aggregate.py:59-110).
    root = pk
    pp = pk + 4

    sig = Array({6 + V * 4})
    hint_witness("wots_sig", sig)
    rand = sig
    tips = sig + 6

    pp0 = Array(8)
    for i in unroll(0, 4):
        pp0[i] = pp[i]
        pp0[i + 4] = 0

    first_right = Array(8)
    for i in unroll(0, 6):
        first_right[i] = rand[i]
    first_right[6] = TT_ENC[0]
    first_right[7] = TT_ENC[1]
    pre_comp = Array(8)
    poseidon16_compress(msg, first_right, pre_comp)
    compressed = Array(8)
    poseidon16_compress(pre_comp, pp0, compressed)

    chunks = Array({NUM_ENCODING_FE * CHUNKS_PER_FE})
    hint_decompose_bits_xmss(chunks, compressed, {NUM_ENCODING_FE}, 6)
    for i in unroll(0, {NUM_ENCODING_FE}):
        for j in unroll(0, {CHUNKS_PER_FE}):
            assert chunks[i * {CHUNKS_PER_FE} + j] <= 63
        ps0 = chunks[i * {CHUNKS_PER_FE}] + chunks[i * {CHUNKS_PER_FE} + 1] * 64
        ps1 = ps0 + chunks[i * {CHUNKS_PER_FE} + 2] * 4096
        partial = ps1 + chunks[i * {CHUNKS_PER_FE} + 3] * 262144
        remaining = (partial - compressed[i]) * 127
        assert remaining <= 126

    pk_buf = Array(V * 4)
    tsum0: Mut = 0
    for i in unroll(0, {V // 2}):
        s = match_range(chunks[i], range(0, 64),
                        lambda n: chain_pair(tips + (2 * i) * 4,
                                             pk_buf + (2 * i) * 4,
                                             pp0, i, n))
        tsum0 = tsum0 + s
    assert tsum0 == TARGET_SUM

    state = Array(8)
    poseidon16_compress_hardcoded_left(pp, ZEROS8, state, TT_WOTS_PK)
    cur: Mut = state
    for i in unroll(0, {V // 2}):
        nxt = Array(8)
        poseidon16_compress(cur, pk_buf + i * 8, nxt)
        cur = nxt

    st0 = Array(4)
    match_range(mc[0], range(0, 16),
                lambda b: do_4_merkle(cur, st0, pp, 0, b))
    st1 = Array(4)
    match_range(mc[1], range(0, 16),
                lambda b: do_4_merkle(st0, st1, pp, 1, b))
    st2 = Array(4)
    match_range(mc[2], range(0, 16),
                lambda b: do_4_merkle(st1, st2, pp, 2, b))
    st3 = Array(4)
    match_range(mc[3], range(0, 16),
                lambda b: do_4_merkle(st2, st3, pp, 3, b))
    st4 = Array(4)
    match_range(mc[4], range(0, 16),
                lambda b: do_4_merkle(st3, st4, pp, 4, b))
    st5 = Array(4)
    match_range(mc[5], range(0, 16),
                lambda b: do_4_merkle(st4, st5, pp, 5, b))
    st6 = Array(4)
    match_range(mc[6], range(0, 16),
                lambda b: do_4_merkle(st5, st6, pp, 6, b))
    computed_root = Array(4)
    match_range(mc[7], range(0, 16),
                lambda b: do_4_merkle(st6, computed_root, pp, 7, b))
    for i in unroll(0, 4):
        assert computed_root[i] == root[i]
    return

@inline
def chain_pair(tips_a, out_a, pp0, i: Const, n: Const):
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
"""

    src = consts + main_src + xmss_src + "\n" + verify_child_src
    L["TOTAL_GKR"] = total_gkr
    return src, L
