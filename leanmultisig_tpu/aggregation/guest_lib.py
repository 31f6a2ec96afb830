"""zkDSL guest-side libraries for the recursive verifier (round-2 core).

`FS_LIB` is the in-VM Fiat-Shamir duplex sponge, the foundation of the
recursion guest (reference analog: zkdsl_implem/fiat_shamir.py design —
a write-once 17-cell state chain [capacity(8) | rate(8) | transcript_ptr]
advanced through the poseidon16_permute precompile; observed data is read
directly from the RAW transcript in memory).

Use via the compiler's import_resolver:
    compile_program(src, import_resolver=resolve_guest_lib)
with `from fs_lib import *` in guest sources.
"""

FS_LIB = '''
DIGEST_LEN = 8

def fs_new(transcript_ptr):
    fs = Array(17)
    for i in unroll(0, 16):
        fs[i] = 0
    fs[16] = transcript_ptr
    return fs

@inline
def fs_absorb_chunks(fs, data, n_chunks: Const, new_ptr):
    chain = Array(n_chunks * 16 + 1)
    poseidon16_permute(fs, data, chain)
    for i in unroll(1, n_chunks):
        poseidon16_permute(chain + (i - 1) * 16, data + i * DIGEST_LEN,
                           chain + i * 16)
    chain[n_chunks * 16] = new_ptr
    return chain + (n_chunks - 1) * 16

def fs_observe_transcript(fs, n_chunks: Const):
    """Absorb the next n_chunks rate-chunks of the raw transcript
    (advances the transcript pointer)."""
    ptr = fs[16]
    new = fs_absorb_chunks(fs, ptr, n_chunks, ptr + n_chunks * DIGEST_LEN)
    return new

def fs_duplex(fs):
    zeros = Array(8)
    for i in unroll(0, 8):
        zeros[i] = 0
    return fs_absorb_chunks(fs, zeros, 1, fs[16])

def fs_sample_ptr(fs):
    """Pointer to the 8 rate cells (the sampled values)."""
    return fs + 8

def fs_check_grinding(fs, bits: Const):
    """Absorb the grinding chunk ([witness | 0^7]) and constrain the low
    `bits` of the first rate cell to zero."""
    ptr = fs[16]
    new = fs_absorb_chunks(fs, ptr, 1, ptr + DIGEST_LEN)
    sampled = new[8]
    assert_low_bits_zero(sampled, bits)
    return new

def assert_low_bits_zero(value, bits: Const):
    """Constrain the low `bits` (< 24) of value to zero.

    The low 24 bits come from the decompose hint as 24 booleans; top7 is
    deduced via inv(2^24) = -127 mod p and bounded <= 126, which rejects
    wraparound and x = -1 (the same soundness argument as the reference's
    uniformity check, zkdsl_implem/fiat_shamir.py design)."""
    bits24 = Array(24)
    hint_decompose_bits_merkle_whir(bits24, value, 1)
    partial: Mut = 0
    for i in unroll(0, 24):
        b = bits24[i]
        assert b * b == b
        partial = partial + b * (2 ** i)
    top7 = (partial - value) * 127
    assert top7 <= 126
    assert value == partial + top7 * 16777216
    for i in unroll(0, bits):
        assert bits24[i] == 0
'''


EF_LIB = '''
DIM = 5

@inline
def ef_add(a, b, out):
    add_ee(a, b, out)
    return

@inline
def ef_sub(a, b, out):
    add_ee(b, out, a)
    return

@inline
def ef_mul(a, b, out):
    dot_product_ee(a, b, out)
    return

@inline
def ef_div(a, b, out):
    dot_product_ee(out, b, a)
    return

@inline
def ef_assert_eq(a, b):
    dot_product_ee(a, ONE_EF_PTR, b)
    return

@inline
def ef_copy(a, out):
    dot_product_ee(a, ONE_EF_PTR, out)
    return

def ef_powers(x, out, n: Const):
    """out[0..n*5] = [1, x, x^2, ..., x^(n-1)] (EF elements)."""
    ef_copy(ONE_EF_PTR, out)
    for i in unroll(1, n):
        ef_mul(out + (i - 1) * DIM, x, out + i * DIM)
    return

def ef_horner(coeffs, x, out, n: Const):
    """out = sum coeffs[i] * x^i (coeffs: n consecutive EF elements)."""
    pws = Array(n * DIM)
    ef_powers(x, pws, n)
    dot_product_ee(coeffs, pws, out, n)
    return

def ef_sum(elems, out, n: Const):
    """out = sum of n consecutive EF elements (add_ee against zeros)."""
    add_ee(elems, ZERO_EFS_PTR, out, n)
    return

def sumcheck_round(fs, target, n_coeffs: Const):
    """In-circuit sumcheck round (mirrors VerifierState
    .next_sumcheck_polynomial + sample): reads the full coefficients from
    the raw transcript, constrains h(0)+h(1) == target, absorbs, samples
    r from the rate, returns (new fs, ptr to new target, ptr to r).

    The raw transcript stores the c0-elided polynomial re-expanded
    (fs/verifier.rs absorb_and_record), so binding c0 needs the explicit
    sum constraint here."""
    coeffs = fs[16]
    fs2 = fs_observe_transcript(fs, div_ceil(n_coeffs * DIM, 8))
    # sum constraint: c0 + sum_i c_i == target
    s = Array(DIM)
    ef_sum(coeffs, s, n_coeffs)
    s2 = Array(DIM)
    ef_add(s, coeffs, s2)
    ef_assert_eq(s2, target)
    # sample r = first EF of the rate
    r = fs2 + 8
    new_target = Array(DIM)
    ef_horner(coeffs, r, new_target, n_coeffs)
    return fs2, new_target, r
'''


GKR_LIB = '''
def fs_sample_ef_vec(fs, out, n: Const):
    """Sample n EF elements into out (n*5 cells) — challenger
    sample_many semantics: read rate, then duplex+read per extra block."""
    total = n * 5
    fsx: Mut = fs
    for c in unroll(0, div_ceil(total, 8)):
        if c == 0:
            pass
        else:
            fsx = fs_duplex(fsx)
        take = 8 - saturating_sub(8, total - c * 8)  # min(8, remaining)
        for j in unroll(0, take):
            out[c * 8 + j] = fsx[8 + j]
    return fsx

def ef_eval_mle(values, point, out, n_vars: Const):
    """Evaluate an MLE of 2^n_vars consecutive EF values at an EF point
    ((n_vars, 5) consecutive cells), MSB-first folds."""
    cur: Mut = values
    for v in unroll(0, n_vars):
        half = 2 ** (n_vars - 1 - v)
        new = Array(half * 5)
        for i in unroll(0, half):
            d = Array(5)
            ef_sub(cur + (half + i) * 5, cur + i * 5, d)
            t = Array(5)
            ef_mul(point + v * 5, d, t)
            ef_add(cur + i * 5, t, new + i * 5)
        cur = new
    ef_copy(cur, out)
    return

def gkr_verify_layer(fs, point, claim_num, claim_den, k: Const):
    """One quotient-GKR layer check (quotient_gkr/mod.rs:160-190 verifier):
    duplex; alpha; k sumcheck rounds; read 4 inner evals; check
    eq(point, postponed) * (nl*dr + nr*dl + alpha*dl*dr) == target;
    beta-fold. Returns (fs, next point (k+1 EFs), next num, next den)."""
    fs2 = fs_duplex(fs)
    alpha = fs2 + 8
    expected = Array(5)
    tmp = Array(5)
    ef_mul(alpha, claim_den, tmp)
    ef_add(claim_num, tmp, expected)

    challenges = Array(k * 5)
    target: Mut = expected
    fsx: Mut = fs2
    for rnd in unroll(0, k):
        fsx, target, r = sumcheck_round(fsx, target, 4)
        ef_copy(r, challenges + rnd * 5)

    # postponed point = challenges reversed (LSB-first fold order)
    postponed = Array(k * 5)
    for rnd in unroll(0, k):
        ef_copy(challenges + rnd * 5, postponed + (k - 1 - rnd) * 5)

    inner = fsx[16]
    fsx2 = fs_observe_transcript(fsx, 3)  # 4 EF = 20 cells -> 3 chunks
    nl = inner
    nr = inner + 5
    dl = inner + 10
    dr = inner + 15

    # constraints_eval = alpha*dl*dr + nl*dr + nr*dl
    t1 = Array(5)
    ef_mul(dl, dr, t1)
    t2 = Array(5)
    ef_mul(alpha, t1, t2)
    t3 = Array(5)
    ef_mul(nl, dr, t3)
    t4 = Array(5)
    ef_mul(nr, dl, t4)
    t5 = Array(5)
    ef_add(t2, t3, t5)
    ce = Array(5)
    ef_add(t5, t4, ce)

    eq = Array(5)
    poly_eq_ee(point, postponed, eq, k)
    lhs = Array(5)
    ef_mul(eq, ce, lhs)
    ef_assert_eq(lhs, target)

    beta = fsx2 + 8
    next_num = Array(5)
    next_den = Array(5)
    dnum = Array(5)
    ef_sub(nr, nl, dnum)
    tn = Array(5)
    ef_mul(beta, dnum, tn)
    ef_add(nl, tn, next_num)
    dden = Array(5)
    ef_sub(dr, dl, dden)
    td = Array(5)
    ef_mul(beta, dden, td)
    ef_add(dl, td, next_den)

    next_point = Array((k + 1) * 5)
    for rnd in unroll(0, k):
        ef_copy(postponed + rnd * 5, next_point + rnd * 5)
    ef_copy(beta, next_point + k * 5)
    return fsx2, next_point, next_num, next_den
'''


WHIR_LIB = '''
def merkle_verify_leaf_digest(digest, root, index_bits, nodes, height: Const):
    """Walk a Merkle path in-circuit: digest (8 cells), hinted sibling
    nodes (height*8 cells), direction bits (height cells, constrained
    boolean here), root (8 cells). Left/right order is selected by
    POINTER arithmetic (b boolean => left/right in {cur, node}), so each
    level is 1 compress + ~5 scalar rows, no branches."""
    cur: Mut = digest
    for level in unroll(0, height):
        b = index_bits[level]
        assert b * b == b
        node = nodes + level * 8
        left = cur + b * (node - cur)
        right = node + b * (cur - node)
        out = Array(8)
        poseidon16_compress(left, right, out)
        cur = out
    for i in unroll(0, 8):
        assert cur[i] == root[i]
    return

def expand_from_univariate(y, out, n: Const):
    """out = [y, y^2, y^4, ...] (n EF elements) (point.rs:51-60)."""
    ef_copy(y, out)
    for i in unroll(1, n):
        ef_mul(out + (i - 1) * 5, out + (i - 1) * 5, out + i * 5)
    return

def sumcheck_round_pow(fs, target, n_coeffs: Const, bits: Const):
    """WHIR sumcheck round WITH pow grinding between the poly absorb and
    the challenge sample (whir/verify.rs:405-435 ordering)."""
    coeffs = fs[16]
    fs2 = fs_observe_transcript(fs, div_ceil(n_coeffs * 5, 8))
    s = Array(5)
    ef_sum(coeffs, s, n_coeffs)
    s2 = Array(5)
    ef_add(s, coeffs, s2)
    ef_assert_eq(s2, target)
    fs3 = fs_check_grinding(fs2, bits)
    r = fs3 + 8
    new_target = Array(5)
    ef_horner(coeffs, r, new_target, n_coeffs)
    return fs3, new_target, r

def decompose_index_bits(value, bits_out):
    """Constrain the 24+7 decomposition of a sampled base element; fill
    bits_out (24 cells) with LSB-first boolean bits (the same soundness
    argument as assert_low_bits_zero; challenger.rs:66-75 uses the low
    bits as a query index, 'not perfectly uniform' by design).

    The recomposition sum is ONE sized dot-product against the preamble
    table POW2_EFS_PTR ([2^j, 0,0,0,0] for j in 0..24)."""
    hint_decompose_bits_merkle_whir(bits_out, value, 1)
    for i in unroll(0, 24):
        b = bits_out[i]
        assert b * b == b
    s = Array(5)
    dot_product_be(bits_out, POW2_EFS_PTR, s, 24)
    partial = s[0]
    top7 = (partial - value) * 127
    assert top7 <= 126
    assert value == partial + top7 * 16777216
    return

def whir_hash_slice(data, n_chunks: Const):
    """Sponge hash of n_chunks*8 cells, right-to-left absorption
    (hash/sponge.py:40-54: each step feeds [state[:8] | chunk] through
    the feed-forward compression and carries the 8-cell digest);
    returns ptr to the 8-cell digest."""
    chain = Array((n_chunks - 1) * 8)
    poseidon16_compress(data + (n_chunks - 2) * 8, data + (n_chunks - 1) * 8,
                        chain)
    for i in unroll(1, n_chunks - 1):
        poseidon16_compress(chain + (i - 1) * 8, data + (n_chunks - 2 - i) * 8,
                            chain + i * 8)
    return chain + (n_chunks - 2) * 8

def mle_fold_base_level(vals, r, new, half: Const):
    """One MLE fold of 2*half BASE cells by EF r -> half EF values."""
    for i in unroll(0, half):
        dbuf = Array(1)
        dbuf[0] = vals[half + i] - vals[i]
        t = Array(5)
        dot_product_be(dbuf, r, t)
        new[i * 5] = t[0] + vals[i]
        new[i * 5 + 1] = t[1]
        new[i * 5 + 2] = t[2]
        new[i * 5 + 3] = t[3]
        new[i * 5 + 4] = t[4]
    return

def mle_eval_base(vals, point, out, k: Const):
    """Evaluate the MLE of 2^k BASE cells at a k-coord EF point."""
    half = 2 ** (k - 1)
    cur = Array(half * 5)
    mle_fold_base_level(vals, point, cur, half)
    ef_eval_mle(cur, point + 5, out, k - 1)
    return

def ef_eval_coeffs(coeffs, point, out, k: Const):
    """Evaluate a coefficient-basis multilinear (2^k EF coeffs) at a
    k-coord EF point (poly/np_poly.py eval_multilinear_coeffs)."""
    cur: Mut = coeffs
    for v in unroll(0, k):
        half = 2 ** (k - 1 - v)
        new = Array(half * 5)
        for i in unroll(0, half):
            t = Array(5)
            ef_mul(point + v * 5, cur + (half + i) * 5, t)
            ef_add(cur + i * 5, t, new + i * 5)
        cur = new
    ef_copy(cur, out)
    return
'''


CLAIMS_LIB = '''
def claim_hash_one(p, n_vars: Const):
    """T-sponge (no IV) over one PADDED flat bytecode claim
    (poseidon_compress_slice use_iv=False, utils/src/poseidon.rs:41-70):
    first compress over the first two chunks, then a [h | chunk] chain."""
    h0 = Array(8)
    poseidon16_compress(p, p + 8, h0)
    cur: Mut = h0
    for j in unroll(2, div_ceil((n_vars + 1) * DIM, 8)):
        nxt = Array(8)
        poseidon16_compress(cur, p + j * 8, nxt)
        cur = nxt
    return cur

def assert_claim_padding(p, n_vars: Const):
    """The zero padding of a flat claim is part of what gets hashed —
    constrain it (main.py reduce_bytecode_claims padding asserts)."""
    size = (n_vars + 1) * DIM
    for k in unroll(size, div_ceil(size, 8) * 8):
        assert p[k] == 0
    return

def reduce_claims_check(claims_ptrs, n_claims, rt, out_point, out_value,
                        n_vars: Const):
    """In-circuit verifier of the bytecode-claim reduction product
    sumcheck (reference guest: main.py reduce_bytecode_claims; host
    prover: aggregation/claims.py reduce_claims).

    claims_ptrs: array of n_claims (runtime) POINTERS to padded flat
    claims [(n_vars+1)*5 | zero pad]; rt: pointer to the hinted
    reduction raw transcript; writes the reduced claim into
    out_point (n_vars*5 cells) / out_value (5 cells).
    """
    # 1. running hash over the claims (hash_bytecode_claims)
    rh: Mut = ZERO_EFS_PTR
    for i in range(0, n_claims):
        p = claims_ptrs[i]
        assert_claim_padding(p, n_vars)
        ch = claim_hash_one(p, n_vars)
        nh = Array(8)
        poseidon16_compress(rh, ch, nh)
        rh = nh

    # 2. the reduction transcript's own Fiat-Shamir
    fs = fs_new(rt)
    received = fs[16]
    fs2 = fs_observe_transcript(fs, 1)
    for k in unroll(0, 8):
        assert received[k] == rh[k]
    alpha = fs2 + 8

    # 3. alpha powers + claimed sum = sum alpha^i * value_i
    apw = Array(n_claims * DIM)
    ef_copy(ONE_EF_PTR, apw)
    for i in range(1, n_claims):
        ef_mul(apw + (i - 1) * DIM, alpha, apw + i * DIM)
    csum: Mut = ZERO_EF_PTR
    for i in range(0, n_claims):
        p = claims_ptrs[i]
        t = Array(DIM)
        ef_mul(p + n_vars * DIM, apw + i * DIM, t)
        ns = Array(DIM)
        ef_add(csum, t, ns)
        csum = ns

    # 4. sumcheck rounds (degree 2 -> 3 coefficients per round)
    target: Mut = csum
    fsx: Mut = fs2
    for rnd in unroll(0, n_vars):
        fsx, target, r = sumcheck_round(fsx, target, 3)
        ef_copy(r, out_point + rnd * DIM)
    # full-consumption check (claims.py reduction_transcript_len)
    assert fsx[16] == rt + 8 + n_vars * 16

    # 5. w(r) = sum alpha^i * eq(point_i, r); value = target / w(r)
    wr: Mut = ZERO_EF_PTR
    for i in range(0, n_claims):
        p = claims_ptrs[i]
        eqv = Array(DIM)
        poly_eq_ee(p, out_point, eqv, n_vars)
        t = Array(DIM)
        ef_mul(eqv, apw + i * DIM, t)
        nw = Array(DIM)
        ef_add(wr, t, nw)
        wr = nw
    ef_div(target, wr, out_value)
    return
'''


def resolve_guest_lib(module: str) -> str:
    if module == "fs_lib":
        return FS_LIB
    if module == "ef_lib":
        return EF_LIB
    if module == "gkr_lib":
        return GKR_LIB
    if module == "whir_lib":
        return WHIR_LIB
    if module == "claims_lib":
        return CLAIMS_LIB
    if module == "rec_helpers":
        from .recursion import HELPERS
        return HELPERS
    raise KeyError(module)
