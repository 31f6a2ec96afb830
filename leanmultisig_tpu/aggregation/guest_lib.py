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

def ef_add(a, b, out):
    add_ee(a, b, out)
    return

def ef_sub(a, b, out):
    add_ee(b, out, a)
    return

def ef_mul(a, b, out):
    dot_product_ee(a, b, out)
    return

def ef_div(a, b, out):
    dot_product_ee(out, b, a)
    return

def ef_assert_eq(a, b):
    dot_product_ee(a, ONE_EF_PTR, b)
    return

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


def resolve_guest_lib(module: str) -> str:
    if module == "fs_lib":
        return FS_LIB
    if module == "ef_lib":
        return EF_LIB
    raise KeyError(module)
