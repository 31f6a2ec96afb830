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


def resolve_guest_lib(module: str) -> str:
    if module == "fs_lib":
        return FS_LIB
    raise KeyError(module)
