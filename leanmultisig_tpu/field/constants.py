"""KoalaBear field constants.

The prime field p = 2^31 - 2^24 + 1 ("KoalaBear") and its degree-5 extension
F[X]/(X^5 + X^2 - 1).

Protocol constants match the reference implementation
(/root/reference/crates/backend/koala-bear/src/koala_bear.rs:22-66 and
quintic_extension/mod.rs:18-51); they are re-derived here where possible and
asserted at import time.
"""

from __future__ import annotations

# ----------------------------------------------------------------------------
# Base field
# ----------------------------------------------------------------------------

P = 0x7F000001  # 2^31 - 2^24 + 1 = 2130706433
MONTY_BITS = 32
MONTY_R = 1 << MONTY_BITS
MONTY_MASK = MONTY_R - 1
# -p^{-1} mod 2^32 is NOT what plonky3 stores; MONTY_MU = p^{-1} mod 2^32.
MONTY_MU = 0x81000001
assert (P * MONTY_MU) % MONTY_R == 1

# R mod p and R^2 mod p (for conversions into Montgomery form).
R_MOD_P = MONTY_R % P
R2_MOD_P = (MONTY_R * MONTY_R) % P

TWO_ADICITY = 24
MULTIPLICATIVE_GENERATOR = 3

# TWO_ADIC_GENERATORS[k] generates the order-2^k subgroup.
# (koala_bear.rs:49-54)
TWO_ADIC_GENERATORS = [
    0x1, 0x7F000000, 0x7E010002, 0x6832FE4A, 0x8DBD69C, 0xA28F031,
    0x5C4A5B99, 0x29B75A80, 0x17668B8A, 0x27AD539B, 0x334D48C7, 0x7744959C,
    0x768FC6FA, 0x303964B2, 0x3E687D4D, 0x45A60E61, 0x6E2F4D7A, 0x163BD499,
    0x6C4A8A45, 0x143EF899, 0x514DDCAD, 0x484EF19B, 0x205D63C3, 0x68E7DD49,
    0x6AC49F88,
]

# sanity: each generator has exact order 2^k
for _k, _g in enumerate(TWO_ADIC_GENERATORS):
    assert pow(_g, 1 << _k, P) == 1
    if _k:
        assert pow(_g, 1 << (_k - 1), P) == P - 1

# ----------------------------------------------------------------------------
# Quintic extension F[X]/(X^5 + X^2 - 1)
# ----------------------------------------------------------------------------

EXT_DEGREE = 5
# X^5 = 1 - X^2 in the quotient ring.
EXT_GENERATOR = (2, 1, 0, 0, 0)  # quintic_extension/mod.rs:50


def _poly_mulmod(a: list[int], b: list[int]) -> list[int]:
    """Multiply two degree<5 polys over F_p modulo X^5 + X^2 - 1."""
    c = [0] * 9
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            c[i + j] = (c[i + j] + ai * bj) % P
    # reduce: X^{5+k} = X^k - X^{2+k}
    for k in range(3, -1, -1):
        hi = c[5 + k]
        c[5 + k] = 0
        c[k] = (c[k] + hi) % P
        c[k + 2] = (c[k + 2] - hi) % P
    return c[:5]


def _frobenius_matrix() -> list[list[int]]:
    """Rows i=0..3: coefficients of (X^{i+1})^p mod (X^5 + X^2 - 1).

    FROBENIUS_MATRIX[i][j] = coefficient of X^j in X^{(i+1)p}.
    Matches quintic_extension/mod.rs:19-48 (asserted below).
    """
    # X^p by square-and-multiply in the quotient ring
    x = [0, 1, 0, 0, 0]
    result = [1, 0, 0, 0, 0]
    base = x
    e = P
    while e:
        if e & 1:
            result = _poly_mulmod(result, base)
        base = _poly_mulmod(base, base)
        e >>= 1
    xp = result
    rows = []
    cur = xp
    for _ in range(4):
        rows.append(list(cur))
        cur = _poly_mulmod(cur, xp)
    # `cur` is now X^{5p}; unused.
    # rows[i] = X^{(i+1)p} coefficients... careful: rows[1] should be X^{2p} =
    # (X^p)^2, which the loop produces via repeated multiplication by xp.
    return rows


FROBENIUS_MATRIX = _frobenius_matrix()

# value-for-value check against the reference constants
# (quintic_extension/mod.rs:19-48)
_REF_FROBENIUS = [
    [1576402667, 1173144480, 1567662457, 1206866823, 2428146],
    [1680345488, 1381986, 615237464, 1380104858, 295431824],
    [441230756, 323126830, 704986542, 1445620072, 503505220],
    [1364444097, 1144738982, 2008416047, 143367062, 1027410849],
]
assert FROBENIUS_MATRIX == _REF_FROBENIUS, "Frobenius derivation mismatch"
