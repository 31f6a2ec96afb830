"""XMSS scheme tests (model: tests/test_multisignatures.rs:17-28)."""

import numpy as np

from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.xmss.core import TARGET_SUM, V
from leanmultisig_tpu.xmss.scheme import (wots_encode, xmss_key_gen,
                                          xmss_sign, xmss_verify)

rng = np.random.default_rng(21)


def test_xmss_sign_verify():
    sk, pk = xmss_key_gen(b"seed-0123456789abcdef", 100, 131)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    slot = 111
    sig = xmss_sign(sk, message, slot, rng)
    assert xmss_verify(pk, message, sig, slot)

    # encoding respects the target sum
    enc = wots_encode(message, slot, pk, sig.randomness)
    assert enc is not None and enc.sum() == TARGET_SUM and len(enc) == V

    # wrong message fails
    bad = message.copy()
    bad[0] ^= 1
    assert not xmss_verify(pk, bad, sig, slot)
    # wrong slot fails
    assert not xmss_verify(pk, message, sig, 112)
    # tampered chain tip fails
    sig2_tips = sig.chain_tips.copy()
    sig2_tips[3, 0] = (sig2_tips[3, 0] + 1) % P
    from leanmultisig_tpu.xmss.scheme import XmssSignature
    sig2 = XmssSignature(sig2_tips, sig.randomness, sig.merkle_proof)
    assert not xmss_verify(pk, message, sig2, slot)
    # tampered merkle path fails
    mp = sig.merkle_proof.copy()
    mp[5, 1] = (mp[5, 1] + 1) % P
    sig3 = XmssSignature(sig.chain_tips, sig.randomness, mp)
    assert not xmss_verify(pk, message, sig3, slot)


def test_xmss_multiple_signers():
    sks = []
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    for i in range(4):
        sk, pk = xmss_key_gen(b"seed-%d" % i, 8, 15)
        sig = xmss_sign(sk, message, 9, rng)
        assert xmss_verify(pk, message, sig, 9)
        sks.append((sk, pk))
    # distinct roots
    roots = {tuple(pk.merkle_root.tolist()) for _, pk in sks}
    assert len(roots) == 4
