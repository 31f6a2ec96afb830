"""Poseidon-16 permutation: reference test vector + numpy/jnp agreement."""

import numpy as np
import jax.numpy as jnp

from leanmultisig_tpu.field import jnp_field as jf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poseidon import np_poseidon as npp
from leanmultisig_tpu.poseidon import perm

RNG = np.random.default_rng(1)

# Reference golden vector: permute([0..15])
# (poseidon1_koalabear_16.rs test_plonky3_compatibility)
GOLDEN_IN = np.arange(16, dtype=np.uint32)
GOLDEN_OUT = np.array(
    [610090613, 935319874, 1893335292, 796792199, 356405232, 552237741,
     55134556, 1215104204, 1823723405, 1133298033, 1780633798, 1453946561,
     710069176, 1128629550, 1917333254, 1175481618], np.uint32)


def test_np_poseidon_golden():
    assert np.array_equal(npp.permute(GOLDEN_IN), GOLDEN_OUT)


def test_jnp_poseidon_golden():
    state = jnp.asarray(jf.to_monty_np(GOLDEN_IN))[None, :]
    out = jf.from_monty_np(np.asarray(perm.permute_jit(state)))[0]
    assert np.array_equal(out, GOLDEN_OUT)


def test_jnp_matches_np_batch():
    batch = RNG.integers(0, P, size=(64, 16), dtype=np.uint32)
    want = npp.permute(batch)
    got = jf.from_monty_np(
        np.asarray(perm.permute_jit(jnp.asarray(jf.to_monty_np(batch)))))
    assert np.array_equal(got, want)


def test_compress_feed_forward():
    batch = RNG.integers(0, P, size=(8, 16), dtype=np.uint32)
    want = npp.compress(batch)
    got = jf.from_monty_np(
        np.asarray(perm.compress_jit(jnp.asarray(jf.to_monty_np(batch)))))
    assert np.array_equal(got, want)
    # digest definition: first 8 limbs
    assert want.shape == (8, 16)
