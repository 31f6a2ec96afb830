"""Sponge, Merkle tree, Fiat-Shamir transcript, merkle pruning roundtrip."""

import numpy as np

from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.hash import merkle, sponge
from leanmultisig_tpu.fs.challenger import Challenger
from leanmultisig_tpu.fs.prover import MerklePath, ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.fs import merkle_pruning

RNG = np.random.default_rng(2)


def rand_f(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint32)


def test_hash_slice_incremental_consistency():
    # absorbing zero-chunk-precomputed state == hashing zero-padded data
    data = rand_f(16)
    padded = np.concatenate([data, np.zeros(24, np.uint32)])
    full = sponge.hash_slice(padded)
    # manual: right-to-left absorption means zero suffix is absorbed FIRST
    state = sponge.precompute_zero_suffix_state(3)  # 24 zeros = 3 chunks
    state = state.copy()
    state[8:] = data[8:16]
    state = sponge.compress16(state)
    state[8:] = data[0:8]
    state = sponge.compress16(state)
    assert np.array_equal(state[:8], full)


def test_merkle_roundtrip():
    leaves = rand_f((16, 24))  # 16 leaves, 24 elements each
    first_layer = np.stack([sponge.hash_slice(leaf) for leaf in leaves])
    tree = merkle.MerkleTree.from_first_layer(first_layer)
    root = tree.root()
    for idx in [0, 5, 15]:
        siblings = tree.open_siblings(idx, 4)
        assert merkle.merkle_verify(root, 4, idx, leaves[idx], siblings)
        assert not merkle.merkle_verify(root, 4, idx ^ 1, leaves[idx], siblings)


def test_challenger_determinism_and_freshness():
    c1, c2 = Challenger(), Challenger()
    data = rand_f(13)
    c1.observe_many(data)
    c2.observe_many(data)
    assert np.array_equal(c1.sample(), c2.sample())
    try:
        c1.sample()
        raise RuntimeError("expected stale-rate assert")
    except AssertionError:
        pass
    c1.duplex()
    s = c1.sample()
    assert s.shape == (8,)


def test_fs_prover_verifier_transcript_roundtrip():
    prover = ProverState()
    prover.add_base_scalars(rand_f(11))
    alpha_p = prover.sample_vec(3)
    prover.duplex()
    prover.pow_grinding(8)
    ef = rand_f((2, 5))
    prover.add_extension_scalars(ef)
    idx_p = prover.sample_in_range(10, 4)
    proof = prover.into_proof()

    v = VerifierState(proof)
    got = v.next_base_scalars_vec(11)
    alpha_v = v.sample_vec(3)
    assert np.array_equal(alpha_p, alpha_v)
    v.duplex()
    v.check_pow_grinding(8)
    ef_v = v.next_extension_scalars_vec(2)
    assert np.array_equal(ef, ef_v)
    idx_v = v.sample_in_range(10, 4)
    assert idx_p == idx_v
    assert len(got) == 11


def test_fs_sumcheck_polynomial_elision():
    from leanmultisig_tpu.field import np_field as nf

    # no-eq case: verifier reconstructs c0 from claimed sum
    coeffs = rand_f((4, 5))
    # claimed_sum = h(0) + h(1) = c0 + sum(all coeffs)
    claimed = coeffs[0].copy()
    for c in coeffs:
        claimed = nf.eadd(claimed, c)

    prover = ProverState()
    prover.add_sumcheck_polynomial(coeffs)
    r_p = prover.sample()
    proof = prover.into_proof()
    assert len(proof.transcript) == 3 * 5  # c0 elided

    v = VerifierState(proof)
    full = v.next_sumcheck_polynomial(4, claimed)
    assert np.array_equal(full, coeffs)
    assert np.array_equal(v.sample(), r_p)


def test_fs_sumcheck_polynomial_eq_alpha():
    from leanmultisig_tpu.field import np_field as nf
    from leanmultisig_tpu.fs.prover import expand_bare_to_full

    bare = rand_f((3, 5))
    alpha = rand_f(5)
    # claimed = g(0)+g(1) where g = eq(alpha,.)*h: h0 + alpha*sum(rest)
    rest_sum = nf.eadd(bare[1], bare[2])
    claimed = nf.eadd(bare[0], nf.emul(alpha, rest_sum))

    prover = ProverState()
    prover.add_sumcheck_polynomial(bare, eq_alpha=alpha)
    r_p = prover.sample()
    proof = prover.into_proof()
    assert len(proof.transcript) == 2 * 5  # h0 elided

    v = VerifierState(proof)
    full = v.next_sumcheck_polynomial(4, claimed, eq_alpha=alpha)
    assert np.array_equal(full, expand_bare_to_full(bare, alpha))
    assert np.array_equal(v.sample(), r_p)


def test_merkle_pruning_roundtrip():
    log_h = 5
    leaves = rand_f((1 << log_h, 16))
    first_layer = np.stack([sponge.hash_slice(leaf) for leaf in leaves])
    tree = merkle.MerkleTree.from_first_layer(first_layer)
    indices = [17, 3, 9, 3, 30, 8]  # unsorted, with duplicate
    paths = [MerklePath(leaves[i], tree.open_siblings(i, log_h), i)
             for i in indices]
    pruned = merkle_pruning.prune(paths)
    restored = merkle_pruning.restore(pruned)
    assert restored is not None
    assert len(restored) == len(paths)
    for orig, rest in zip(paths, restored):
        assert orig.leaf_index == rest.leaf_index
        assert np.array_equal(orig.leaf_data, rest.leaf_data)
        assert np.array_equal(orig.sibling_hashes, rest.sibling_hashes)
    # pruning actually saves space
    full_size = sum(len(p.leaf_data) + p.sibling_hashes.size for p in paths)
    assert pruned.size_fe() < full_size


def test_merkle_pruning_trailing_zeros():
    log_h = 3
    leaves = rand_f((8, 16))
    leaves[:, 10:] = 0
    first_layer = np.stack([sponge.hash_slice(leaf) for leaf in leaves])
    tree = merkle.MerkleTree.from_first_layer(first_layer)
    paths = [MerklePath(leaves[i], tree.open_siblings(i, log_h), i)
             for i in [2, 5]]
    pruned = merkle_pruning.prune(paths)
    assert pruned.n_trailing_zeros == 6
    restored = merkle_pruning.restore(pruned)
    for orig, rest in zip(paths, restored):
        assert np.array_equal(orig.leaf_data, rest.leaf_data)
        assert np.array_equal(orig.sibling_hashes, rest.sibling_hashes)
