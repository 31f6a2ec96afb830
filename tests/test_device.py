"""Device kernel tests: bit-exact equivalence with the host reference
implementations (run on the virtual CPU backend; the same code path runs
on real TPU in bench)."""

import numpy as np
import pytest

from leanmultisig_tpu import device
from leanmultisig_tpu.device import kernels as dk
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import grind as host_grind
from leanmultisig_tpu.hash import merkle as hmerkle
from leanmultisig_tpu.hash import sponge
from leanmultisig_tpu.whir import dft as host_dft

rng = np.random.default_rng(17)


def test_device_grind_matches_host():
    capacity = rng.integers(0, P, size=8, dtype=np.uint32)
    for bits in [3, 6]:
        assert dk.grind(capacity, bits, batch=1 << 10) == \
            host_grind(capacity, bits)


def test_device_merkle_matches_host():
    leaves = rng.integers(0, P, size=(128, 24), dtype=np.uint32)
    layers = dk.merkle_build(leaves, 24)
    host_digests = sponge.hash_slice(leaves)
    host_tree = hmerkle.MerkleTree.from_first_layer(host_digests)
    assert len(layers) == len(host_tree.digest_layers)
    for dlayer, hlayer in zip(layers, host_tree.digest_layers):
        assert np.array_equal(dlayer, hlayer)


def test_device_merkle_zero_suffix():
    leaves = rng.integers(0, P, size=(64, 40), dtype=np.uint32)
    layers = dk.merkle_build(leaves, 64)  # 24 zero-suffix columns
    padded = np.concatenate([leaves, np.zeros((64, 24), np.uint32)], axis=1)
    assert np.array_equal(layers[0], sponge.hash_slice(padded))


@pytest.mark.parametrize("tail", [(), (5,)])
def test_device_dft_matches_host(tail):
    x = rng.integers(0, P, size=(256,) + tail, dtype=np.uint32)
    assert np.array_equal(dk.dft_evals(x), host_dft.dft_evals(x))


def test_device_reorder_and_dft_matches_host():
    evals = rng.integers(0, P, size=1 << 10, dtype=np.uint32)
    got = dk.reorder_and_dft(evals, 4, 2, 16)
    want = host_dft.reorder_and_dft(evals, 4, 2, 16)
    assert np.array_equal(got, want)


def test_device_enabled_pipeline_roundtrip():
    """Full WHIR roundtrip with device kernels forced on."""
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.fs.verifier import VerifierState
    from leanmultisig_tpu.poly import np_poly as pp
    from leanmultisig_tpu.whir import (SparseStatement, WhirConfig, commit,
                                       open_, parse_commitment, verify)
    from test_whir import _small_builder

    device.set_enabled(True)
    try:
        n_vars = 12
        cfg = WhirConfig(_small_builder(), n_vars)
        poly = rng.integers(0, P, size=1 << n_vars, dtype=np.uint32)
        point = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
        st = SparseStatement.dense(point, pp.eval_mle(poly, point))
        ps = ProverState()
        witness = commit(cfg, ps, poly)
        open_(cfg, ps, [st], witness, poly)
        proof = ps.into_proof()
        vs = VerifierState(proof)
        parsed = parse_commitment(vs, n_vars, cfg.commitment_ood_samples)
        verify(cfg, vs, parsed, [st])
    finally:
        device.set_enabled(None)
