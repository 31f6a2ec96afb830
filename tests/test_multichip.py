"""Multi-chip prover correctness: N-device transcript == 1-device.

The device prover is sharded with GSPMD (dprover/dshard.py): bulk arrays
are row-sharded over a Mesh and XLA inserts the collectives. All field
ops are exact integer arithmetic, so sharding must not change a single
transcript word — this asserts byte-identical proofs for a FULL
prove_execution on the 8-virtual-device CPU mesh (VERDICT r1 item 3).
"""

import numpy as np

from leanmultisig_tpu.vm import ExecutionWitness


def test_8dev_full_prove_transcript_identical():
    import jax
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.dprover.dprove import prove_execution_dev
    from leanmultisig_tpu.dprover.dshard import (make_prover_mesh,
                                                 prover_mesh)
    from leanmultisig_tpu.fs.merkle_pruning import restore
    from leanmultisig_tpu.prover.prove import prove_execution

    assert len(jax.devices()) >= 8, "conftest forces 8 virtual devices"
    bc = build_program()
    pub = [5, 6, 7]
    builder = _test_builder()

    host_proof, _ = prove_execution(bc, pub, ExecutionWitness(), builder)

    mesh = make_prover_mesh(8)
    with prover_mesh(mesh):
        dev_proof, _ = prove_execution_dev(bc, pub, ExecutionWitness(),
                                           builder)

    assert np.array_equal(host_proof.transcript, dev_proof.transcript)
    assert len(host_proof.merkle_paths) == len(dev_proof.merkle_paths)
    for hg, dg in zip(host_proof.merkle_paths, dev_proof.merkle_paths):
        for a, b in zip(restore(hg), restore(dg)):
            assert a.leaf_index == b.leaf_index
            assert np.array_equal(a.leaf_data, b.leaf_data)
            assert np.array_equal(a.sibling_hashes, b.sibling_hashes)


def test_sharded_upload_placement():
    """Row-divisible arrays land sharded; others replicated."""
    from leanmultisig_tpu.dprover.dfs import to_dev_monty
    from leanmultisig_tpu.dprover.dshard import (make_prover_mesh,
                                                 prover_mesh)

    mesh = make_prover_mesh(8)
    with prover_mesh(mesh):
        big = to_dev_monty(np.arange(1 << 10, dtype=np.uint32))
        small = to_dev_monty(np.arange(3, dtype=np.uint32))
    assert len(big.sharding.device_set) == 8
    assert big.sharding.shard_shape(big.shape) == (128,)
    assert small.sharding.shard_shape(small.shape) == (3,)
