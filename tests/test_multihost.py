"""Multi-host topology helpers (single-process degenerate case).

Real multi-host runs need a pod; here we assert the helpers' invariants
on the virtual 8-device mesh: device ordering is (process, id)-sorted so
row blocks are host-contiguous, and global_row_sharded produces a
row-sharded global array from process-local blocks.
"""

import numpy as np


def test_multihost_mesh_and_upload():
    import jax
    from leanmultisig_tpu.dprover import multihost

    mesh = multihost.make_multihost_prover_mesh()
    devs = list(mesh.devices.reshape(-1))
    assert len(devs) == len(jax.devices())
    order = [(d.process_index, d.id) for d in devs]
    assert order == sorted(order)

    block = np.arange(64, dtype=np.uint32)
    x = multihost.global_row_sharded(mesh, block)
    assert x.shape == (64,)  # process_count() == 1
    assert x.sharding.shard_shape(x.shape) == (8,)
    assert np.array_equal(np.asarray(x), block)


def test_multihost_sharded_matmul_runs():
    """A row-sharded modular reduction over the multihost-style mesh
    compiles and executes (XLA inserts the collectives)."""
    import jax
    from leanmultisig_tpu.dprover import multihost
    from leanmultisig_tpu.field import jnp_field as jf

    mesh = multihost.make_multihost_prover_mesh()
    block = np.arange(1 << 10, dtype=np.uint32)
    x = multihost.global_row_sharded(mesh, block)
    total = jax.jit(lambda v: jf.sum_mod(v, 0))(x)
    expect = sum(range(1 << 10)) % (2**31 - 2**24 + 1)
    assert int(np.asarray(total)) == expect
