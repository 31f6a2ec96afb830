"""Multi-host proving over DCN (jax.distributed).

Scaling story (SURVEY §2.17 / scaling-book recipe): the row dimension of
every bulk array — trace columns, memory, the stacked polynomial, eq
tables — shards over ONE logical "rows" axis laid out as
(hosts × local_chips), so consecutive row blocks live on chips connected
by ICI and only the top tree-reduction / psum hops cross DCN. All field
ops are exact integer arithmetic, so the N-host transcript is
byte-identical to the 1-host transcript (the same invariant
tests/test_multichip.py asserts for the 8-virtual-device single-host
mesh).

This module is the host-topology layer only; it cannot be exercised in a
single-host environment (this repo's CI runs a virtual 8-device CPU mesh
instead). On a real pod slice:

    from leanmultisig_tpu.dprover import multihost
    multihost.initialize()                       # per host, before jax use
    mesh = multihost.make_multihost_prover_mesh()
    with prover_mesh(mesh):
        prove_execution_dev(...)                  # every host runs this

Every host runs the identical prover program SPMD-style; uploads of
host-resident witness data go through `global_row_sharded`, which wraps
`jax.make_array_from_process_local_data` so each host contributes its
row block without materializing the global array anywhere.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var defaults
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on
    TPU pods all three are auto-detected from the metadata server)."""
    import jax
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_multihost_prover_mesh():
    """1-D "rows" mesh over ALL devices of the job, ordered so each
    host's local chips are contiguous: intra-block fold/DFT traffic rides
    ICI, only the log2(n_hosts) top levels of reductions cross DCN."""
    import jax
    from jax.sharding import AxisType, Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), axis_names=("rows",),
                axis_types=(AxisType.Auto,))


def global_row_sharded(mesh, host_block: np.ndarray):
    """Assemble a globally row-sharded array from per-host blocks.

    host_block: this host's contiguous rows (global order = process
    order, matching make_multihost_prover_mesh). Returns a jax.Array
    whose global shape is (n_hosts * block_rows, ...).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_proc = jax.process_count()
    global_shape = (host_block.shape[0] * n_proc,) + host_block.shape[1:]
    sharding = NamedSharding(mesh, P("rows", *([None] *
                                               (host_block.ndim - 1))))
    return jax.make_array_from_process_local_data(
        sharding, host_block, global_shape)
