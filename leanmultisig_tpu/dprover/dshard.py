"""Multi-chip sharding for the device prover (GSPMD).

Design (SURVEY §2.17, scaling-book recipe): pick a Mesh, annotate the
BULK arrays — trace columns, memory, the stacked polynomial, eq tables —
with a row sharding, and let XLA insert the collectives (psum for
sumcheck reductions, all_to_all/ppermute for bit-reverse gathers and DFT
stages, all_gather where a replicated value is needed). Every value the
transcript depends on is computed exactly (integer field ops), so the
N-chip transcript is byte-identical to the 1-chip transcript — asserted
by tests/test_multichip.py.

Usage:
    with prover_mesh(jax.make_mesh((8,), ("rows",))):
        prove_execution_dev(...)

Arrays whose leading dim is divisible by the mesh size are placed
sharded on upload (dfs.to_dev_monty); everything else stays replicated.
"""

from __future__ import annotations

import contextlib

_MESH = None


def make_prover_mesh(n_devices: int):
    """1-D "rows" mesh in AUTO sharding mode (GSPMD propagation — the
    prover annotates inputs only and lets XLA insert collectives)."""
    import jax
    return jax.make_mesh((n_devices,), ("rows",),
                         axis_types=(jax.sharding.AxisType.Auto,))


def current_mesh():
    return _MESH


@contextlib.contextmanager
def prover_mesh(mesh):
    """Activate `mesh` (any 1-D jax Mesh with axis name "rows") for all
    device-prover uploads inside the context."""
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield mesh
    finally:
        _MESH = prev


def shard_rows(x):
    """Place a device/host array row-sharded over the active mesh when
    its leading dim divides evenly; replicated otherwise."""
    mesh = _MESH
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    if x.ndim >= 1 and x.shape[0] >= n_dev and x.shape[0] % n_dev == 0:
        spec = P("rows", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))
