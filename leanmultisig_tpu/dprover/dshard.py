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


def use_fused() -> bool:
    """Whether the whole-layer fused FS-threaded kernels (dgkr
    _fused_layer_fn, dsumcheck _fused_product_rounds_fn, dair
    _fused_air_phase_fn) should be used. Opt-in via LMS_FUSE=1; never
    under a sharding mesh.

    Off by default: each unrolled-round fused kernel costs 50-200+ s of
    XLA compile (measured on XLA:CPU; the TPU pipeline is slower still)
    and a full prove needs ~15-20 of them per shape set — the first
    prove would spend >40 min compiling, which starves the benchmark
    deadline. The unfused per-dispatch paths are transcript-identical
    and their small shape-cached kernels compile in seconds. The
    scan-structured batched kernels (e.g. dwhir._stir_equality_fn) are
    compile-cheap and stay on unconditionally off-mesh."""
    import os
    if _MESH is not None:
        return False
    return os.environ.get("LMS_FUSE", "") == "1"


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
