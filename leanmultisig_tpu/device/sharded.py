"""Multi-chip sharded proving kernels.

Design (SURVEY §2.17 mapping): the RS domain / trace rows are sharded over
a 1-D `rows` mesh axis with `jax.sharding` annotations; the DFT butterfly
layers and the Merkle tree reduction are expressed as pure jnp ops under
one jit, and XLA's SPMD partitioner inserts the ICI collectives for the
cross-chip butterfly stages and the tree top. (This is the
"annotate shardings, let XLA insert collectives" recipe — no hand-written
NCCL analog, unlike the reference's rayon/SIMD parallelism.)
"""

from __future__ import annotations

import functools

import numpy as np


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=16)
def _commit_fn(log_n: int, k: int, r: int, mesh_key: int):
    """jit: hypercube evals (monty, row-sharded) -> (leaf digests, root)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from ..poseidon import perm
    from ..whir.dft import twiddles_for_layer

    n = 1 << log_n
    block_size = (n << r) >> k
    log_bs = block_size.bit_length() - 1
    n_blocks = 1 << k
    tw = tuple(jf.to_monty_np(twiddles_for_layer(log_bs, s))
               for s in range(r, log_bs))

    def commit(evals_m):
        # reorder: M[row, j] = evals[j * 2^(n-k) + (row >> r)]
        cols = evals_m.reshape(n_blocks, n >> k)
        mat = jnp.repeat(cols.T, 1 << r, axis=0)  # (block_size, n_blocks)
        # evals-basis DFT over axis 0, skipping the first r identity layers
        x = mat
        for li, s in enumerate(range(r, log_bs)):
            L = 1 << s
            t = jnp.asarray(tw[li])
            v4 = x.reshape(block_size >> (s + 1), 2, L, n_blocks)
            u, v = v4[:, 0], v4[:, 1]
            w = jf.mul(jf.sub(v, u), t[None, :, None])
            x = jnp.stack([jf.add(u, w), jf.sub(u, w)], axis=1).reshape(
                block_size, n_blocks)
        # merkle leaf hash (rows absorbed right-to-left) + tree reduce
        n_chunks = n_blocks // 8
        state = x[:, n_blocks - 16:]
        state = perm.compress(state)
        for chunk_idx in range(n_chunks - 3, -1, -1):
            chunk = x[:, chunk_idx * 8:(chunk_idx + 1) * 8]
            state = jnp.concatenate([state[:, :8], chunk], axis=1)
            state = perm.compress(state)
        digests = state[:, :8]
        cur = digests
        for _ in range(log_bs):
            cur = perm.compress(cur.reshape(-1, 16))[:, :8]
        return digests, cur[0]

    return jax.jit(commit)


def sharded_whir_commit(evals: np.ndarray, folding_factor: int,
                        log_inv_rate: int, mesh):
    """Row-sharded WHIR commit over `mesh` (axis "rows").

    evals: (2^n,) canonical host array. Returns (leaf digests, root) as
    host canonical arrays; digests stay sharded on device until fetched.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..field import jnp_field as jf

    log_n = evals.shape[0].bit_length() - 1
    fn = _commit_fn(log_n, folding_factor, log_inv_rate, id(mesh))
    x = jax.device_put(jf.to_monty_np(evals),
                       NamedSharding(mesh, P("rows")))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else _nullcontext():
        digests_m, root_m = fn(x)
    return (jf.from_monty_np(np.asarray(digests_m)),
            jf.from_monty_np(np.asarray(root_m)))


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@functools.lru_cache(maxsize=4)
def _prove_step_fn(log_rows: int, mesh_key: int):
    """ONE jit over the mesh covering every sharded phase pattern of the
    prover: stacked commit (RS reorder + evals-basis DFT butterflies +
    Merkle leaf hash + tree reduce), Fiat-Shamir absorb/sample on a
    replicated duplex state, eq-table weighted sumcheck round partials
    (cross-chip modular reduction), a GKR quotient layer-up, and the
    extension-field fold that starts the next round. The full
    dispatch-per-round pipeline (dprover/) is transcript-checked against
    the host prover in tests/test_multichip.py; this single-dispatch step
    is what the driver dry-runs (compile + execute) on the virtual mesh.
    """
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from ..poseidon import perm
    from ..whir.dft import twiddles_for_layer

    n = 1 << log_rows
    k, r = 4, 2  # folding factor, log_inv_rate
    block_size = (n << r) >> k
    log_bs = block_size.bit_length() - 1
    n_blocks = 1 << k
    tw = tuple(jf.to_monty_np(twiddles_for_layer(log_bs, s))
               for s in range(r, log_bs))

    def step(parts, eq_table, alpha):
        # -- stack columns into the committed polynomial (row-sharded) --
        evals_m = jnp.concatenate(parts)

        # -- WHIR commit: reorder + DFT + merkle leaves + tree root --
        cols = evals_m.reshape(n_blocks, n >> k)
        x = jnp.repeat(cols.T, 1 << r, axis=0)
        for li, s in enumerate(range(r, log_bs)):
            L = 1 << s
            t = jnp.asarray(tw[li])
            v4 = x.reshape(block_size >> (s + 1), 2, L, n_blocks)
            u, v = v4[:, 0], v4[:, 1]
            w = jf.mul(jf.sub(v, u), t[None, :, None])
            x = jnp.stack([jf.add(u, w), jf.sub(u, w)], axis=1).reshape(
                block_size, n_blocks)
        state = perm.compress(x[:, :16])
        digests = state[:, :8]
        cur = digests
        for _ in range(log_bs):
            cur = perm.compress(cur.reshape(-1, 16))[:, :8]
        root = cur[0]

        # -- Fiat-Shamir: absorb the root into a replicated duplex state --
        fs = jnp.zeros(16, jnp.uint32)
        fs = perm.permute(
            jnp.concatenate([fs[:8], root])[None, :])[0]
        gamma = fs[8:13]  # one EF sample from the rate

        # -- sumcheck round: h(0), h(2) partial sums + cross-chip reduce --
        half = n // 2
        lo = jf.efrom_base(evals_m[:half])
        hi = jf.efrom_base(evals_m[half:])
        diff = jf.esub(hi, lo)
        at2 = jf.eadd(hi, diff)
        h0 = jf.sum_mod(jf.emul(lo, eq_table), 0)
        h2 = jf.sum_mod(jf.emul(at2, eq_table), 0)

        # -- GKR quotient layer-up on the same rows --
        n1, d1 = lo, jf.eadd(hi, jnp.broadcast_to(gamma, hi.shape))
        n2, d2 = at2, jf.eadd(lo, jnp.broadcast_to(gamma, lo.shape))
        num_up = jf.eadd(jf.emul(n1, d2), jf.emul(n2, d1))
        den_up = jf.emul(d1, d2)

        # -- fold at alpha for the next round (stays sharded) --
        folded = jf.eadd(lo, jf.emul(jnp.broadcast_to(alpha, diff.shape),
                                     diff))
        return root, gamma, h0, h2, num_up, den_up, folded

    return jax.jit(step)


def sharded_prove_step(mesh) -> None:
    """Compile + execute the single-jit sharded prove step on `mesh`
    (tiny shapes), with inputs row-sharded so XLA's SPMD partitioner
    inserts the ICI collectives. Raises on any compile/exec failure."""
    jax, jnp = _jax()
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..field import jnp_field as jf

    n_devices = len(mesh.devices.reshape(-1))
    log_rows = max(8, (16 * n_devices - 1).bit_length())
    n = 1 << log_rows
    rng = np.random.default_rng(7)
    p = 2**31 - 2**24 + 1
    spec = NamedSharding(mesh, P("rows"))
    espec = NamedSharding(mesh, P("rows", None))
    parts = tuple(
        jax.device_put(jf.to_monty_np(
            rng.integers(0, p, size=(n // 4,), dtype=np.uint32)), spec)
        for _ in range(4))
    eq_table = jax.device_put(jf.to_monty_np(
        rng.integers(0, p, size=(n // 2, 5), dtype=np.uint32)), espec)
    alpha = jnp.asarray(jf.to_monty_np(
        rng.integers(0, p, size=(5,), dtype=np.uint32)))
    fn = _prove_step_fn(log_rows, id(mesh))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else _nullcontext():
        outs = fn(parts, eq_table, alpha)
    jax.block_until_ready(outs)
    assert outs[0].shape == (8,) and outs[6].shape == (n // 2, 5)
