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
