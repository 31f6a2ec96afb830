"""Device-resident Fiat-Shamir: challenger state + transcript on device.

The duplex sponge (width 16, rate 8 — challenger.rs:9-76) state lives as
a (16,) Montgomery-form device array; every observe/sample is an async
device dispatch. The transcript accumulates as a host list of canonical
device arrays, concatenated and fetched ONCE in finalize() — no
synchronous device->host read happens anywhere in the proving path.

Bit-exact with fs/challenger.py + fs/prover.py (asserted by tests).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..field.constants import P
from . import dpoly

RATE = 8
WIDTH = 16
CAPACITY = 8
EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def to_dev_monty(x):
    """Host canonical uint32 array -> device monty array (async upload);
    row-sharded over the active prover mesh (dshard) when one is set."""
    _, jnp = _jax()
    from ..field import jnp_field as jf
    from .dshard import current_mesh, shard_rows
    m = jf.to_monty_np(np.asarray(x, np.uint32))
    if current_mesh() is not None:
        return shard_rows(m)
    return jnp.asarray(m)


@functools.cache
def _observe_chunks_fn(n: int):
    """Absorb n raw scalars: ravel + zero-pad to RATE chunks INSIDE the
    kernel (an eager pad/reshape per absorb costs a separate dispatch +
    first-call program load over a tunneled TPU)."""
    jax, jnp = _jax()
    from ..poseidon import perm
    n_chunks = -(-n // RATE)

    @aot_jit
    def observe(state, scalars):
        scalars = scalars.reshape(-1)
        if n_chunks * RATE > n:
            scalars = jnp.concatenate(
                [scalars, jnp.zeros(n_chunks * RATE - n, jnp.uint32)])

        def body(st, chunk):
            st = jnp.concatenate([st[:CAPACITY], chunk])
            return perm.permute(st[None, :])[0], None

        out, _ = jax.lax.scan(body, state,
                              scalars.reshape(n_chunks, RATE))
        return out

    return observe


@functools.cache
def _sample_many_fn(n: int, n_fes: int, ext: int = 0):
    """state -> (state', (n_fes,) monty samples — (n_fes/5, 5) for
    ext=1, (5,) for ext=2): sample, then duplex+sample n-1 times
    (challenger.rs sample_many); slicing/reshaping happens in-kernel."""
    jax, jnp = _jax()
    from ..poseidon import perm

    @aot_jit
    def sample_many(state):
        outs = [state[CAPACITY:]]
        for _ in range(n - 1):
            st = jnp.concatenate(
                [state[:CAPACITY], jnp.zeros(RATE, jnp.uint32)])
            state = perm.permute(st[None, :])[0]
            outs.append(state[CAPACITY:])
        out = jnp.concatenate(outs)[:n_fes]
        if ext == 1:
            out = out.reshape(-1, EXT)
        elif ext == 2:  # single EF sample, squeezed
            out = out.reshape(EXT)
        return state, out

    return sample_many


@functools.cache
def _to_u32_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.to_u32)


@functools.cache
def _tail_u32_fn():
    """coeffs (k,5) monty -> flat canonical transcript words minus the
    elided c0 (fs/prover.py:79-94), in one kernel."""
    from ..field import jnp_field as jf

    @aot_jit
    def tail(coeffs):
        return jf.to_u32(coeffs[1:].reshape(-1))

    return tail


@functools.cache
def _grind_fn(bits: int, batch: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from ..poseidon import perm
    mask = np.uint32((1 << bits) - 1)
    big = np.uint32(0xFFFFFFFF)

    @aot_jit
    def grind(state):
        capacity_m = state[:CAPACITY]

        def cond(carry):
            base, hit = carry
            return hit == big

        def body(carry):
            base, _ = carry
            idx = base + jnp.arange(batch, dtype=jnp.uint32)
            states = jnp.zeros((batch, WIDTH), jnp.uint32)
            states = states.at[:, :CAPACITY].set(capacity_m[None, :])
            states = states.at[:, CAPACITY].set(jf.from_u32(idx))
            out = jf.to_u32(perm.permute(states)[:, CAPACITY])
            ok = (out & mask) == 0
            cand = jnp.where(ok, idx, big)
            return base + np.uint32(batch), jnp.min(cand)

        _, witness = jax.lax.while_loop(
            cond, body, (jnp.uint32(0), jnp.asarray(big)))
        return witness[None], jf.from_u32(witness)[None]

    return grind


class DevChallenger:
    """Device mirror of fs.challenger.Challenger (state in monty form)."""

    def __init__(self) -> None:
        _, jnp = _jax()
        self.state = jnp.zeros(WIDTH, jnp.uint32)
        self.rate_fresh = False

    def observe_many_monty(self, scalars) -> None:
        """scalars: monty device array, any shape (raveled in-kernel)."""
        n = int(np.prod(scalars.shape))
        if n == 0:
            return
        self.state = _observe_chunks_fn(n)(self.state, scalars)
        self.rate_fresh = True

    def observe_host(self, scalars) -> None:
        self.observe_many_monty(to_dev_monty(np.ravel(scalars)))

    def duplex(self) -> None:
        _, jnp = _jax()
        self.observe_many_monty(jnp.zeros(RATE, jnp.uint32))

    def sample_fes(self, n_fes: int, ext: int = 0):
        """-> (n_fes,) monty device (consumes rate; duplexes as needed);
        ext=1 reshapes to (n_fes/5, 5), ext=2 to (5,), in-kernel."""
        assert self.rate_fresh, "stale rate. insert a duplex() before."
        n = -(-n_fes // RATE)
        self.state, out = _sample_many_fn(n, n_fes, ext)(self.state)
        self.rate_fresh = False
        return out


class DevProverState:
    """Device mirror of fs.prover.ProverState; transcript entries are
    canonical device arrays, fetched once at finalize()."""

    def __init__(self) -> None:
        self.challenger = DevChallenger()
        self.transcript: list = []
        self.merkle_hints: list = []  # (leaf_rows_dev, sibs_dev, idx_dev)
        self.grind_bits_used: list[int] = []

    # --- absorption -------------------------------------------------------
    def add_monty_scalars(self, scalars) -> None:
        """scalars: 1-D monty device array; absorbed AND in-transcript."""
        self.challenger.observe_many_monty(scalars)
        self.transcript.append(_to_u32_fn()(scalars))

    def add_host_scalars(self, scalars) -> None:
        scalars = np.asarray(scalars, np.uint32).ravel()
        self.challenger.observe_host(scalars)
        _, jnp = _jax()
        self.transcript.append(jnp.asarray(scalars))

    def observe_monty_scalars(self, scalars) -> None:
        self.challenger.observe_many_monty(scalars)

    def observe_host_scalars(self, scalars) -> None:
        self.challenger.observe_host(np.asarray(scalars, np.uint32).ravel())

    def duplex(self) -> None:
        self.challenger.duplex()

    def add_extension_scalars(self, scalars) -> None:
        """scalars: (k, 5) monty device (raveled in-kernel)."""
        self.add_monty_scalars(scalars)

    def add_extension_scalar(self, scalar) -> None:
        self.add_monty_scalars(scalar)

    def add_sumcheck_polynomial(self, coeffs, eq_alpha=None) -> None:
        """coeffs: (k, 5) monty device (fs/prover.py:79-94 semantics)."""
        if eq_alpha is None:
            self.challenger.observe_many_monty(coeffs)
        else:
            full = dexpand_bare_to_full(coeffs, eq_alpha)
            self.challenger.observe_many_monty(full)
        self.transcript.append(_tail_u32_fn()(coeffs))

    # --- sampling ---------------------------------------------------------
    def sample_vec(self, length: int):
        """-> (length, 5) monty device EF samples."""
        _, jnp = _jax()
        if length == 0:
            return jnp.zeros((0, EXT), jnp.uint32)
        return self.challenger.sample_fes(length * EXT, ext=1)

    def sample(self):
        return self.challenger.sample_fes(EXT, ext=2)

    def sample_in_range_fes(self, n_samples: int):
        """-> (n_samples,) CANONICAL device fes (mask applied by caller).
        Equivalent to sampling ceil(n/RATE)*RATE and truncating: the
        challenger consumes the same number of duplexes either way."""
        return _to_u32_fn()(self.challenger.sample_fes(n_samples))

    # --- pow grinding -----------------------------------------------------
    def pow_grinding(self, bits: int, batch: int = 1 << 15) -> None:
        assert bits < 31
        if bits == 0:
            return
        _, jnp = _jax()
        witness, witness_m = _grind_fn(bits, batch)(self.challenger.state)
        self.challenger.observe_many_monty(witness_m)
        self.transcript.append(witness)
        self.grind_bits_used.append(bits)

    # --- merkle hints -----------------------------------------------------
    def hint_merkle_group(self, leaf_rows, sibs, indices) -> None:
        """leaf_rows: (q, W) canonical dev; sibs: (q, depth, 8) canonical
        dev; indices: (q,) canonical dev."""
        self.merkle_hints.append((leaf_rows, sibs, indices))

    # --- the ONE fetch ----------------------------------------------------
    def finalize(self):
        """Concatenate transcript + merkle hints on device, fetch once,
        rebuild a host fs.prover.Proof (with pruned merkle paths)."""
        _, jnp = _jax()
        from ..fs.prover import MerklePath, Proof
        from ..fs.merkle_pruning import prune
        parts = [jnp.asarray(t).reshape(-1) for t in self.transcript]
        t_lens = [int(t.shape[0]) for t in parts]
        groups_meta = []
        for hint in self.merkle_hints:
            if isinstance(hint, tuple) and len(hint) == 2 \
                    and hint[0] == "pruned":
                # host-tail group, already pruned (dtail.end_tail)
                groups_meta.append(("pruned", hint[1]))
                continue
            leaf_rows, sibs, indices = hint
            parts += [leaf_rows.reshape(-1), sibs.reshape(-1),
                      indices.reshape(-1)]
            groups_meta.append((tuple(leaf_rows.shape), tuple(sibs.shape),
                                int(indices.shape[0])))
        blob = np.asarray(jnp.concatenate(parts) if parts
                          else jnp.zeros(0, jnp.uint32))
        off = sum(t_lens)
        transcript = blob[:off]
        merkle_groups = []
        for meta in groups_meta:
            if meta[0] == "pruned":
                merkle_groups.append(meta[1])
                continue
            (lshape, sshape, q) = meta
            ln = int(np.prod(lshape))
            sn = int(np.prod(sshape))
            leaf_rows = blob[off:off + ln].reshape(lshape)
            sibs = blob[off + ln:off + ln + sn].reshape(sshape)
            idxs = blob[off + ln + sn:off + ln + sn + q]
            off += ln + sn + q
            paths = [MerklePath(leaf_rows[i], sibs[i], int(idxs[i]))
                     for i in range(q)]
            merkle_groups.append(prune(paths))
        assert off == blob.shape[0]
        return Proof(transcript, merkle_groups)


@functools.cache
def _from_u32_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.from_u32)


@functools.cache
def _expand_bare_fn(k: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
    def expand(bare, alpha):
        onej = jnp.asarray(one)
        one_minus_alpha = jf.esub(onej, alpha)
        two_alpha_minus_one = jf.esub(jf.eadd(alpha, alpha), onej)
        d = k - 1
        full = [jf.emul(one_minus_alpha, bare[0])]
        for i in range(1, d + 1):
            full.append(jf.eadd(jf.emul(one_minus_alpha, bare[i]),
                                jf.emul(two_alpha_minus_one, bare[i - 1])))
        full.append(jf.emul(two_alpha_minus_one, bare[d]))
        return jnp.stack(full)

    return expand


def dexpand_bare_to_full(bare, alpha):
    """g(X) = eq(alpha, X) * h(X) expansion (fs/prover.py:170-183)."""
    return _expand_bare_fn(int(bare.shape[0]))(bare, alpha)
