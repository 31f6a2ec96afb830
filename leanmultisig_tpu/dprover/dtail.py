"""Host-tail bridge: run sub-waterline protocol segments on the host.

The device prover's per-round dispatch model pays a fixed per-program
cost on a tunneled TPU (XLA compile on the first run, executable load on
every fresh process) for EVERY distinct kernel shape. Sumcheck-style
protocols halve their arrays every round, so the long tail of rounds
contributes hundreds of shape-specialized programs that each process a
few thousand elements — all cost, no bandwidth. The fix is a waterline:
arrays larger than 2^LMS_WATERLINE rows run as device kernels (shared
across layers/rounds/phases at equal shapes); once a protocol segment
folds below the waterline, its state is fetched once and the remaining
rounds run through the HOST numpy implementation (bit-exact with the
device path by construction — the equality is asserted by
tests/test_dprover.py).

The bridge works on the Fiat-Shamir state: `begin_tail` materializes a
host fs.prover.ProverState seeded with the (fetched) device challenger
state; host protocol code runs unmodified against it; `end_tail` merges
the host transcript/merkle groups back into the DevProverState and
re-uploads the challenger state.

Reference analog: the prover is monolithic Rust (prove_execution.rs);
the split is a TPU-mapping concern with no reference counterpart.
"""

from __future__ import annotations

import os

import numpy as np

from ..fs.prover import ProverState
from ..fs.challenger import Challenger

EXT = 5


def waterline() -> int:
    """Log2 of the largest row count handled by the host tail (0 =
    device-only, no host tails)."""
    return int(os.environ.get("LMS_WATERLINE", "12"))


def below(n_rows: int) -> bool:
    wl = waterline()
    return wl > 0 and n_rows <= (1 << wl)


def fetch(x) -> np.ndarray:
    """Monty device array -> canonical host np array (syncs the stream)."""
    import jax
    from ..field import jnp_field as jf
    return jf.from_monty_np(np.asarray(jax.device_get(x)))


def fetch_many(arrays: list) -> list:
    """Batched fetch: start every device->host copy asynchronously, then
    materialize. A tunneled TPU costs ~30 ms per SYNC fetch round trip;
    a phase handing hundreds of columns to the host tail must overlap
    them (the AIR tail alone fetches ~300 columns — serial round trips
    were ~10 s, the entire phase budget)."""
    import jax
    from ..field import jnp_field as jf
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return [jf.from_monty_np(np.asarray(jax.device_get(a)))
            for a in arrays]


def upload(x):
    """Canonical host np array -> monty device array."""
    from .dfs import to_dev_monty
    return to_dev_monty(np.asarray(x, np.uint32))


class _TailProverState(ProverState):
    """Host ProverState for a tail segment: grinding always runs the
    host native search (the challenger state is already host-resident,
    a device grind round-trip would cost more than it saves)."""

    def pow_grinding(self, bits: int) -> None:
        from ..fs import prover as fsp
        if bits == 0:
            return
        witness = fsp.grind(self.challenger.state[:8], bits)
        self.challenger.observe_many(np.array([witness], np.uint32))
        self.transcript.append(np.array([witness], np.uint32))


def begin_tail(dev_ps) -> ProverState:
    """Fetch the device challenger into a fresh host ProverState. Until
    the matching end_tail, the legacy device offload layer (device/*)
    is force-disabled so tail segments stay pure host — routing a
    sub-waterline merkle/DFT/grind back through the chip would cost a
    program load to save microseconds."""
    from .. import device
    hp = _TailProverState()
    ch = Challenger()
    ch.state = fetch(dev_ps.challenger.state)
    ch.rate_fresh = dev_ps.challenger.rate_fresh
    hp.challenger = ch
    hp._prev_device_forced = device._FORCED
    device.set_enabled(False)
    return hp


def end_tail(dev_ps, hp: ProverState) -> None:
    """Merge the host transcript + merkle groups back; re-upload the
    challenger state."""
    from .. import device
    from ..field import jnp_field as jf
    import jax.numpy as jnp
    device._FORCED = hp._prev_device_forced
    dev_ps.challenger.state = jnp.asarray(
        jf.to_monty_np(hp.challenger.state))
    dev_ps.challenger.rate_fresh = hp.challenger.rate_fresh
    for part in hp.transcript:
        dev_ps.transcript.append(np.asarray(part, np.uint32).ravel())
    for group in hp.merkle_paths:
        dev_ps.merkle_hints.append(("pruned", group))


class DevTreeHostView:
    """Host-side opener for a device-resident DevMerkleTree: one batched
    gather per query set, served as (leaf_base, siblings) per index like
    whir.merkle.WhirMerkleTree.open."""

    def __init__(self, dtree):
        self._t = dtree
        self.is_ext = dtree.is_ext
        self._cache: dict = {}

    def open_batch(self, indexes: list[int]):
        """-> [(full-width canonical leaf row, sibling stack)] exactly
        like whir.merkle.WhirMerkleTree.open (padded row semantics)."""
        import jax
        import jax.numpy as jnp
        idx = jnp.asarray(np.asarray(indexes, np.uint32))
        leaf_rows_c, sibs_c = self._t.open_many(idx)
        leaf_rows = np.asarray(jax.device_get(leaf_rows_c))
        sibs = np.asarray(jax.device_get(sibs_c))
        return [(leaf_rows[q], sibs[q]) for q in range(len(indexes))]


def open_and_hint_host(tree, prover_state, indexes: list[int]):
    """whir.prover._open_and_hint, tolerant of a DevTreeHostView."""
    from ..fs.prover import MerklePath
    from ..whir.merkle import leaf_to_values
    if isinstance(tree, DevTreeHostView):
        opened = tree.open_batch(indexes)
        paths = [MerklePath(row, sib, idx)
                 for (row, sib), idx in zip(opened, indexes)]
        prover_state.hint_merkle_paths(paths)
        return [leaf_to_values(row, tree.is_ext) for row, _ in opened]
    from ..whir.prover import _open_and_hint
    return _open_and_hint(tree, prover_state, indexes)
