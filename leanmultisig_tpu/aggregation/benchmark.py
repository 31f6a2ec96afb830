"""Aggregation-tree benchmark runner.

Analog of the reference `rec_aggregation/benchmark.rs`
(AggregationTopology + run_aggregation_benchmark, :50-132,491+): build a
tree whose leaves are XMSS signature-aggregation proofs and whose inner
nodes recursively wrap their children, time every node, and emit a JSON
report with per-node {time, proof KiB, cycles, n_xmss}.

The leaves here all share one signer set + per-leaf message (the
reference's type-1 leaves); inner nodes use prove_aggregated over
same-shape children (recursion_driver).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

import numpy as np

from ..field.constants import P
from .driver import aggregate, make_signers, sign_all
from .recursion_driver import (_inner_shape, prove_aggregated,
                               verify_recursive)


@dataclass
class NodeStats:
    kind: str            # "leaf" | "merge"
    n_xmss: int
    prove_s: float       # mean over reps
    proof_kib: float
    cycles: int
    ci95_s: float = 0.0  # 1.96 * stderr over reps (benchmark.rs:50-132)
    children: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return {"kind": self.kind, "n_xmss": self.n_xmss,
                "prove_s": round(self.prove_s, 3),
                "ci95_s": round(self.ci95_s, 3),
                "proof_kib": round(self.proof_kib, 1),
                "cycles": self.cycles,
                "children": [c.as_dict() for c in self.children]}


def _timed(fn, reps: int):
    """Run fn() `reps` times -> (last result, mean_s, ci95_s)."""
    times = []
    out = None
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    mean = sum(times) / len(times)
    if len(times) > 1:
        var = sum((t - mean) ** 2 for t in times) / (len(times) - 1)
        ci95 = 1.96 * (var ** 0.5) / (len(times) ** 0.5)
    else:
        ci95 = 0.0
    return out, mean, ci95


@dataclass
class AggregationTopology:
    """fanouts[0] = signatures per leaf; fanouts[1:] = children per
    merge level (bottom-up). E.g. [4, 2, 2]: leaves of 4 sigs, pairs of
    leaves merged, pairs of merges merged."""
    fanouts: list

    def n_leaves(self) -> int:
        n = 1
        for f in self.fanouts[1:]:
            n *= f
        return n

    def total_signatures(self) -> int:
        return self.n_leaves() * self.fanouts[0]


def run_aggregation_benchmark(topology: AggregationTopology, builder,
                              seed: int = 42, verify: bool = True,
                              warmup: int = 0, reps: int = 1) -> dict:
    """Run the whole tree; returns the JSON-able report.

    warmup: untimed leaf proves beforehand (jit/native-kernel caches);
    reps: timed repetitions per node, reported as mean +/- 95% CI
    (benchmark.rs:50-132 analog)."""
    rng = np.random.default_rng(seed)
    n_sigs = topology.fanouts[0]
    signers = make_signers(n_sigs)
    pub_keys = [pk for _, pk in signers]

    for _ in range(warmup):
        wmsg = rng.integers(0, P, size=8, dtype=np.uint32)
        aggregate(wmsg, pub_keys, sign_all(signers, wmsg), builder,
                  native_check=False)

    t_total = time.perf_counter()
    # --- leaves: XMSS aggregation proofs (one message per leaf) -----------
    leaves = []
    leaf_stats = []
    bc = None
    for _ in range(topology.n_leaves()):
        message = rng.integers(0, P, size=8, dtype=np.uint32)
        sigs = sign_all(signers, message)
        (bc, pub, proof, md), dt, ci = _timed(
            lambda: aggregate(message, pub_keys, sigs, builder,
                              native_check=False), reps)
        leaves.append((pub, proof))
        leaf_stats.append(NodeStats("leaf", n_sigs, dt,
                                    proof.proof_size_fe() * 4 / 1024,
                                    md["cycles"], ci95_s=ci))

    # --- merge levels (bottom-up) ----------------------------------------
    level_nodes = leaves
    level_stats = leaf_stats
    level_bc = bc
    inner_pub_len = len(leaves[0][0])
    for fan in topology.fanouts[1:]:
        next_nodes, next_stats = [], []
        assert len(level_nodes) % fan == 0
        log_memory, tlr, _ = _inner_shape(level_bc, level_nodes[0][0],
                                          level_nodes[0][1], builder)
        for i in range(0, len(level_nodes), fan):
            children = level_nodes[i:i + fan]
            (obc, opub, oproof, md), dt, ci = _timed(
                lambda: prove_aggregated(level_bc, children, builder,
                                         builder), reps)
            if verify:
                verify_recursive(level_bc, obc, opub, oproof, builder,
                                 log_memory, tlr, inner_pub_len,
                                 input_data=md["input_data"])
            st = NodeStats("merge",
                           sum(s.n_xmss for s in next_children_stats(
                               level_stats, i, fan)), dt,
                           oproof.proof_size_fe() * 4 / 1024, md["cycles"],
                           ci95_s=ci, children=level_stats[i:i + fan])
            next_nodes.append((opub, oproof))
            next_stats.append(st)
        level_nodes, level_stats = next_nodes, next_stats
        level_bc = obc
        inner_pub_len = len(level_nodes[0][0])

    total_s = time.perf_counter() - t_total
    root = level_stats[0] if len(level_stats) == 1 else None
    return {
        "topology": topology.fanouts,
        "total_signatures": topology.total_signatures(),
        "total_s": round(total_s, 2),
        "sigs_per_s": round(topology.total_signatures() / total_s, 4),
        "root": root.as_dict() if root else [s.as_dict()
                                            for s in level_stats],
    }


def next_children_stats(stats, i, fan):
    return stats[i:i + fan]


def run_unified_benchmark(topology: AggregationTopology, builder,
                          seed: int = 42, verify: bool = True,
                          reps: int = 1) -> dict:
    """Tree benchmark over the UNIFIED self-referential program: every
    node (leaf or merge) is a proof of the same bytecode sharing one
    (message, slot) type-1 statement; the root is checked against the
    single trust root (unified_driver.verify_root)."""
    from . import unified_driver as UD

    rng = np.random.default_rng(seed)
    n_sigs = topology.fanouts[0]
    total = topology.total_signatures()
    max_fan = max(topology.fanouts[1:], default=1)
    up = UD.compile_unified(total, max_fan, builder)

    slot = 111
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    signers = make_signers(total, slot)
    sigs = sign_all(signers, message, slot)
    pub_keys = [pk for _, pk in signers]

    t_total = time.perf_counter()
    level_nodes, level_stats = [], []
    for i in range(topology.n_leaves()):
        lo = i * n_sigs
        pks = pub_keys[lo:lo + n_sigs]
        node, dt, ci = _timed(
            lambda: UD.prove_leaf(up, message, pks,
                                  sigs[lo:lo + n_sigs], slot), reps)
        level_nodes.append(node)
        level_stats.append(NodeStats(
            "leaf", n_sigs, dt,
            node.proof.proof_size_fe() * 4 / 1024,
            node.metadata["cycles"], ci95_s=ci))

    for fan in topology.fanouts[1:]:
        next_nodes, next_stats = [], []
        assert len(level_nodes) % fan == 0
        for i in range(0, len(level_nodes), fan):
            children = level_nodes[i:i + fan]
            node, dt, ci = _timed(
                lambda: UD.prove_node(up, children, message, slot), reps)
            next_nodes.append(node)
            next_stats.append(NodeStats(
                "merge", sum(s.n_xmss for s in level_stats[i:i + fan]),
                dt, node.proof.proof_size_fe() * 4 / 1024,
                node.metadata["cycles"], ci95_s=ci,
                children=level_stats[i:i + fan]))
        level_nodes, level_stats = next_nodes, next_stats

    if verify:
        for node in level_nodes:
            UD.verify_root(up, node)

    total_s = time.perf_counter() - t_total
    root = level_stats[0] if len(level_stats) == 1 else None
    return {
        "topology": topology.fanouts, "unified": True,
        "total_signatures": total,
        "total_s": round(total_s, 2),
        "sigs_per_s": round(total / total_s, 4),
        "root": root.as_dict() if root else [s.as_dict()
                                             for s in level_stats],
    }


@dataclass
class TreeTopology:
    """Arbitrary aggregation tree (reference AggregationTopology,
    benchmark.rs:14-19): each node verifies `raw_xmss` signatures
    in-circuit AND recursively wraps its children's proofs. The
    reference's per-node log_inv_rate / overlap fields are accepted for
    preset parity but a run uses ONE rate (the builder's) — per-node
    rates would need one unified bytecode per config, and overlap
    (shared signers between siblings) only changes the signer set
    construction, not the proving work."""
    raw_xmss: int
    children: list = field(default_factory=list)
    log_inv_rate: int = 1
    overlap: int = 0

    def total_signatures(self) -> int:
        return self.raw_xmss + sum(c.total_signatures()
                                   for c in self.children)

    def max_node_sigs(self) -> int:
        own = self.raw_xmss + sum(c.total_signatures()
                                  for c in self.children)
        return max([own] + [c.max_node_sigs() for c in self.children])

    def max_fanout(self) -> int:
        return max([len(self.children)]
                   + [c.max_fanout() for c in self.children])

    def depth(self) -> int:
        return 1 + max((c.depth() for c in self.children), default=0)


def fancy_topology(scale: int = 1) -> TreeTopology:
    """The reference's FancyAggregation preset (src/main.rs:114-178):
    a depth-5 mixed tree over 5666 signatures. `scale` divides every
    raw count (minimum 1) so the same SHAPE runs at reduced size."""
    def s(n: int) -> int:
        return max(1, n // scale)

    deep_pair = lambda rate: TreeTopology(0, [  # noqa: E731
        TreeTopology(s(1550), [], rate), TreeTopology(s(508), [], 2)], 2,
        overlap=10)
    return TreeTopology(0, [
        TreeTopology(s(10), [
            TreeTopology(s(25), [deep_pair(1), deep_pair(2)], 1,
                         overlap=5),
            TreeTopology(0, [TreeTopology(s(775), [], 2),
                             TreeTopology(s(775), [], 2)], 2),
        ], 2),
    ], 2)


def run_tree_topology_benchmark(tree: TreeTopology, builder,
                                seed: int = 42, verify: bool = True,
                                reps: int = 1) -> dict:
    """Run an ARBITRARY topology over the unified self-referential
    program (every node is a proof of the same bytecode; raw signatures
    and recursive children mix freely at each node — main.rs
    FancyAggregation analog)."""
    from . import unified_driver as UD

    rng = np.random.default_rng(seed)
    total = tree.total_signatures()
    up = UD.compile_unified(tree.max_node_sigs(),
                            max(tree.max_fanout(), 1), builder)

    slot = 111
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    signers = make_signers(total, slot)
    sigs_all = sign_all(signers, message, slot)
    pub_keys = [pk for _, pk in signers]
    cursor = [0]

    def take(n: int):
        lo = cursor[0]
        cursor[0] += n
        return pub_keys[lo:lo + n], sigs_all[lo:lo + n]

    t_total = time.perf_counter()

    def walk(node: TreeTopology):
        child_results = [walk(c) for c in node.children]
        pks, sigs = take(node.raw_xmss)
        if not node.children:
            proof, dt, ci = _timed(
                lambda: UD.prove_leaf(up, message, pks, sigs, slot), reps)
        else:
            raw = (pks, sigs) if node.raw_xmss else None
            proof, dt, ci = _timed(
                lambda: UD.prove_node(
                    up, [p for p, _ in child_results], message, slot,
                    raw=raw), reps)
        stats = NodeStats(
            "leaf" if not node.children else "merge",
            node.raw_xmss + sum(s.n_xmss for _, s in child_results),
            dt, proof.proof.proof_size_fe() * 4 / 1024,
            proof.metadata["cycles"], ci95_s=ci,
            children=[s for _, s in child_results])
        return proof, stats

    root_proof, root_stats = walk(tree)
    if verify:
        UD.verify_root(up, root_proof)
    total_s = time.perf_counter() - t_total
    return {
        "topology": "tree", "unified": True, "depth": tree.depth(),
        "total_signatures": total,
        "total_s": round(total_s, 2),
        "sigs_per_s": round(total / total_s, 4),
        "root": root_stats.as_dict(),
    }


def render_tree(report: dict) -> str:
    """Live-tree style rendering (benchmark.rs:491+ analog)."""
    lines = [f"aggregation tree {report['topology']}: "
             f"{report['total_signatures']} sigs in {report['total_s']}s "
             f"({report['sigs_per_s']} sigs/s)"]

    def walk(node, depth):
        pad = "  " * depth
        ci = node.get("ci95_s", 0)
        ci_str = f" +/-{ci}" if ci else ""
        lines.append(f"{pad}{node['kind']}: {node['n_xmss']} sigs, "
                     f"{node['prove_s']}s{ci_str}, {node['proof_kib']} KiB, "
                     f"{node['cycles']} cycles")
        for c in node.get("children", []):
            walk(c, depth + 1)

    root = report["root"]
    if isinstance(root, list):
        for r in root:
            walk(r, 0)
    else:
        walk(root, 0)
    return "\n".join(lines)
