"""Unified self-referential aggregation program: ONE bytecode for every
tree node (reference compilation.rs:36-98 + main.py).

The 2-level test proves two XMSS leaves and one recursion node over
them — all three proofs are of the SAME (hash-equal) bytecode — then
verifies the root against the trusted bytecode (digest binding, domsep
pinning, reduced bytecode claim)."""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation import unified_driver as UD
from leanmultisig_tpu.aggregation.driver import make_signers, sign_all
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.verifier import ProofError

SLOT = 111


@pytest.fixture(scope="module")
def uap():
    import test_e2e
    return UD.compile_unified(4, 2, test_e2e._test_builder(), verbose=True)


@pytest.fixture(scope="module")
def tree(uap):
    rng = np.random.default_rng(3)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    signers = make_signers(4, SLOT)
    sigs = sign_all(signers, message, SLOT)
    pub_keys = [pk for _, pk in signers]
    leaf_a = UD.prove_leaf(uap, message, pub_keys[:2], sigs[:2], SLOT)
    leaf_b = UD.prove_leaf(uap, message, pub_keys[2:], sigs[2:], SLOT)
    node = UD.prove_node(uap, [leaf_a, leaf_b], message, SLOT)
    return message, pub_keys, (leaf_a, leaf_b, node)


def test_two_level_tree_same_bytecode(uap, tree):
    message, pub_keys, (leaf_a, leaf_b, node) = tree

    # every level is a proof of the IDENTICAL bytecode: the trust root is
    # ONE hash (the defining property of self-referential recursion)
    out = UD.verify_root(uap, node)
    assert out["count"] == 4
    assert out["message"] == [int(x) for x in message]
    assert out["pubkeys_hash"] == [
        int(x) for x in UD.pubkeys_hash_iv(pub_keys)]
    # leaves verify against the same bytecode as the node
    UD.verify_root(uap, leaf_a)
    UD.verify_root(uap, leaf_b)


def test_type2_merge_and_split(uap, tree):
    message, pub_keys, (leaf_a, leaf_b, _node) = tree
    merged = UD.prove_merge(uap, [leaf_a, leaf_b])
    out = UD.verify_root(uap, merged)
    assert out["flag"] == 2 and out["count"] == 2
    assert out["component_digests"][0] == \
        UD.input_data_digest(leaf_a.input_data)
    assert out["component_digests"][1] == \
        UD.input_data_digest(leaf_b.input_data)

    # true split (main.py is_split path): extract component 1 WITHOUT
    # the sibling; the split proof's statement equals the kept leaf's
    split = UD.prove_split(uap, merged, 1, leaf_b.input_data)
    out2 = UD.verify_root(uap, split)
    assert out2["flag"] == 1
    assert out2["count"] == leaf_b.input_data[1]
    co = uap.layout["COMPONENT_OFF"]
    assert split.input_data[co:co + 32] == \
        [int(x) for x in leaf_b.input_data[co:co + 32]]

    # splitting with a mismatched kept payload must fail
    with pytest.raises((AssertionError, ProofError)):
        UD.prove_split(uap, merged, 0, leaf_b.input_data)


def test_root_rejects_forgeries(uap, tree):
    _message, _pub_keys, (leaf_a, _leaf_b, node) = tree

    # wrong domsep field (an outer program compiled by the adversary
    # could not have the trusted domsep without the trusted bytecode)
    bad = UD.UnifiedProof(list(node.input_data), node.proof,
                          dict(node.metadata))
    off = uap.layout["DOMSEP_OFF"]
    bad.input_data[off] = (bad.input_data[off] + 1) % P
    with pytest.raises((ProofError, AssertionError)):
        UD.verify_root(uap, bad)

    # tampered claim value
    bad2 = UD.UnifiedProof(list(node.input_data), node.proof,
                           dict(node.metadata))
    off2 = uap.layout["CLAIM_OFF"]
    bad2.input_data[off2] = (bad2.input_data[off2] + 1) % P
    with pytest.raises((ProofError, AssertionError)):
        UD.verify_root(uap, bad2)

    # leaf proof presented with a different count
    bad3 = UD.UnifiedProof(list(leaf_a.input_data), leaf_a.proof,
                           dict(leaf_a.metadata))
    bad3.input_data[1] = 3
    with pytest.raises((ProofError, AssertionError)):
        UD.verify_root(uap, bad3)


@pytest.mark.skipif(not __import__('os').environ.get("LMS_SLOW_TESTS"),
                    reason="depth-3 fancy-shaped tree is slow; "
                           "LMS_SLOW_TESTS=1")
def test_depth3_mixed_tree_fancy_shape():
    """Depth-3 tree with raw signatures MIXED into an inner node — the
    shape class of the reference FancyAggregation preset
    (src/main.rs:114-178) at unit scale, over ONE unified bytecode."""
    import test_e2e
    from leanmultisig_tpu.aggregation.benchmark import (
        TreeTopology, run_tree_topology_benchmark)

    tree = TreeTopology(1, [  # root verifies 1 raw sig + 2 children
        TreeTopology(2),      # leaf of 2
        TreeTopology(0, [TreeTopology(1), TreeTopology(1)]),
    ])
    assert tree.depth() == 3 and tree.total_signatures() == 5
    report = run_tree_topology_benchmark(tree, test_e2e._test_builder(),
                                         verify=True)
    assert report["depth"] == 3
    assert report["total_signatures"] == 5
    assert report["root"]["n_xmss"] == 5
