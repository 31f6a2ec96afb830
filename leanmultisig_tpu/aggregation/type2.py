"""Type-2 aggregation: bundle N independent type-1 proofs (each with its
own message/slot) into ONE recursive proof, and split components back out.

Reference: rec_aggregation/src/type_2_aggregation.rs —
  merge_many_type_1 (:93-163)  -> one proof over n type-1 claims
  verify_type_2     (:165-176) -> rebuild per-component claims + verify
  split_type_2      (:194-258) -> re-prove ONE component standalone

Like the reference, the outer public input is DIGEST-COMPRESSED: a fixed
8-FE T-sponge digest of the per-component claim data (`input_data`),
independent of the total signer count; the claim data travels with the
proof artifact and the guest re-hashes its hinted copy in-circuit.
Splitting re-proves the retained child alone (the `kept_type1_buff`
analog is `Type2Proof.components`; the reference's in-guest `is_split`
path, type_2_aggregation.rs:194-258, is replaced by a re-wrap).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fs.verifier import ProofError
from .recursion_driver import (_inner_shape, outer_guest_for_shape,
                               prove_aggregated, verify_recursive)


@dataclass
class Type1Proof:
    """One aggregation leaf: a proof that n XMSS signatures over ONE
    message verify against the listed public keys
    (type_1_aggregation.rs:162-185 claim layout)."""
    bytecode: object
    public_input: list
    proof: object
    metadata: dict = field(default_factory=dict)


@dataclass
class Type2Proof:
    """One outer proof attesting to every component type-1 claim."""
    outer_bytecode: object
    outer_public_input: list
    outer_proof: object
    inner_bytecode: object
    log_memory: int
    table_log_n_rows: dict
    inner_public_len: int
    inner_transcript_len: int = 0
    n_children: int = 1
    # claim data whose digest is the outer public input
    input_data: list = field(default_factory=list)
    # retained children enabling split_type_2 (kept_type1_buff analog,
    # type_2_aggregation.rs:194-258)
    components: list = field(default_factory=list)
    metadata: dict = field(default_factory=dict)


def prove_type_1(message, pub_keys, signatures, whir_config_builder,
                 slot=None, native_check: bool = True) -> Type1Proof:
    """Prove one aggregation leaf (thin wrapper over driver.aggregate)."""
    from .driver import BENCHMARK_SLOT, aggregate
    slot = BENCHMARK_SLOT if slot is None else slot
    bc, pub, proof, md = aggregate(message, pub_keys, signatures,
                                   whir_config_builder, slot=slot,
                                   native_check=native_check)
    return Type1Proof(bc, pub, proof, md)


def merge_many_type_1(type1s: list, inner_builder,
                      outer_builder) -> Type2Proof:
    """n independent type-1 proofs -> ONE recursive proof
    (type_2_aggregation.rs:93-163).

    Components must share the inner guest bytecode and proof shape (the
    reference has the same constraint: one recursion bytecode, fixed
    child layout); messages/claims may differ per component."""
    assert type1s, "need at least one component"
    bc0 = type1s[0].bytecode
    for t1 in type1s[1:]:
        if t1.bytecode is not bc0 and not np.array_equal(
                t1.bytecode.hash, bc0.hash):
            raise ValueError("components must share the type-1 bytecode")
    children = [(t1.public_input, t1.proof) for t1 in type1s]
    log_memory, table_log_n_rows, _ds = _inner_shape(
        bc0, children[0][0], children[0][1], inner_builder)
    outer_bc, outer_pub, outer_proof, md = prove_aggregated(
        bc0, children, inner_builder, outer_builder)
    return Type2Proof(outer_bc, outer_pub, outer_proof, bc0,
                      log_memory, table_log_n_rows,
                      len(children[0][0]),
                      inner_transcript_len=md["inner_transcript_len"],
                      n_children=len(children),
                      input_data=list(md["input_data"]),
                      components=list(type1s), metadata=md)


def verify_type_2(t2: Type2Proof, inner_bytecode, inner_builder,
                  outer_builder) -> list:
    """Verify the outer proof + the host-side bytecode-claim reduction,
    and return each component's type-1 public input (its claim)
    (type_2_aggregation.rs:165-176).

    Trust root: `inner_bytecode` is a TRUSTED caller argument (the known
    type-1 guest, get_aggregation_bytecode analog) — never read from the
    proof artifact — and the outer guest bytecode is REGENERATED from the
    declared shape, so an adversarial prover cannot substitute a trivial
    outer program."""
    expected_bc, _pub_len, _pre = outer_guest_for_shape(
        inner_bytecode, t2.log_memory, t2.table_log_n_rows,
        t2.inner_public_len, t2.inner_transcript_len, t2.n_children,
        inner_builder)
    inner_pubs = verify_recursive(
        inner_bytecode, expected_bc, t2.outer_public_input,
        t2.outer_proof, outer_builder, t2.log_memory, t2.table_log_n_rows,
        t2.inner_public_len, input_data=t2.input_data)
    if t2.inner_public_len and not isinstance(inner_pubs[0], list):
        inner_pubs = [inner_pubs]  # single component
    return inner_pubs


def split_type_2(t2: Type2Proof, index: int, inner_builder,
                 outer_builder) -> Type2Proof:
    """Re-prove component `index` as a STANDALONE recursive proof
    (type_2_aggregation.rs:194-258 `is_split` path): the retained child
    proof is wrapped alone, detaching it from its siblings."""
    if not t2.components:
        raise ProofError("components were not retained; cannot split")
    if not 0 <= index < len(t2.components):
        raise IndexError(index)
    return merge_many_type_1([t2.components[index]], inner_builder,
                             outer_builder)


def parse_type1_claim(public_input, slot: int | None = None) -> tuple:
    """Decode a type-1 public input into (n_sigs, message, per-signer
    (merkle_root, public_param)) — the claim each component attests to
    (build_type1_input_data analog, type_1_aggregation.rs:162-185).

    When `slot` is given, the embedded merkle_chunks + tweaks_hash are
    checked against it (the slot is a runtime input of the guest)."""
    from .guest import compute_merkle_chunks, compute_tweaks_hash
    pub = [int(x) for x in public_input]
    n = pub[0]
    message = np.asarray(pub[1:9], np.uint32)
    chunks = pub[9:17]
    tweaks_hash = pub[17:25]
    if slot is not None:
        if chunks != compute_merkle_chunks(slot):
            raise ProofError("merkle chunks do not match the slot")
        if tweaks_hash != [int(x) for x in compute_tweaks_hash(slot)]:
            raise ProofError("tweaks hash does not match the slot")
    signers = []
    off = 25
    for _ in range(n):  # 4-FE merkle root + 4-FE public param per signer
        root = np.asarray(pub[off:off + 4], np.uint32)
        pp_ = np.asarray(pub[off + 4:off + 8], np.uint32)
        signers.append((root, pp_))
        off += 8
    if off != len(pub):
        raise ProofError("malformed type-1 public input")
    return n, message, signers
