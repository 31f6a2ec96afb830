"""Recursive proving driver: wrap an inner ExecutionProof in an outer
proof of its in-circuit verification.

Mirrors the reference recursion architecture (rec_aggregation): the outer
guest is the generated full verifier (logup + GKR + AIR + stacked WHIR,
recursion.py), specialized to the inner proof's shape and the inner
bytecode's hash. The one claim the guest cannot check itself — the inner
bytecode MLE evaluation — is exposed through the outer public input and
checked host-side against the actual bytecode (bytecode_claims.rs:35-106
does the same reduction outside the snark).

Outer public input layout (generate_logup_verifier):
  [gkr_point (total_gkr*5) | gkr_num (5) | gkr_den (5) | bytecode_value
   (5) | inner_public_input | logup_alphas (n_alphas*5)]
"""

from __future__ import annotations

import numpy as np

from ..compiler import compile_program
from ..fs.verifier import ProofError, VerifierState
from ..poly import np_poly as pp
from ..protocols.logup import (compute_total_active_len,
                               max_bus_width_including_domainsep,
                               sort_tables_by_height)
from ..prover.prove import SNARK_DOMAIN_SEP, prove_execution
from ..prover.verify import verify_execution
from ..vm import ExecutionWitness, execute_bytecode
from ..vm import tables as T
from ..vm.poseidon_host import poseidon16_compress_pair
from ..whir.config import WhirConfig
from .guest_lib import resolve_guest_lib
from .recursion import generate_logup_verifier

N_ALPHAS = 4  # (max_bus_width_including_domainsep() - 1).bit_length()
LOG_INSTR = 4

_GUEST_CACHE: dict = {}


def _inner_shape(inner_bc, inner_public_input, proof, builder):
    """Read the inner proof's dims chunk (the same prefix the guest
    binds) to derive the guest specialization parameters."""
    vs = VerifierState(proof)
    vs.observe_scalars(np.asarray(inner_public_input, np.uint32))
    bc_hash_ds = poseidon16_compress_pair(inner_bc.hash, SNARK_DOMAIN_SEP)
    vs.observe_scalars(bc_hash_ds)
    dims = [int(x) for x in vs.next_base_scalars_vec(3 + len(T.ALL_TABLES))]
    log_memory = dims[1]
    table_log_n_rows = {t: dims[3 + i] for i, t in enumerate(T.ALL_TABLES)}
    return log_memory, table_log_n_rows, bc_hash_ds


def outer_guest_for_shape(inner_bc, log_memory: int, table_log_n_rows: dict,
                          inner_public_len: int, tlen: int, n_children: int,
                          inner_builder):
    """Compile (cached) THE outer verifier guest for a given inner proof
    shape. This is the recursion trust root: a verifier regenerates the
    guest from shape parameters + the TRUSTED inner bytecode, so an
    adversarial prover cannot substitute its own outer program
    (get_aggregation_bytecode analog, type_2_aggregation.rs:165-176)."""
    from ..protocols.stacked_pcs import compute_stacked_n_vars
    bc_hash_ds = poseidon16_compress_pair(inner_bc.hash, SNARK_DOMAIN_SEP)
    stacked_n_vars = compute_stacked_n_vars(log_memory, inner_bc.log_size(),
                                            table_log_n_rows)
    ood = WhirConfig(inner_builder, stacked_n_vars).commitment_ood_samples
    key = (log_memory, tuple(sorted(table_log_n_rows.items())), ood,
           inner_public_len, tuple(int(x) for x in bc_hash_ds),
           inner_builder.starting_log_inv_rate, tlen, n_children)
    if key not in _GUEST_CACHE:
        src, pub_len, preamble_len = generate_logup_verifier(
            log_memory=log_memory,
            log_bytecode=inner_bc.log_size(),
            table_log_heights=table_log_n_rows,
            commitment_ood_samples=ood,
            inner_public_len=inner_public_len,
            bytecode_hash_domsep=[int(x) for x in bc_hash_ds],
            starting_log_inv_rate=inner_builder.starting_log_inv_rate,
            tlen=tlen, air_section=True,
            whir_config_builder=inner_builder,
            ending_pc=inner_bc.ending_pc, n_proofs=n_children)
        _GUEST_CACHE[key] = (compile_program(
            src, import_resolver=resolve_guest_lib), pub_len, preamble_len)
    return _GUEST_CACHE[key]


def prove_recursively(inner_bc, inner_public_input, inner_proof,
                      inner_builder, outer_builder):
    """Single-child wrapper over prove_aggregated."""
    return prove_aggregated(inner_bc, [(inner_public_input, inner_proof)],
                            inner_builder, outer_builder)


def prove_aggregated(inner_bc, children, inner_builder, outer_builder):
    """-> (outer_bytecode, outer_public_input, outer_proof, metadata).

    children: [(public_input, proof)] sharing inner_bc and proof shape.
    One guest function verifies each child in turn (type-1 aggregation
    structure, rec_aggregation/type_1_aggregation.rs analog): host-
    verifies each child (producing the raw transcript the guest
    consumes), executes the generated multi-verifier guest, proves it."""
    assert children
    pub0, proof0 = children[0]
    log_memory, table_log_n_rows, bc_hash_ds = _inner_shape(
        inner_bc, pub0, proof0, inner_builder)

    from ..protocols.logup import verify_generic_logup
    from ..protocols.stacked_pcs import stacked_pcs_parse_commitment

    per_child = []
    for inner_public_input, inner_proof in children:
        vs = VerifierState(inner_proof)
        vs.observe_scalars(np.asarray(inner_public_input, np.uint32))
        vs.observe_scalars(bc_hash_ds)
        dims = [int(x)
                for x in vs.next_base_scalars_vec(3 + len(T.ALL_TABLES))]
        assert dims[1] == log_memory, "children must share proof shape"
        stacked_n_vars, _pc = stacked_pcs_parse_commitment(
            inner_builder, vs, log_memory, inner_bc.log_size(),
            table_log_n_rows)
        logup_c = vs.sample()
        vs.duplex()
        alphas = vs.sample_vec(N_ALPHAS)
        logup = verify_generic_logup(
            vs, logup_c, alphas, pp.eval_eq(alphas), log_memory,
            inner_bc.instructions_multilinear, table_log_n_rows)
        _bc_eval, raw = verify_execution(inner_bc, inner_public_input,
                                         inner_proof, inner_builder)
        per_child.append((inner_public_input, logup, alphas, raw))

    raw0 = per_child[0][3]
    guest_bc, outer_pub_len, preamble_len = outer_guest_for_shape(
        inner_bc, log_memory, table_log_n_rows, len(pub0),
        int(raw0.transcript.size), len(children), inner_builder)

    input_data = []
    hints = {"raw_transcript": [], "inner_public_input": [],
             "bytecode_value": [], "whir_leaf": [], "whir_path": []}
    bc_points = []
    pub_pad = -(-len(pub0) // 8) * 8
    pm_pot = 1 if len(pub0) <= 1 else 1 << (len(pub0) - 1).bit_length()
    buf = max(pub_pad, pm_pot)
    for inner_public_input, logup, alphas, raw in per_child:
        assert raw.transcript.size == raw0.transcript.size, \
            "children must share transcript shape"
        bc_point, bc_value = logup["bytecode_evaluation"]
        bc_points.append(bc_point)
        input_data += ([int(x) for x in logup["gkr_point"].reshape(-1)]
                       + [int(x) for x in logup["numerators_value"]]
                       + [int(x) for x in logup["denominators_value"]]
                       + [int(x) for x in bc_value]
                       + [int(x) for x in inner_public_input]
                       + [int(x) for x in alphas.reshape(-1)])
        hints["raw_transcript"].append([int(x) for x in raw.transcript])
        hints["inner_public_input"].append(
            list(int(x) for x in inner_public_input)
            + [0] * (buf - len(inner_public_input)))
        hints["bytecode_value"].append([int(x) for x in bc_value])
        hints["whir_leaf"] += [[int(x) for x in op.leaf_data.reshape(-1)]
                               for op in raw.merkle_openings]
        hints["whir_path"] += [[int(x) for x in op.path.reshape(-1)]
                               for op in raw.merkle_openings]

    # digest-compressed outer public input (type_2_aggregation.rs:93-163):
    # pub = T-sponge digest of the zero-padded input data
    outer_pub = [int(x) for x in input_data_digest(input_data)]
    assert len(outer_pub) == outer_pub_len
    hints["input_data"] = [list(input_data)]

    witness = ExecutionWitness(preamble_memory_len=preamble_len,
                               hints=hints)
    outer_proof, metadata = prove_execution(guest_bc, outer_pub, witness,
                                            outer_builder)
    metadata["bc_points"] = bc_points
    metadata["n_children"] = len(children)
    metadata["inner_transcript_len"] = int(raw0.transcript.size)
    metadata["input_data"] = input_data
    return guest_bc, outer_pub, outer_proof, metadata


def input_data_digest(input_data: list):
    """8-FE T-sponge (IV mode) digest over the zero-padded claim data."""
    from ..vm.poseidon_host import poseidon_compress_slice
    padded = list(input_data) + [0] * (-len(input_data) % 8)
    return poseidon_compress_slice(np.asarray(padded, np.uint32),
                                   use_iv=True)


def verify_recursive(inner_bc, outer_bc, outer_public_input, outer_proof,
                     outer_builder, log_memory: int, table_log_n_rows: dict,
                     inner_public_len: int, input_data=None):
    """Verify an outer (recursive) proof:
      1. the outer ExecutionProof itself (for the generated guest);
      2. digest binding: the outer public input is the 8-FE digest of
         the claim `input_data` (supplied with the proof artifact);
      3. the exposed bytecode claim against the ACTUAL inner bytecode —
         the one reduction the guest delegates to the host
         (bytecode_claims.rs:35-106 analog).
    The caller supplies the inner proof shape (it generated the guest).
    Returns the list of inner public inputs embedded in the outer claim
    (one per child; a single list for the 1-child case)."""
    verify_execution(outer_bc, outer_public_input, outer_proof,
                     outer_builder)
    if input_data is None:
        raise ProofError("input_data required (digest-compressed claims)")
    if [int(x) for x in outer_public_input] != \
            [int(x) for x in input_data_digest(input_data)]:
        raise ProofError("input data does not match the outer digest")

    tables_sorted = sort_tables_by_height(table_log_n_rows)
    total_gkr = (compute_total_active_len(
        log_memory, inner_bc.log_size(), tables_sorted) - 1).bit_length()
    seg_len = total_gkr * 5 + 15 + inner_public_len + N_ALPHAS * 5
    pub = [int(x) for x in input_data]
    assert len(pub) % seg_len == 0
    inner_pubs = []
    for base in range(0, len(pub), seg_len):
        gkr_point, _num, _den, bc_value, inner_pub, alphas = \
            parse_outer_public_input(pub[base:base + seg_len], total_gkr,
                                     inner_public_len)
        bc_point = np.concatenate([gkr_point[-inner_bc.log_size():],
                                   alphas[-LOG_INSTR:]])
        expected = pp.eval_mle(inner_bc.instructions_multilinear, bc_point)
        if not np.array_equal(expected, bc_value):
            raise ProofError("recursive bytecode claim mismatch")
        inner_pubs.append(inner_pub)
    return inner_pubs[0] if len(inner_pubs) == 1 else inner_pubs


def parse_outer_public_input(pub, total_gkr: int, inner_public_len: int):
    """Split the outer public input into its typed fields."""
    pub = [int(x) for x in pub]
    k = total_gkr * 5
    gkr_point = np.asarray(pub[:k], np.uint32).reshape(total_gkr, 5)
    gkr_num = np.asarray(pub[k:k + 5], np.uint32)
    gkr_den = np.asarray(pub[k + 5:k + 10], np.uint32)
    bc_value = np.asarray(pub[k + 10:k + 15], np.uint32)
    inner_pub = pub[k + 15:k + 15 + inner_public_len]
    alphas = np.asarray(pub[k + 15 + inner_public_len:],
                        np.uint32).reshape(-1, 5)
    return gkr_point, gkr_num, gkr_den, bc_value, inner_pub, alphas
