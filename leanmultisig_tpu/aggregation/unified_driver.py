"""Host driver for the unified self-referential aggregation program.

Mirrors rec_aggregation/src/{compilation.rs, type_1_aggregation.rs,
type_2_aggregation.rs}: fixed-point compilation of the one program,
hint packing for each node kind, proof-shape forcing, and the root
checks (digest binding, domain-separator pinning, reduced bytecode
claim).

The fixed point iterates (log_bytecode, bytecode_zero_eval, log_memory,
table shape, tlen) until a program compiled with those constants proves
instances whose natural shape fits the constants and whose transcript
length matches (compilation.rs:81-98 iterates log_size the same way;
shape and tlen are extra fixed-point coordinates here because proofs are
padded with force_shape rather than placeholder tables)."""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass

import numpy as np

from ..compiler import compile_program
from ..fs.verifier import ProofError, VerifierState
from ..poly import np_poly as pp
from ..prover.prove import SNARK_DOMAIN_SEP, prove_execution
from ..prover.verify import verify_execution
from ..protocols.logup import (max_bus_width_including_domainsep,
                               verify_generic_logup)
from ..protocols.stacked_pcs import (compute_stacked_n_vars,
                                     stacked_pcs_parse_commitment)
from ..vm import ExecutionWitness, execute_bytecode
from ..vm import tables as T
from ..vm.poseidon_host import (poseidon_compress_slice,
                                poseidon16_compress_pair)
from ..whir.config import WhirConfig
from . import claims as C
from .guest import (compute_merkle_chunks, compute_tweak_table,
                    compute_tweaks_hash)
from .guest_lib import resolve_guest_lib
from .unified import (TYPE_1_FLAG, TYPE_2_FLAG, UnifiedParams,
                      generate_unified)

N_ALPHAS = (max_bus_width_including_domainsep() - 1).bit_length()  # 4
DIGEST_LEN = 8


@dataclass
class UnifiedProgram:
    """A converged unified program: bytecode + all protocol constants."""
    params: UnifiedParams
    bytecode: object
    layout: dict
    src_hash: str

    @property
    def force_shape(self):
        return (self.params.log_memory,
                dict(self.params.table_log_heights))

    @property
    def domsep(self) -> np.ndarray:
        return poseidon16_compress_pair(self.bytecode.hash,
                                        SNARK_DOMAIN_SEP)


@dataclass
class UnifiedProof:
    """One tree node's proof artifact: the input data is the full public
    statement (the proof's public input is its 8-FE digest)."""
    input_data: list
    proof: object
    metadata: dict


def input_data_digest(input_data) -> list:
    padded = list(int(x) for x in input_data)
    padded += [0] * (-len(padded) % DIGEST_LEN)
    return [int(x) for x in poseidon_compress_slice(
        np.asarray(padded, np.uint32), use_iv=True)]


# --------------------------------------------------------------------------
# input-data construction (main.py:14-31 layout)
# --------------------------------------------------------------------------


def _t1_input_data(up_layout, n_sigs: int, claim_flat, domsep,
                   pubkeys_hash, message, slot: int) -> list:
    L = up_layout
    data = [TYPE_1_FLAG, n_sigs, 0, 0, 0, 0, 0, 0]
    assert len(claim_flat) == L["CLAIM_PADDED"]
    data += [int(x) for x in claim_flat]
    data += [int(x) for x in domsep]
    data += [int(x) for x in pubkeys_hash]
    data += [int(x) for x in message]
    data += compute_merkle_chunks(slot)
    data += [int(x) for x in compute_tweaks_hash(slot)]
    assert len(data) == L["T1_SIZE"]
    return data


def _t2_input_data(up_layout, component_digests: list, claim_flat,
                   domsep) -> list:
    L = up_layout
    data = [TYPE_2_FLAG, len(component_digests), 0, 0, 0, 0, 0, 0]
    data += [int(x) for x in claim_flat]
    data += [int(x) for x in domsep]
    for d in component_digests:
        data += [int(x) for x in d]
    assert len(data) == L["COMPONENT_OFF"] + 8 * len(component_digests)
    return data


def pubkeys_hash_iv(pub_keys: list) -> np.ndarray:
    """IV-mode chain over [root | pp] chunks (slice_hash_iv_dyn)."""
    flat = []
    for pk in pub_keys:
        flat += [int(x) for x in pk.merkle_root]
        flat += [int(x) for x in pk.public_param]
    return poseidon_compress_slice(np.asarray(flat, np.uint32), use_iv=True)


def _zero_claim_field(up: UnifiedProgram) -> np.ndarray:
    point, value = C.zero_claim(up.bytecode, up.params.bytecode_n_vars)
    return C.flatten_claim(point, value, pad=True)


def _parse_claim(up: UnifiedProgram, input_data):
    L = up.layout
    flat = input_data[L["CLAIM_OFF"]:L["CLAIM_OFF"] + L["CLAIM_PADDED"]]
    return C.unflatten_claim(flat, up.params.bytecode_n_vars)


# --------------------------------------------------------------------------
# per-child verification replay (fresh delegated claim + raw transcript)
# --------------------------------------------------------------------------


def _replay_child(up: UnifiedProgram, child: UnifiedProof):
    """Host-verify one child proof; returns (fresh_claim, raw_transcript,
    merkle_openings, bval) — the data the guest's verify_child consumes
    (recursion_driver.prove_aggregated per-child block)."""
    p = up.params
    pub = input_data_digest(child.input_data)
    vs = VerifierState(child.proof)
    vs.observe_scalars(np.asarray(pub, np.uint32))
    vs.observe_scalars(up.domsep)
    dims = [int(x) for x in vs.next_base_scalars_vec(3 + len(T.ALL_TABLES))]
    assert dims[1] == p.log_memory, (dims, p.log_memory)
    table_log_n_rows = {t: dims[3 + i] for i, t in enumerate(T.ALL_TABLES)}
    assert table_log_n_rows == p.table_log_heights
    stacked_pcs_parse_commitment(p.whir_config_builder, vs, p.log_memory,
                                 p.log_bytecode, table_log_n_rows)
    logup_c = vs.sample()
    vs.duplex()
    alphas = vs.sample_vec(N_ALPHAS)
    logup = verify_generic_logup(
        vs, logup_c, alphas, pp.eval_eq(alphas), p.log_memory,
        up.bytecode.instructions_multilinear, table_log_n_rows)
    _bc_eval, raw = verify_execution(up.bytecode, pub, child.proof,
                                     p.whir_config_builder)
    bc_point, bc_value = logup["bytecode_evaluation"]
    assert raw.transcript.size == p.tlen, (raw.transcript.size, p.tlen)
    return (bc_point, bc_value), raw


# --------------------------------------------------------------------------
# node provers
# --------------------------------------------------------------------------


def _prove(up: UnifiedProgram, input_data, hints) -> UnifiedProof:
    witness = ExecutionWitness(
        preamble_memory_len=up.layout["PREAMBLE_LEN"], hints=hints)
    pub = input_data_digest(input_data)
    proof, metadata = prove_execution(up.bytecode, pub, witness,
                                      up.params.whir_config_builder,
                                      force_shape=up.force_shape)
    return UnifiedProof(list(input_data), proof, metadata)


def _leaf_hints(up: UnifiedProgram, input_data, pub_keys, signatures,
                slot: int) -> dict:
    hints = {"input_data": [list(input_data)],
             "is_split": [[0]],
             "meta": [[0, len(signatures)]],
             "tweak_table": [compute_tweak_table(slot)],
             "pubkeys": [sum(([int(x) for x in pk.merkle_root]
                              + [int(x) for x in pk.public_param]
                              for pk in pub_keys), [])],
             "raw_indices": [list(range(len(signatures)))],
             "aggregate_sizes": [[]],
             "wots_sig": [], "xmss_merkle_node": []}
    for sig in signatures:
        hints["wots_sig"].append(
            [int(x) for x in sig.randomness]
            + [int(x) for x in sig.chain_tips.reshape(-1)])
        for level_nodes in sig.merkle_proof:
            hints["xmss_merkle_node"].append([int(x) for x in level_nodes])
    return hints


def prove_leaf(up: UnifiedProgram, message, pub_keys: list,
               signatures: list, slot: int) -> UnifiedProof:
    """Type-1 node with all-raw signatures (n_recursions == 0)."""
    n = len(signatures)
    assert 1 <= n <= up.params.max_n_sigs
    input_data = _t1_input_data(
        up.layout, n, _zero_claim_field(up), up.domsep,
        pubkeys_hash_iv(pub_keys), message, slot)
    hints = _leaf_hints(up, input_data, pub_keys, signatures, slot)
    out = _prove(up, input_data, hints)
    out.metadata["pubkeys_flat"] = _flat_pks(pub_keys)
    return out


def _flat_pks(pub_keys: list) -> list:
    return sum(([int(x) for x in pk.merkle_root]
                + [int(x) for x in pk.public_param]
                for pk in pub_keys), [])


def _node_artifacts(up: UnifiedProgram, children: list, message,
                    slot: int, raw: tuple | None = None):
    """(input_data, hints) of a type-1 recursion node (main.py:162-236
    general path). raw: optional (pub_keys, signatures) verified
    in-circuit alongside the recursive children."""
    p, L = up.params, up.layout
    assert 1 <= len(children) <= p.max_recursions
    for ch in children:
        assert ch.input_data[0] == TYPE_1_FLAG, "children must be type-1"
    raw_pks, raw_sigs = raw if raw is not None else ([], [])
    n_raw = len(raw_sigs)

    hints = {"is_split": [[0]],
             "meta": [[len(children), n_raw]],
             "tweak_table": [compute_tweak_table(slot)],
             "raw_indices": [list(range(n_raw))],
             "aggregate_sizes": [[int(ch.input_data[1])
                                  for ch in children]],
             "sub_indices": [], "inner_bytecode_claim": [],
             "raw_transcript": [], "bytecode_value": [],
             "whir_leaf": [], "whir_path": [],
             "wots_sig": [], "xmss_merkle_node": []}
    for sig in raw_sigs:
        hints["wots_sig"].append(
            [int(x) for x in sig.randomness]
            + [int(x) for x in sig.chain_tips.reshape(-1)])
        for level_nodes in sig.merkle_proof:
            hints["xmss_merkle_node"].append([int(x) for x in level_nodes])

    # the node's pubkey set = raw pks ++ the children's sets; each
    # child's running hash must then equal its own pubkeys_hash field
    all_pk_flat = _flat_pks(raw_pks)
    claim_list = []
    base = n_raw
    n_sigs = n_raw
    for ch in children:
        n_sub = int(ch.input_data[1])
        all_pk_flat += _expected_child_pubkeys(up, ch)
        hints["sub_indices"].append(list(range(base, base + n_sub)))
        base += n_sub
        n_sigs += n_sub

        emb_point, emb_value = _parse_claim(up, ch.input_data)
        hints["inner_bytecode_claim"].append(
            [int(x) for x in C.flatten_claim(emb_point, emb_value,
                                             pad=True)])
        (fr_point, fr_value), raw = _replay_child(up, ch)
        hints["raw_transcript"].append([int(x) for x in raw.transcript])
        hints["bytecode_value"].append([int(x) for x in fr_value])
        hints["whir_leaf"] += [[int(x) for x in op.leaf_data.reshape(-1)]
                               for op in raw.merkle_openings]
        hints["whir_path"] += [[int(x) for x in op.path.reshape(-1)]
                               for op in raw.merkle_openings]
        claim_list += [(emb_point, emb_value), (fr_point, fr_value)]

    reduced_point, reduced_value, red_transcript = C.reduce_claims(
        claim_list, up.bytecode.instructions_multilinear)
    hints["reduction_transcript"] = [[int(x) for x in red_transcript]]

    pk_hash = poseidon_compress_slice(
        np.asarray(all_pk_flat, np.uint32), use_iv=True)
    input_data = _t1_input_data(
        L, n_sigs, C.flatten_claim(reduced_point, reduced_value, pad=True),
        up.domsep, pk_hash, message, slot)
    hints["input_data"] = [list(input_data)]
    hints["pubkeys"] = [all_pk_flat]
    return input_data, hints, all_pk_flat


def prove_node(up: UnifiedProgram, children: list, message,
               slot: int, raw: tuple | None = None) -> UnifiedProof:
    """Type-1 node aggregating type-1 children recursively, optionally
    mixed with raw in-circuit signature verifications (main.py general
    path)."""
    input_data, hints, all_pk_flat = _node_artifacts(up, children, message,
                                                     slot, raw)
    out = _prove(up, input_data, hints)
    out.metadata["pubkeys_flat"] = all_pk_flat
    return out


def _expected_child_pubkeys(up: UnifiedProgram, ch: UnifiedProof) -> list:
    """The child's pubkey list is NOT in its input data (only its hash);
    the parent driver carries it in metadata."""
    pks = ch.metadata.get("pubkeys_flat")
    assert pks is not None, "child proof lacks pubkeys metadata"
    L = up.layout
    expected = poseidon_compress_slice(np.asarray(pks, np.uint32),
                                       use_iv=True)
    off = L["COMPONENT_OFF"]
    assert [int(x) for x in expected] == \
        [int(x) for x in ch.input_data[off:off + 8]]
    return list(pks)


def prove_split(up: UnifiedProgram, t2: UnifiedProof, kept_index: int,
                kept_input_data: list) -> UnifiedProof:
    """Type-1 split proof: extract component `kept_index` from a type-2
    proof (main.py:75-108). kept_input_data is the kept component's full
    T1 input data (its digest is embedded in the type-2 statement); the
    split proof's own statement fields equal the kept component's and it
    verifies WITHOUT the sibling components."""
    p, L = up.params, up.layout
    assert t2.input_data[0] == TYPE_2_FLAG
    n_components = int(t2.input_data[1])
    assert 0 <= kept_index < n_components
    kept_input_data = [int(x) for x in kept_input_data]
    assert len(kept_input_data) == L["T1_SIZE"]
    co = L["COMPONENT_OFF"]
    assert input_data_digest(kept_input_data) == \
        t2.input_data[co + 8 * kept_index:co + 8 * (kept_index + 1)], \
        "kept_input_data does not match the component digest"

    emb_point, emb_value = _parse_claim(up, t2.input_data)
    (fr_point, fr_value), raw = _replay_child(up, t2)
    reduced_point, reduced_value, red_transcript = C.reduce_claims(
        [(emb_point, emb_value), (fr_point, fr_value)],
        up.bytecode.instructions_multilinear)

    input_data = ([TYPE_1_FLAG, kept_input_data[1], 0, 0, 0, 0, 0, 0]
                  + [int(x) for x in C.flatten_claim(
                      reduced_point, reduced_value, pad=True)]
                  + [int(x) for x in up.domsep]
                  + kept_input_data[co:co + 32])
    assert len(input_data) == L["T1_SIZE"]

    hints = {"input_data": [list(input_data)],
             "is_split": [[1]],
             "type2_meta": [[n_components, kept_index]],
             "inner_type2_layout": [[int(x) for x in t2.input_data]],
             "kept_type1_buff": [list(kept_input_data)],
             "raw_transcript": [[int(x) for x in raw.transcript]],
             "bytecode_value": [[int(x) for x in fr_value]],
             "whir_leaf": [[int(x) for x in op.leaf_data.reshape(-1)]
                           for op in raw.merkle_openings],
             "whir_path": [[int(x) for x in op.path.reshape(-1)]
                           for op in raw.merkle_openings],
             "reduction_transcript": [[int(x) for x in red_transcript]]}
    return _prove(up, input_data, hints)


def prove_merge(up: UnifiedProgram, components: list) -> UnifiedProof:
    """Type-2 node: merge n type-1 proofs (main.py:49-71)."""
    p, L = up.params, up.layout
    assert 1 <= len(components) <= p.max_recursions
    hints = {"component_layout": [], "raw_transcript": [],
             "bytecode_value": [], "whir_leaf": [], "whir_path": []}
    digests = []
    claim_list = []
    for ch in components:
        assert ch.input_data[0] == TYPE_1_FLAG
        assert len(ch.input_data) == L["T1_SIZE"]
        hints["component_layout"].append(
            [int(x) for x in ch.input_data])
        digests.append(input_data_digest(ch.input_data))
        emb_point, emb_value = _parse_claim(up, ch.input_data)
        (fr_point, fr_value), raw = _replay_child(up, ch)
        hints["raw_transcript"].append([int(x) for x in raw.transcript])
        hints["bytecode_value"].append([int(x) for x in fr_value])
        hints["whir_leaf"] += [[int(x) for x in op.leaf_data.reshape(-1)]
                               for op in raw.merkle_openings]
        hints["whir_path"] += [[int(x) for x in op.path.reshape(-1)]
                               for op in raw.merkle_openings]
        claim_list += [(emb_point, emb_value), (fr_point, fr_value)]

    reduced_point, reduced_value, red_transcript = C.reduce_claims(
        claim_list, up.bytecode.instructions_multilinear)
    hints["reduction_transcript"] = [[int(x) for x in red_transcript]]

    input_data = _t2_input_data(
        L, digests, C.flatten_claim(reduced_point, reduced_value, pad=True),
        up.domsep)
    hints["input_data"] = [list(input_data)]
    return _prove(up, input_data, hints)


# --------------------------------------------------------------------------
# root verification (bytecode_claims.rs + type_*_aggregation.rs verify)
# --------------------------------------------------------------------------


def verify_root(up: UnifiedProgram, node: UnifiedProof) -> dict:
    """Verify a tree-root proof against the TRUSTED unified bytecode:
      1. the ExecutionProof itself (public input = digest of input_data);
      2. domain-separator pinning: the input data's domsep field equals
         hash(trusted bytecode hash, SNARK_DOMAIN_SEP) — this transitively
         pins every level of the tree (compilation.rs design);
      3. the reduced bytecode claim against the actual bytecode MLE
         (compute_bytecode_value_at).
    Returns the parsed statement fields."""
    p, L = up.params, up.layout
    data = [int(x) for x in node.input_data]
    pub = input_data_digest(data)
    verify_execution(up.bytecode, pub, node.proof, p.whir_config_builder)

    off = L["DOMSEP_OFF"]
    if data[off:off + 8] != [int(x) for x in up.domsep]:
        raise ProofError("domain separator not pinned to the trusted "
                         "unified bytecode")

    point, value = _parse_claim(up, data)
    flat = data[L["CLAIM_OFF"]:L["CLAIM_OFF"] + L["CLAIM_PADDED"]]
    if flat[L["CLAIM_SIZE"]:] != [0] * (L["CLAIM_PADDED"]
                                        - L["CLAIM_SIZE"]):
        raise ProofError("claim padding not zero")
    if not C.verify_reduced_claim(point, value,
                                  up.bytecode.instructions_multilinear):
        raise ProofError("reduced bytecode claim does not match the "
                         "unified bytecode")

    flag = data[0]
    out = {"flag": flag, "count": data[1]}
    co = L["COMPONENT_OFF"]
    if flag == TYPE_1_FLAG:
        out["pubkeys_hash"] = data[co:co + 8]
        out["message"] = data[co + 8:co + 16]
        out["merkle_chunks"] = data[co + 16:co + 24]
        out["tweaks_hash"] = data[co + 24:co + 32]
    else:
        out["component_digests"] = [
            data[co + 8 * i:co + 8 * (i + 1)] for i in range(data[1])]
    return out


# --------------------------------------------------------------------------
# fixed-point compilation (compilation.rs:36-98)
# --------------------------------------------------------------------------


def _cache_dir() -> str | None:
    d = os.environ.get(
        "UNIFIED_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..",
                     ".unified_cache"))
    return d or None


def compile_unified(max_n_sigs: int, max_recursions: int,
                    whir_config_builder, *, verbose: bool = False,
                    _probe_slot: int = 111) -> UnifiedProgram:
    """Iterate (log_bytecode, zero_eval, log_memory, shape, tlen) to the
    fixed point where the program verifies proofs of itself. Probes one
    max-workload leaf and one max-fan-in node per iteration; the result
    (pure function of the arguments + protocol constants) is cached on
    disk."""
    from ..utils.logs import span

    key = (max_n_sigs, max_recursions,
           whir_config_builder.starting_log_inv_rate,
           whir_config_builder.security_level,
           whir_config_builder.soundness_type,
           whir_config_builder.pow_bits)
    cache_dir = _cache_dir()
    cache_file = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache_file = os.path.join(
            cache_dir, "uap_%s.pkl" % "_".join(str(k) for k in key))
        if os.path.exists(cache_file):
            import hashlib
            with open(cache_file, "rb") as f:
                entry = pickle.load(f)
            if len(entry) == 3:  # older 2-tuple caches: re-converge
                params, L, src_digest = entry
                src, L2 = generate_unified(params)
                fresh = hashlib.sha256(src.encode()).hexdigest()
                if L2 == L and fresh == src_digest:
                    bc = compile_program(src,
                                         import_resolver=resolve_guest_lib)
                    return UnifiedProgram(params, bc, L, fresh)
            # generator changed since the cache was written: re-converge

    # initial guesses
    guess = dict(log_bytecode=17, zero_eval=0, log_memory=19,
                 shape={T.EXECUTION: 18, T.EXTENSION_OP: 15,
                        T.POSEIDON16: 14},
                 tlen=40000)

    for iteration in range(12):
        snv = compute_stacked_n_vars(guess["log_memory"],
                                     guess["log_bytecode"], guess["shape"])
        ood = WhirConfig(whir_config_builder, snv).commitment_ood_samples
        params = UnifiedParams(
            max_n_sigs=max_n_sigs, max_recursions=max_recursions,
            log_memory=guess["log_memory"],
            table_log_heights=dict(guess["shape"]), tlen=guess["tlen"],
            whir_config_builder=whir_config_builder,
            log_bytecode=guess["log_bytecode"],
            bytecode_zero_eval=guess["zero_eval"],
            commitment_ood_samples=ood)
        src, L = generate_unified(params)
        with span("uap_compile", iteration=iteration):
            bc = compile_program(src, import_resolver=resolve_guest_lib)
        changed = False
        if bc.log_size() != guess["log_bytecode"]:
            guess["log_bytecode"] = bc.log_size()
            changed = True
        z = int(bc.instructions_multilinear[0])
        if z != guess["zero_eval"]:
            guess["zero_eval"] = z
            changed = True
        if guess["log_memory"] < bc.log_size():
            guess["log_memory"] = bc.log_size()
            changed = True
        if changed:
            if verbose:
                print(f"[uap fp] iter {iteration}: bytecode-level "
                      f"restart {guess}")
            continue

        up = UnifiedProgram(params, bc, L, str(hash(src)))
        ok, guess = _probe_shapes(up, guess, _probe_slot, verbose)
        if ok:
            if cache_file:
                import hashlib
                try:
                    with open(cache_file, "wb") as f:
                        pickle.dump(
                            (params, L,
                             hashlib.sha256(src.encode()).hexdigest()), f)
                except OSError:
                    pass
            return up
    raise RuntimeError("unified fixed point did not converge: %r" % guess)


def _natural_shape(up: UnifiedProgram, input_data, hints) -> dict:
    """Execute (no prove) and measure the natural proof shape."""
    from ..vm.trace_gen import get_execution_trace
    witness = ExecutionWitness(
        preamble_memory_len=up.layout["PREAMBLE_LEN"], hints=hints)
    result = execute_bytecode(up.bytecode, input_data_digest(input_data),
                              witness)
    trace = get_execution_trace(up.bytecode, result)
    return {"log_memory": max(int(trace.memory.shape[0] - 1).bit_length(),
                              up.bytecode.log_size()),
            "shape": {t: trace.traces[t].log_n_rows for t in T.ALL_TABLES}}


def _probe_shapes(up: UnifiedProgram, guess: dict, slot: int,
                  verbose: bool):
    """Execute one max-workload leaf and one max-fan-in node (measuring
    natural shapes), then prove the leaf to pin the transcript length."""
    from ..field.constants import P
    from ..utils.logs import span
    from .driver import make_signers, sign_all

    p = up.params
    assert p.max_n_sigs >= p.max_recursions, \
        "max_n_sigs bounds a node's TOTAL count (each child >= 1 sig)"
    rng = np.random.default_rng(1234)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    signers = make_signers(p.max_n_sigs, slot)
    sigs = sign_all(signers, message, slot)
    pub_keys = [pk for _, pk in signers]

    new = dict(guess)
    new["shape"] = dict(guess["shape"])
    ok = True

    def grow_from(nat, what):
        nonlocal ok
        if nat["log_memory"] > new["log_memory"]:
            new["log_memory"] = nat["log_memory"]
            ok = False
        for t in T.ALL_TABLES:
            if nat["shape"][t] > new["shape"][t]:
                new["shape"][t] = nat["shape"][t]
                ok = False
        if verbose:
            print(f"[uap fp] {what}: natural {nat} -> "
                  f"{'fits' if ok else f'grow to {new}'}")

    leaf_data = _t1_input_data(
        up.layout, p.max_n_sigs, _zero_claim_field(up), up.domsep,
        pubkeys_hash_iv(pub_keys), message, slot)
    leaf_hints = _leaf_hints(up, leaf_data, pub_keys, sigs, slot)
    with span("uap_probe_leaf_exec"):
        grow_from(_natural_shape(up, leaf_data, leaf_hints), "leaf")
    if not ok:
        return False, new

    with span("uap_probe_leaf_prove"):
        leaf1 = prove_leaf(up, message, pub_keys[:1], sigs[:1], slot)
    _raw_tlen = _measured_tlen(up, leaf1)
    if _raw_tlen != new["tlen"]:
        new["tlen"] = _raw_tlen
        if verbose:
            print(f"[uap fp] tlen -> {_raw_tlen}")
        return False, new

    # the worst-shape node: max_recursions children PLUS raw signatures
    # filling the remaining capacity (a mixed node pays both the XMSS
    # poseidons and the in-circuit verifier costs)
    n_raw = p.max_n_sigs - p.max_recursions
    with span("uap_probe_node_exec"):
        node_data, node_hints, _pks = _node_artifacts(
            up, [leaf1] * p.max_recursions, message, slot,
            raw=(pub_keys[:n_raw], sigs[:n_raw]) if n_raw else None)
        grow_from(_natural_shape(up, node_data, node_hints), "node")
    return ok, new


def _measured_tlen(up: UnifiedProgram, node: UnifiedProof) -> int:
    """Verifier-reconstructed raw transcript length of a proof (what the
    guest's TLEN const must equal)."""
    _, raw = verify_execution(up.bytecode,
                              input_data_digest(node.input_data),
                              node.proof, up.params.whir_config_builder)
    return int(raw.transcript.size)
