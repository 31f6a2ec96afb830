"""In-circuit logup verification of a REAL inner ExecutionProof: the
recursion guest replays Fiat-Shamir from the public input, binds the
dims, parses the commitment, and verifies the whole logup section
(quotient GKR + every section's num/den reconstruction) inside the zkVM.
"""

import numpy as np
import pytest

from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
from leanmultisig_tpu.aggregation.recursion import generate_logup_verifier
from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.prover.prove import SNARK_DOMAIN_SEP, prove_execution
from leanmultisig_tpu.protocols.logup import (
    max_bus_width_including_domainsep, verify_generic_logup)
from leanmultisig_tpu.protocols.stacked_pcs import stacked_pcs_parse_commitment
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm import tables as T
from leanmultisig_tpu.vm.memory import RunnerError
from leanmultisig_tpu.vm.poseidon_host import poseidon16_compress_pair
from leanmultisig_tpu.whir.config import WhirConfig


def test_guest_verifies_inner_logup():
    from test_e2e import _test_builder
    from test_vm import build_program
    builder = _test_builder()
    bytecode = build_program()
    public_input = [5, 6, 7]

    proof, _meta = prove_execution(bytecode, public_input,
                                   ExecutionWitness(), builder)

    # host verify, capturing the logup intermediates the guest must match
    vs = VerifierState(proof)
    vs.observe_scalars(np.asarray(public_input, np.uint32))
    bc_hash_ds = poseidon16_compress_pair(bytecode.hash, SNARK_DOMAIN_SEP)
    vs.observe_scalars(bc_hash_ds)
    dims = [int(x) for x in vs.next_base_scalars_vec(3 + len(T.ALL_TABLES))]
    log_memory = dims[1]
    table_log_n_rows = {t: dims[3 + i] for i, t in enumerate(T.ALL_TABLES)}
    stacked_n_vars, _pc = stacked_pcs_parse_commitment(
        builder, vs, log_memory, bytecode.log_size(), table_log_n_rows)
    logup_c = vs.sample()
    vs.duplex()
    n_alphas = (max_bus_width_including_domainsep() - 1).bit_length()
    alphas = vs.sample_vec(n_alphas)
    logup = verify_generic_logup(vs, logup_c, alphas, pp.eval_eq(alphas),
                                 log_memory, bytecode.instructions_multilinear,
                                 table_log_n_rows)
    # drain the rest of verification into the raw transcript via the real
    # verifier (the guest only consumes the logup prefix, but the hint
    # buffer holds the full transcript)
    from leanmultisig_tpu.prover.verify import verify_execution
    _bc_eval, raw = verify_execution(bytecode, public_input, proof, builder)

    ood = WhirConfig(builder, stacked_n_vars).commitment_ood_samples
    src, pub_len, preamble_len = generate_logup_verifier(
        log_memory=log_memory,
        log_bytecode=bytecode.log_size(),
        table_log_heights=table_log_n_rows,
        commitment_ood_samples=ood,
        inner_public_len=len(public_input),
        bytecode_hash_domsep=[int(x) for x in bc_hash_ds],
        starting_log_inv_rate=builder.starting_log_inv_rate,
        tlen=int(raw.transcript.size), air_section=True,
        whir_config_builder=builder, ending_pc=bytecode.ending_pc)

    guest_bc = compile_program(src, import_resolver=resolve_guest_lib)

    bc_point, bc_value = logup["bytecode_evaluation"]
    # digest-compressed outer public input: the claim segment is hinted
    # into the guest's IDATA region and re-hashed in-circuit; the outer
    # pub is the 8-FE digest (type_2_aggregation.rs:93-163 analog)
    from leanmultisig_tpu.aggregation.recursion_driver import \
        input_data_digest
    input_data = ([int(x) for x in logup["gkr_point"].reshape(-1)]
                  + [int(x) for x in logup["numerators_value"]]
                  + [int(x) for x in logup["denominators_value"]]
                  + [int(x) for x in bc_value]
                  + list(public_input)
                  + [int(x) for x in alphas.reshape(-1)])
    outer_pub = [int(x) for x in input_data_digest(input_data)]
    assert len(outer_pub) == pub_len == 8

    pub_pad = -(-len(public_input) // 8) * 8
    inner_pub_padded = list(public_input) + [0] * (pub_pad - len(public_input))

    def witness(transcript, bval=None, idata=None):
        return ExecutionWitness(
            preamble_memory_len=preamble_len,
            hints={"raw_transcript": [[int(x) for x in transcript]],
                   "inner_public_input": [inner_pub_padded],
                   "input_data": [list(idata if idata is not None
                                       else input_data)],
                   "bytecode_value": [[int(x) for x in
                                       (bval if bval is not None
                                        else bc_value)]],
                   "whir_leaf": [[int(x) for x in op.leaf_data.reshape(-1)]
                                 for op in raw.merkle_openings],
                   "whir_path": [[int(x) for x in op.path.reshape(-1)]
                                 for op in raw.merkle_openings]})

    res = execute_bytecode(guest_bc, outer_pub, witness(raw.transcript))
    assert res.metadata["cycles"] > 0

    # the exposed bytecode claim must equal the host evaluation point value
    n_alphas_suffix = 4
    expected_point = np.concatenate(
        [logup["gkr_point"][-bytecode.log_size():], alphas[-n_alphas_suffix:]])
    assert np.array_equal(bc_point, expected_point)

    # the guest now consumes the FULL transcript: tail tampering rejects
    bad = raw.transcript.copy()
    bad[-10] = (int(bad[-10]) + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub, witness(bad))

    bad2 = raw.transcript.copy()
    bad2[40] = (int(bad2[40]) + 1) % P  # early: GKR top values region
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub, witness(bad2))

    # tamper inside the AIR sumcheck section (first round poly after the
    # logup prefix, located via the host raw-transcript length)
    logup_raw_len = sum(len(x) for x in vs.raw_transcript)
    bad3 = raw.transcript.copy()
    bad3[logup_raw_len + 6] = (int(bad3[logup_raw_len + 6]) + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub, witness(bad3))

    # tamper: wrong hinted bytecode value must fail
    bad_bval = [int(x) for x in bc_value]
    bad_bval[0] = (bad_bval[0] + 1) % P
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, outer_pub,
                         witness(raw.transcript, bad_bval))

    # tamper: wrong claimed num in the hinted claim data must fail (the
    # digest binding catches it even when the digest is recomputed)
    bad_idata = list(input_data)
    k = len(logup["gkr_point"].reshape(-1))
    bad_idata[k] = (bad_idata[k] + 1) % P
    bad_pub = [int(x) for x in input_data_digest(bad_idata)]
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(guest_bc, bad_pub,
                         witness(raw.transcript, idata=bad_idata))
