"""Frozen golden transcript hashes per protocol layer.

Prover and verifier share the Python protocol code, so a refactor could
silently change the transcript and every roundtrip test would still pass.
These fixtures freeze seeded transcripts (VERDICT r1 item 9): any drift
in Fiat-Shamir order, c0-elision, grinding, sampling, or serialization
fails here. The wire format itself is documented in docs/WIRE_FORMAT.md
so an external (Rust) harness can cross-check the same fixtures.

If a change is SUPPOSED to alter the transcript (a protocol change), the
hashes must be regenerated and the change called out in review.
"""

import hashlib

import numpy as np

from leanmultisig_tpu.field.constants import P

GOLDEN_CHALLENGER = "ce5df8bec93d3d32"
GOLDEN_WHIR = "08e958e4fd26e193"
GOLDEN_WHIR_LEN = 182
GOLDEN_FULL_PROOF = "74a46bdec0ef8c7b"
GOLDEN_FULL_PROOF_LEN = 4069


def _h(arr) -> str:
    return hashlib.sha256(
        np.ascontiguousarray(np.asarray(arr, np.uint32)).tobytes()
    ).hexdigest()[:16]


def test_golden_challenger_grinding_sampling():
    """Duplex sponge + grinding + EF sampling transcript (fs layer)."""
    from leanmultisig_tpu.fs.prover import ProverState

    rng = np.random.default_rng(12345)
    ps = ProverState()
    ps.add_base_scalars(rng.integers(0, P, size=13, dtype=np.uint32))
    ps.pow_grinding(8)
    ps.duplex()
    s = ps.sample_vec(3)
    ps.add_extension_scalars(s)
    assert _h(ps.into_proof().transcript) == GOLDEN_CHALLENGER


def test_golden_whir_roundtrip_transcript():
    """WHIR commit + open transcript (commit OOD, per-round sumchecks,
    STIR queries, grinding, final coeffs)."""
    from test_whir import _small_builder
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.poly import np_poly as pp
    from leanmultisig_tpu.whir import prover as wp
    from leanmultisig_tpu.whir.config import WhirConfig
    from leanmultisig_tpu.whir.statement import SparseStatement, SparseValue

    rng = np.random.default_rng(777)
    n_vars = 12
    cfg = WhirConfig(_small_builder(), n_vars)
    poly = rng.integers(0, P, size=1 << n_vars, dtype=np.uint32)
    ps = ProverState()
    wit = wp.commit(cfg, ps, poly)
    point = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
    st = SparseStatement(n_vars, point,
                         [SparseValue(0, pp.eval_mle(poly, point))])
    wp.open_(cfg, ps, [st], wit, poly)
    proof = ps.into_proof()
    assert proof.transcript.size == GOLDEN_WHIR_LEN
    assert _h(proof.transcript) == GOLDEN_WHIR


def test_golden_full_proof_transcript():
    """The whole prove_execution transcript: FS init, dims, stacked
    commitment, logup GKR, batched AIR sumcheck, WHIR opening."""
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.prover.prove import prove_execution
    from leanmultisig_tpu.vm import ExecutionWitness

    proof, _ = prove_execution(build_program(), [5, 6, 7],
                               ExecutionWitness(), _test_builder())
    assert proof.transcript.size == GOLDEN_FULL_PROOF_LEN
    assert _h(proof.transcript) == GOLDEN_FULL_PROOF
