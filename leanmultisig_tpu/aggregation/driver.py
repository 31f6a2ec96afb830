"""Type-1 aggregation driver: prove N XMSS signatures in one zkVM proof.

Host side of the aggregation leaf (reference:
rec_aggregation/src/type_1_aggregation.rs): builds the public input,
packs the named hint streams, compiles the guest, proves, verifies.
"""

from __future__ import annotations

import numpy as np

from ..compiler import compile_program
from ..field.constants import P
from ..prover.prove import prove_execution
from ..prover.verify import verify_execution
from ..vm.runner import ExecutionWitness
from ..xmss.scheme import (XmssPublicKey, XmssSignature,
                           xmss_key_gen, xmss_sign, xmss_verify)
from .guest import (compute_merkle_chunks, compute_tweak_table,
                    compute_tweaks_hash, generate_guest, preamble_layout,
                    public_input_layout)

BENCHMARK_SLOT = 111  # signers_cache.rs:14


def make_signers(n: int, slot: int = BENCHMARK_SLOT):
    """n independent signers, each keyed for the single benchmark slot.

    Keygen (chain walks) is cached on disk per (index, slot) like the
    reference's signers cache (signers_cache.rs:44-60); override the
    location with SIGNERS_CACHE_DIR, disable with SIGNERS_CACHE_DIR=''."""
    import os
    import pickle
    cache_dir = os.environ.get(
        "SIGNERS_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..",
                     ".signers_cache"))
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(cache_dir, f"signers_slot{slot}.pkl")
    out = []
    if cache and os.path.exists(cache):
        with open(cache, "rb") as f:
            out = pickle.load(f)
    while len(out) < n:
        i = len(out)
        sk, pk = xmss_key_gen(b"bench-signer-%d" % i, slot, slot)
        out.append((sk, pk))
    if cache and len(out) > 0:
        try:
            with open(cache, "wb") as f:
                pickle.dump(out, f)
        except OSError:
            pass
    return out[:n]


def sign_all(signers, message: np.ndarray, slot: int = BENCHMARK_SLOT,
             rng=None):
    rng = rng or np.random.default_rng(0)
    return [xmss_sign(sk, message, slot, rng) for sk, _ in signers]


def build_public_input(message, pub_keys: list,
                       slot: int = BENCHMARK_SLOT) -> list[int]:
    """[n | message(8) | merkle_chunks(8) | tweaks_hash(8) | per-sig
    root(4) pp(4)] — the slot enters via chunks + tweaks hash
    (build_type1_input_data analog, type_1_aggregation.rs:161-185)."""
    public_input = [len(pub_keys)] + [int(x) for x in message]
    public_input += compute_merkle_chunks(slot)
    public_input += [int(x) for x in compute_tweaks_hash(slot)]
    for pk in pub_keys:
        public_input += [int(x) for x in pk.merkle_root]
        public_input += [int(x) for x in pk.public_param]
    return public_input


def build_witness(message, pub_keys: list, signatures: list,
                  slot: int = BENCHMARK_SLOT):
    n = len(signatures)
    pub_len, _, _, _ = public_input_layout(n)
    pub_len_padded = 1 << (pub_len - 1).bit_length()
    _, _, preamble_len = preamble_layout(pub_len_padded)

    public_input = build_public_input(message, pub_keys, slot)
    assert len(public_input) == pub_len

    hints = {"tweak_table": [compute_tweak_table(slot)],
             "wots_sig": [], "xmss_merkle_node": []}
    for pk, sig in zip(pub_keys, signatures):
        hints["wots_sig"].append(
            [int(x) for x in sig.randomness]
            + [int(x) for x in sig.chain_tips.reshape(-1)])
        for level_nodes in sig.merkle_proof:
            hints["xmss_merkle_node"].append([int(x) for x in level_nodes])

    return public_input, ExecutionWitness(preamble_memory_len=preamble_len,
                                          hints=hints)


_GUEST_CACHE: dict = {}


def get_aggregation_bytecode(n_sigs: int, slot: int = BENCHMARK_SLOT):
    """Slot-independent bytecode (the slot is a runtime input); `slot`
    is accepted for API compatibility but does not affect the result."""
    del slot
    if n_sigs not in _GUEST_CACHE:
        _GUEST_CACHE[n_sigs] = compile_program(generate_guest(n_sigs))
    return _GUEST_CACHE[n_sigs]


def aggregate(message, pub_keys, signatures, whir_config_builder,
              slot: int = BENCHMARK_SLOT, native_check: bool = True):
    """-> (proof, metadata). Verifies children natively first
    (type_1_aggregation.rs:206+ does the same for recursion inputs)."""
    if native_check:
        for pk, sig in zip(pub_keys, signatures):
            assert xmss_verify(pk, message, sig, slot), "invalid signature"
    bytecode = get_aggregation_bytecode(len(signatures), slot)
    public_input, witness = build_witness(message, pub_keys, signatures, slot)
    return (bytecode, public_input) + prove_execution(
        bytecode, public_input, witness, whir_config_builder)


def verify_aggregate(bytecode, public_input, proof, whir_config_builder):
    return verify_execution(bytecode, public_input, proof,
                            whir_config_builder)
