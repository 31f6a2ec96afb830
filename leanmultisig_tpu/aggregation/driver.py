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
from ..xmss.core import CHAIN_LENGTH, TWEAK_TYPE_ENCODING, V, make_tweak
from ..xmss.scheme import (XmssPublicKey, XmssSignature, _compress,
                           xmss_key_gen, xmss_sign, xmss_verify)
from .guest import generate_guest, preamble_layout, public_input_layout

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


def _encoding_high(message, pk: XmssPublicKey, randomness, slot) -> list[int]:
    """High 7-bit parts of the encoding compression (guest hint)."""
    first_right = np.zeros(8, np.uint32)
    first_right[:6] = randomness
    first_right[6:8] = make_tweak(TWEAK_TYPE_ENCODING, 0, slot)
    pre = _compress(np.concatenate([np.asarray(message, np.uint32),
                                    first_right]))
    second_right = np.zeros(8, np.uint32)
    second_right[:4] = pk.public_param
    compressed = _compress(np.concatenate([pre, second_right]))
    return [int(x) >> 24 for x in compressed]


def build_witness(message, pub_keys: list, signatures: list,
                  slot: int = BENCHMARK_SLOT):
    n = len(signatures)
    pub_len, _, _, _ = public_input_layout(n)
    pub_len_padded = 1 << (pub_len - 1).bit_length()
    _, _, _, _, preamble_len = preamble_layout(pub_len_padded)

    public_input = [n] + [int(x) for x in message]
    for pk in pub_keys:
        public_input += [int(x) for x in pk.merkle_root]
        public_input += [int(x) for x in pk.public_param]
    assert len(public_input) == pub_len

    hints = {"wots_sig": [], "merkle_node": [], "encoding_high": []}
    for pk, sig in zip(pub_keys, signatures):
        hints["wots_sig"].append(
            [int(x) for x in sig.randomness]
            + [int(x) for x in sig.chain_tips.reshape(-1)])
        for level_nodes in sig.merkle_proof:
            hints["merkle_node"].append([int(x) for x in level_nodes])
        hints["encoding_high"].append(
            _encoding_high(message, pk, sig.randomness, slot))

    return public_input, ExecutionWitness(preamble_memory_len=preamble_len,
                                          hints=hints)


_GUEST_CACHE: dict = {}


def get_aggregation_bytecode(n_sigs: int, slot: int = BENCHMARK_SLOT):
    key = (n_sigs, slot)
    if key not in _GUEST_CACHE:
        _GUEST_CACHE[key] = compile_program(generate_guest(n_sigs, slot))
    return _GUEST_CACHE[key]


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
