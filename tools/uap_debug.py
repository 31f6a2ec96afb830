"""Debug driver for the unified program: leaf exec -> leaf prove ->
node exec -> node prove -> verify_root, with small guesses.
Usage: python tools/uap_debug.py [stage] (stage in {leaf, node, all})."""

import sys
import time

import numpy as np

sys.path.insert(0, 'tests')
sys.path.insert(0, '.')

from test_e2e import _test_builder  # noqa: E402

from leanmultisig_tpu.aggregation import unified_driver as UD  # noqa: E402
from leanmultisig_tpu.aggregation.driver import (make_signers,  # noqa: E402
                                                 sign_all)
from leanmultisig_tpu.aggregation.guest_lib import \
    resolve_guest_lib  # noqa: E402
from leanmultisig_tpu.aggregation.unified import (UnifiedParams,  # noqa
                                                  generate_unified)
from leanmultisig_tpu.compiler import compile_program  # noqa: E402
from leanmultisig_tpu.field.constants import P  # noqa: E402
from leanmultisig_tpu.protocols.stacked_pcs import \
    compute_stacked_n_vars  # noqa: E402
from leanmultisig_tpu.vm import tables as T  # noqa: E402
from leanmultisig_tpu.whir.config import WhirConfig  # noqa: E402


def build(guess, builder, max_n_sigs=4, max_recursions=2):
    snv = compute_stacked_n_vars(guess["log_memory"],
                                 guess["log_bytecode"], guess["shape"])
    ood = WhirConfig(builder, snv).commitment_ood_samples
    p = UnifiedParams(
        max_n_sigs=max_n_sigs, max_recursions=max_recursions,
        log_memory=guess["log_memory"], table_log_heights=guess["shape"],
        tlen=guess["tlen"], whir_config_builder=builder,
        log_bytecode=guess["log_bytecode"],
        bytecode_zero_eval=guess["zero_eval"], commitment_ood_samples=ood)
    src, L = generate_unified(p)
    t0 = time.time()
    bc = compile_program(src, import_resolver=resolve_guest_lib)
    print(f"compiled log_size={bc.log_size()} "
          f"zero_eval={int(bc.instructions_multilinear[0])} "
          f"({time.time()-t0:.1f}s)", flush=True)
    return UD.UnifiedProgram(p, bc, L, "dbg")


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "leaf"
    builder = _test_builder()
    guess = dict(log_bytecode=17, zero_eval=0, log_memory=18,
                 shape={T.EXECUTION: 17, T.EXTENSION_OP: 14,
                        T.POSEIDON16: 13},
                 tlen=30000)
    up = build(guess, builder)
    rng = np.random.default_rng(1)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    signers = make_signers(2)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]
    L = up.layout

    leaf_data = UD._t1_input_data(L, 2, UD._zero_claim_field(up), up.domsep,
                                  UD.pubkeys_hash_iv(pub_keys), message, 111)
    hints = UD._leaf_hints(up, leaf_data, pub_keys, sigs, 111)
    t0 = time.time()
    nat = UD._natural_shape(up, leaf_data, hints)
    print(f"LEAF EXEC OK ({time.time()-t0:.1f}s), natural: {nat}",
          flush=True)
    if stage == "leaf":
        return

    t0 = time.time()
    leaf = UD.prove_leaf(up, message, pub_keys, sigs, 111)
    leaf.metadata["pubkeys_flat"] = UD._flat_pks(pub_keys)
    print(f"LEAF PROVE OK ({time.time()-t0:.1f}s)", flush=True)
    tlen = UD._measured_tlen(up, leaf)
    print("measured tlen:", tlen, "(guessed", up.params.tlen, ")",
          flush=True)
    if tlen != up.params.tlen:
        guess["tlen"] = tlen
        up = build(guess, builder)
        leaf_data = UD._t1_input_data(
            L, 2, UD._zero_claim_field(up), up.domsep,
            UD.pubkeys_hash_iv(pub_keys), message, 111)
        t0 = time.time()
        leaf = UD.prove_leaf(up, message, pub_keys, sigs, 111)
        leaf.metadata["pubkeys_flat"] = UD._flat_pks(pub_keys)
        print(f"LEAF re-PROVE OK ({time.time()-t0:.1f}s)", flush=True)
        assert UD._measured_tlen(up, leaf) == tlen

    t0 = time.time()
    node_data, node_hints, _ = UD._node_artifacts(
        up, [leaf, leaf], message, 111)
    print(f"node artifacts ({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    nat = UD._natural_shape(up, node_data, node_hints)
    print(f"NODE EXEC OK ({time.time()-t0:.1f}s), natural: {nat}",
          flush=True)
    if stage == "node":
        return

    t0 = time.time()
    node = UD.prove_node(up, [leaf, leaf], message, 111)
    print(f"NODE PROVE OK ({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    out = UD.verify_root(up, node)
    print(f"VERIFY ROOT OK ({time.time()-t0:.1f}s): {out['count']} sigs",
          flush=True)


if __name__ == "__main__":
    main()
