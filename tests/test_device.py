"""Device kernel tests: bit-exact equivalence with the host reference
implementations (run on the virtual CPU backend; the same code path runs
on real TPU in bench)."""

import numpy as np
import pytest

from leanmultisig_tpu import device
from leanmultisig_tpu.device import kernels as dk
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import grind as host_grind
from leanmultisig_tpu.hash import merkle as hmerkle
from leanmultisig_tpu.hash import sponge
from leanmultisig_tpu.whir import dft as host_dft

rng = np.random.default_rng(17)


def test_device_grind_matches_host():
    capacity = rng.integers(0, P, size=8, dtype=np.uint32)
    for bits in [3, 6]:
        assert dk.grind(capacity, bits, batch=1 << 10) == \
            host_grind(capacity, bits)


def test_device_merkle_matches_host():
    leaves = rng.integers(0, P, size=(128, 24), dtype=np.uint32)
    layers = dk.merkle_build(leaves, 24)
    host_digests = sponge.hash_slice(leaves)
    host_tree = hmerkle.MerkleTree.from_first_layer(host_digests)
    assert len(layers) == len(host_tree.digest_layers)
    for dlayer, hlayer in zip(layers, host_tree.digest_layers):
        assert np.array_equal(dlayer, hlayer)


def test_device_merkle_zero_suffix():
    leaves = rng.integers(0, P, size=(64, 40), dtype=np.uint32)
    layers = dk.merkle_build(leaves, 64)  # 24 zero-suffix columns
    padded = np.concatenate([leaves, np.zeros((64, 24), np.uint32)], axis=1)
    assert np.array_equal(layers[0], sponge.hash_slice(padded))


@pytest.mark.parametrize("tail", [(), (5,)])
def test_device_dft_matches_host(tail):
    x = rng.integers(0, P, size=(256,) + tail, dtype=np.uint32)
    assert np.array_equal(dk.dft_evals(x), host_dft.dft_evals(x))


def test_device_reorder_and_dft_matches_host():
    evals = rng.integers(0, P, size=1 << 10, dtype=np.uint32)
    got = dk.reorder_and_dft(evals, 4, 2, 16)
    want = host_dft.reorder_and_dft(evals, 4, 2, 16)
    assert np.array_equal(got, want)


def test_device_enabled_pipeline_roundtrip():
    """Full WHIR roundtrip with device kernels forced on."""
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.fs.verifier import VerifierState
    from leanmultisig_tpu.poly import np_poly as pp
    from leanmultisig_tpu.whir import (SparseStatement, WhirConfig, commit,
                                       open_, parse_commitment, verify)
    from test_whir import _small_builder

    device.set_enabled(True)
    try:
        n_vars = 12
        cfg = WhirConfig(_small_builder(), n_vars)
        poly = rng.integers(0, P, size=1 << n_vars, dtype=np.uint32)
        point = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
        st = SparseStatement.dense(point, pp.eval_mle(poly, point))
        ps = ProverState()
        witness = commit(cfg, ps, poly)
        open_(cfg, ps, [st], witness, poly)
        proof = ps.into_proof()
        vs = VerifierState(proof)
        parsed = parse_commitment(vs, n_vars, cfg.commitment_ood_samples)
        verify(cfg, vs, parsed, [st])
    finally:
        device.set_enabled(None)


def test_device_sumcheck_state_matches_host():
    """DeviceProductSumcheck transcript == host path at >=14 vars
    (exercises the scatter-add path with selector regions)."""
    from leanmultisig_tpu.device.sumcheck import (DeviceProductSumcheck,
                                                  combine_statement_device)
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.poly import np_poly as pp
    from leanmultisig_tpu.sumcheck.np_sumcheck import (ProductComputation,
                                                       sumcheck_prove)
    from leanmultisig_tpu.whir.statement import (SparseStatement, SparseValue,
                                                 combine_statement)

    n_vars = 14
    poly = rng.integers(0, P, size=1 << n_vars, dtype=np.uint32)
    gamma = rng.integers(0, P, size=5, dtype=np.uint32)

    # a dense statement + a sparse one hitting the scatter path
    pt_dense = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
    st1 = SparseStatement.dense(pt_dense, pp.eval_mle(poly, pt_dense))
    # values on selector prefix with inner exactly 14 is impossible here;
    # use selector region with large inner by total=n_vars, inner=n_vars (sel 0)
    pt2 = rng.integers(0, P, size=(n_vars, 5), dtype=np.uint32)
    st2 = SparseStatement(n_vars, pt2, [SparseValue(0, pp.eval_mle(poly, pt2))])
    statements = [st1, st2]

    w_host, sum_host = combine_statement(statements, gamma)
    w_dev, sum_dev = combine_statement_device(statements, gamma)
    from leanmultisig_tpu.device.sumcheck import from_monty_host
    assert np.array_equal(from_monty_host(w_dev), w_host)
    assert np.array_equal(sum_dev, sum_host)

    ps_h = ProverState()
    ch_h, _, sum_h = sumcheck_prove([poly, w_host], ProductComputation(),
                                    None, None, ps_h, sum_host, n_rounds=4,
                                    pow_bits=2)
    ps_d = ProverState()
    state = DeviceProductSumcheck(poly, w_dev, sum_dev)
    ch_d = state.run_sumcheck_many_rounds(ps_d, 4, 2)
    assert np.array_equal(ch_h, ch_d)
    assert np.array_equal(sum_h, state.sum)
    assert np.array_equal(ps_h.into_proof().transcript,
                          ps_d.into_proof().transcript)


def test_device_scatter_add_selector():
    """weights_add_eq with nonzero selector == host sparse accumulation."""
    from leanmultisig_tpu.device.sumcheck import (from_monty_host,
                                                  to_monty_dev,
                                                  weights_add_eq)
    from leanmultisig_tpu.poly import np_poly as pp
    from leanmultisig_tpu.field import np_field as nf

    total_n, inner_n, sel = 16, 14, 3
    point = rng.integers(0, P, size=(inner_n, 5), dtype=np.uint32)
    scalar = rng.integers(0, P, size=5, dtype=np.uint32)
    w0 = rng.integers(0, P, size=(1 << total_n, 5), dtype=np.uint32)
    got = from_monty_host(weights_add_eq(to_monty_dev(w0), point, scalar, sel))
    want = w0.copy()
    lo = sel << inner_n
    want[lo:lo + (1 << inner_n)] = nf.eadd(want[lo:lo + (1 << inner_n)],
                                           pp.eval_eq(point, scalar))
    assert np.array_equal(got, want)


def test_sharded_whir_commit_matches_host():
    """Row-sharded commit over the 8-device mesh == host reference."""
    import jax
    from jax.sharding import Mesh
    from leanmultisig_tpu.device.sharded import sharded_whir_commit
    from leanmultisig_tpu.whir.dft import reorder_and_dft as host_rdft

    evals = rng.integers(0, P, size=1 << 12, dtype=np.uint32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    digests, root = sharded_whir_commit(evals, 4, 2, mesh)
    mat = host_rdft(evals, 4, 2, 16)
    host_digests = sponge.hash_slice(mat)
    tree = hmerkle.MerkleTree.from_first_layer(host_digests)
    assert np.array_equal(digests, host_digests)
    assert np.array_equal(root, tree.root())


def test_device_air_constraint_eval_matches_host():
    """jnp DAG evaluator (device AIR path) == host numpy folder, base
    and extension column batches, all three tables."""
    import jax
    from leanmultisig_tpu.air.builder import eval_air_at
    from leanmultisig_tpu.air.tables_air import (ExtraDataForBuses,
                                                 TABLE_AIRS,
                                                 max_air_constraints)
    from leanmultisig_tpu.device.air import eval_constraints_monty
    from leanmultisig_tpu.field import jnp_field as jf
    from leanmultisig_tpu.field import np_field as nf
    from leanmultisig_tpu.poly import np_poly as pp

    rng = np.random.default_rng(11)
    alpha = rng.integers(0, P, size=5, dtype=np.uint32)
    apw = [pp.EONE.copy()]
    for _ in range(max_air_constraints()):
        apw.append(nf.emul(apw[-1], alpha))
    apw = np.stack(apw)
    extra = ExtraDataForBuses(
        rng.integers(0, P, size=(16, 5), dtype=np.uint32),
        rng.integers(0, P, size=5, dtype=np.uint32))

    import jax.numpy as jnp
    apw_m = jnp.asarray(jf.to_monty_np(apw))
    ae_m = jnp.asarray(jf.to_monty_np(extra.logup_alphas_eq_poly))
    bb_m = jnp.asarray(jf.to_monty_np(extra.bus_beta))

    # one base batch + one ext batch (XLA compiles dominate test time)
    for table, shape in (("execution", (64,)), ("extension_op", (64, 5))):
        air = TABLE_AIRS[table]
        if True:
            flat = [rng.integers(0, P, size=shape, dtype=np.uint32)
                    for _ in range(air.n_columns)]
            shift = [rng.integers(0, P, size=shape, dtype=np.uint32)
                    for _ in range(air.n_shift)]
            ref = eval_air_at(lambda b: air.eval_fn(b, extra), flat, shift,
                              apw, extra)
            fn = jax.jit(lambda f, s: eval_constraints_monty(
                table, f, s, apw_m, ae_m, bb_m))
            got_m = fn([jnp.asarray(jf.to_monty_np(c)) for c in flat],
                       [jnp.asarray(jf.to_monty_np(c)) for c in shift])
            got = jf.from_monty_np(np.asarray(got_m))
            assert np.array_equal(ref, got), (table, shape)


def test_device_air_round_evals_matches_host():
    """Fused device z-stacked round == host compute_bare_round_poly
    internals (stack + eval + eq weight + reduce)."""
    import jax.numpy as jnp
    from leanmultisig_tpu.air.tables_air import (ExtraDataForBuses,
                                                 TABLE_AIRS,
                                                 max_air_constraints)
    from leanmultisig_tpu.air.tables_air import eval_table_air
    from leanmultisig_tpu.device.air import air_round_evals
    from leanmultisig_tpu.field import jnp_field as jf
    from leanmultisig_tpu.field import np_field as nf
    from leanmultisig_tpu.poly import np_poly as pp

    rng = np.random.default_rng(12)
    table = "execution"
    air = TABLE_AIRS[table]
    n = 128
    half = n // 2
    alpha = rng.integers(0, P, size=5, dtype=np.uint32)
    apw = [pp.EONE.copy()]
    for _ in range(max_air_constraints()):
        apw.append(nf.emul(apw[-1], alpha))
    apw = np.stack(apw)
    extra = ExtraDataForBuses(
        rng.integers(0, P, size=(16, 5), dtype=np.uint32),
        rng.integers(0, P, size=5, dtype=np.uint32))
    cols = [rng.integers(0, P, size=n, dtype=np.uint32)
            for _ in range(air.n_columns + air.n_shift)]
    eq = rng.integers(0, P, size=(half, 5), dtype=np.uint32)
    zs = np.array([0, 2, 3, 4, 5, 6], np.uint32)

    # host reference: stack, eval, weight, reduce
    stacked = []
    for c in cols:
        lo, hi = c[:half], c[half:]
        d = nf.sub(hi, lo)
        pts = nf.add(lo[None], nf.mul(d[None], zs[:, None]))
        stacked.append(pts.reshape(-1))
    acc = eval_table_air(table, stacked[:air.n_columns],
                         stacked[air.n_columns:], apw, extra)
    acc = acc.reshape(len(zs), half, 5)
    ref = np.stack([nf.sum_mod(nf.emul(acc[i], eq), axis=0)
                    for i in range(len(zs))])

    got_m = air_round_evals(
        table, [jnp.asarray(jf.to_monty_np(c)) for c in cols],
        jnp.asarray(jf.to_monty_np(eq)),
        jnp.asarray(jf.to_monty_np(apw)),
        jnp.asarray(jf.to_monty_np(extra.logup_alphas_eq_poly)),
        jnp.asarray(jf.to_monty_np(extra.bus_beta)), zs)
    got = jf.from_monty_np(np.asarray(got_m))
    assert np.array_equal(ref, got)
