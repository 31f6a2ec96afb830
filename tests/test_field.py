"""Field arithmetic: jnp Montgomery lanes vs numpy canonical oracle vs Python ints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field import jnp_field as jf
from leanmultisig_tpu.field.constants import P, EXT_GENERATOR, TWO_ADIC_GENERATORS

RNG = np.random.default_rng(0)


def rand_f(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint32)


def test_np_field_basics():
    a, b = rand_f(1000), rand_f(1000)
    ia, ib = a.astype(object), b.astype(object)
    assert np.all(nf.add(a, b) == (ia + ib) % P)
    assert np.all(nf.sub(a, b) == (ia - ib) % P)
    assert np.all(nf.mul(a, b) == (ia * ib) % P)
    inv = nf.inv(a)
    assert np.all(nf.mul(a, inv)[a != 0] == 1)


def test_monty_roundtrip_and_mul():
    a, b = rand_f(4096), rand_f(4096)
    am = jnp.asarray(jf.to_monty_np(a))
    bm = jnp.asarray(jf.to_monty_np(b))
    # roundtrip
    assert np.all(np.asarray(jax.jit(jf.to_u32)(am)) == a)
    # all basic ops in one jitted bundle
    bundle = jax.jit(lambda x, y: (jf.mul(x, y), jf.add(x, y), jf.sub(x, y),
                                   jf.neg(x), jf.halve(x)))
    m, ad, sb, ng, h = (np.asarray(v) for v in bundle(am, bm))
    assert np.all(jf.from_monty_np(m) == nf.mul(a, b))
    assert np.all(jf.from_monty_np(ad) == nf.add(a, b))
    assert np.all(jf.from_monty_np(sb) == nf.sub(a, b))
    assert np.all(jf.from_monty_np(ng) == nf.neg(a))
    h = jf.from_monty_np(h)
    assert np.all(nf.add(h, h) == a)


def test_monty_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 31) - 1 - (1 << 24)],
                    np.uint32)
    edge = edge % P
    am = jnp.asarray(jf.to_monty_np(edge))
    for b in [np.uint32(0), np.uint32(1), np.uint32(P - 1)]:
        bm = jnp.asarray(jf.to_monty_np(np.full_like(edge, b)))
        got = jf.from_monty_np(np.asarray(jax.jit(jf.mul)(am, bm)))
        want = (edge.astype(object) * int(b)) % P
        assert np.all(got == want)


def test_inv_and_pow():
    a = rand_f(256)
    a[0] = 0
    am = jnp.asarray(jf.to_monty_np(a))
    invm = jax.jit(jf.inv)(am)
    got = jf.from_monty_np(np.asarray(invm))
    want = np.array([pow(int(x), P - 2, P) for x in a], np.uint32)
    assert np.all(got == want)
    # pow_const
    p7 = jf.from_monty_np(np.asarray(jax.jit(lambda x: jf.pow_const(x, 7))(am)))
    want7 = np.array([pow(int(x), 7, P) for x in a], np.uint32)
    assert np.all(p7 == want7)


def test_two_adic_generators():
    for k, g in enumerate(TWO_ADIC_GENERATORS):
        assert pow(g, 1 << k, P) == 1


def test_extension_mul_matches_numpy():
    a, b = rand_f((128, 5)), rand_f((128, 5))
    want = nf.emul(a, b)
    am = jnp.asarray(jf.to_monty_np(a))
    bm = jnp.asarray(jf.to_monty_np(b))
    got = jf.from_monty_np(np.asarray(jax.jit(jf.emul)(am, bm)))
    assert np.all(got == want)


def test_extension_mul_vs_schoolbook():
    # independent oracle: plain polynomial mul + reduction by X^5 + X^2 - 1
    a, b = rand_f((64, 5)), rand_f((64, 5))
    want = np.zeros((64, 5), np.uint32)
    for r in range(64):
        c = [0] * 9
        for i in range(5):
            for j in range(5):
                c[i + j] = (c[i + j] + int(a[r, i]) * int(b[r, j])) % P
        for k in range(3, -1, -1):
            hi = c[5 + k]
            c[5 + k] = 0
            c[k] = (c[k] + hi) % P
            c[k + 2] = (c[k + 2] - hi) % P
        want[r] = c[:5]
    assert np.all(nf.emul(a, b) == want)


def test_extension_inverse():
    a = rand_f((32, 5))
    got = nf.emul(a, nf.einv(a))
    one = np.zeros((32, 5), np.uint32)
    one[:, 0] = 1
    assert np.all(got == one)
    # jnp version
    am = jnp.asarray(jf.to_monty_np(a))
    gotj = jf.from_monty_np(np.asarray(jax.jit(lambda x: jf.emul(x, jf.einv(x)))(am)))
    assert np.all(gotj == one)


def test_ext_generator_order():
    # EXT_GENERATOR generates the multiplicative group: check its order
    # divides p^5 - 1 but not (p^5 - 1)/q for small prime factors q.
    g = np.array(EXT_GENERATOR, np.uint32).reshape(1, 5)
    order = P**5 - 1
    res = nf.epow(g, order)
    assert np.all(res[0] == [1, 0, 0, 0, 0])
    for q in [2, 5, 61]:  # small factors of p^5-1 (2 divides p-1)
        if order % q == 0:
            r = nf.epow(g, order // q)
            assert not np.all(r[0] == [1, 0, 0, 0, 0])


def test_jit_under_8dev_mesh():
    # field ops shard trivially across the virtual 8-CPU mesh
    from jax.sharding import Mesh, PartitionSpec as Pspec, NamedSharding

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devs, ("rows",))
    a = rand_f((8 * 128,))
    am = jax.device_put(jnp.asarray(jf.to_monty_np(a)),
                        NamedSharding(mesh, Pspec("rows")))
    out = jax.jit(lambda x: jf.mul(x, x))(am)
    got = jf.from_monty_np(np.asarray(out))
    assert np.all(got == nf.mul(a, a))
