"""JAX limb-field kernels vs the Python-int oracle.

Covers the resident (lazy) representation contract, chained-op correctness,
adversarial limb values, and canonicalization (reference arithmetic:
halo2curves axiom fork [dep] — we match values, not its Montgomery internals).
"""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_zkcert_tpu.ops import limbs
from halo2_zkcert_tpu.ops.field import Fr, Fq

random.seed(1234)


def rand_elems(field, n):
    xs = [random.randrange(field.modulus) for _ in range(n)]
    return xs, field.from_ints(xs)


@pytest.mark.parametrize("field", [Fr, Fq], ids=["Fr", "Fq"])
def test_add_sub_mul_neg(field):
    p = field.modulus
    xs = [random.randrange(p) for _ in range(48)] + [0, 1, p - 1, p - 2]
    ys = [random.randrange(p) for _ in range(48)] + [p - 1, p - 1, 1, 0]
    a, b = field.from_ints(xs), field.from_ints(ys)
    assert list(field.to_ints(field.add(a, b))) == [(x + y) % p for x, y in zip(xs, ys)]
    assert list(field.to_ints(field.sub(a, b))) == [(x - y) % p for x, y in zip(xs, ys)]
    assert list(field.to_ints(field.mul(a, b))) == [(x * y) % p for x, y in zip(xs, ys)]
    assert list(field.to_ints(field.neg(a))) == [(-x) % p for x in xs]


def test_chained_laziness():
    """Outputs of ops feed ops for many rounds without canonicalization."""
    p = Fr.modulus
    xs, a = rand_elems(Fr, 32)
    ys, b = rand_elems(Fr, 32)
    vals = list(xs)
    for _ in range(6):
        a = Fr.mul(Fr.add(a, b), Fr.sub(a, b))
        vals = [((x + y) % p) * ((x - y) % p) % p for x, y in zip(vals, ys)]
        assert int(jnp.max(a)) < 512, "resident limb bound violated"
    assert list(Fr.to_ints(a)) == vals


def test_adversarial_limbs():
    """Near-maximal lazy limbs still reduce correctly."""
    p = Fr.modulus
    arr = np.full((4, limbs.NLIMBS), 511, dtype=np.int32)
    arr[:, 32] = 7
    vals = [limbs.limbs_to_int(r) for r in arr]
    x = jnp.asarray(arr)
    assert list(Fr.to_ints(Fr.mul(x, x))) == [v * v % p for v in vals]
    assert list(Fr.to_ints(Fr.add(x, x))) == [(v + v) % p for v in vals]
    got = [limbs.limbs_to_int(r) for r in np.asarray(Fr.canonical(x))]
    assert got == [v % p for v in vals]


def test_canonical_and_eq():
    p = Fr.modulus
    a = Fr.from_ints([5])
    b = Fr.add(Fr.from_ints([p - 3]), Fr.from_ints([8]))  # 5 via wraparound
    assert bool(Fr.eq(a, b).item())
    c = Fr.canonical(b)
    assert c.shape[-1] == limbs.CANON_LIMBS
    assert limbs.limbs_to_int(np.asarray(c)[0]) == 5
    assert bool(Fr.is_zero(Fr.sub(a, b)).item())
    assert not bool(Fr.is_zero(a).item())


def test_inv_and_pow():
    p = Fr.modulus
    xs = [random.randrange(1, p) for _ in range(16)] + [0, 1, p - 1]
    a = Fr.from_ints(xs)
    got = list(Fr.to_ints(Fr.inv(a)))
    assert got == [pow(x, p - 2, p) if x else 0 for x in xs]
    # a * a^-1 == 1
    prod = Fr.to_ints(Fr.mul(a, Fr.inv(a)))
    assert list(prod) == [1 if x else 0 for x in xs]
    got = list(Fr.to_ints(Fr.pow_const(a, 65537)))
    assert got == [pow(x, 65537, p) for x in xs]


def test_const_and_roundtrip():
    p = Fr.modulus
    v = 0xDEADBEEF_CAFEBABE
    c = Fr.const(v, (3,))
    assert list(Fr.to_ints(c)) == [v % p] * 3
    xs = [random.randrange(p) for _ in range(8)]
    assert list(Fr.to_ints(Fr.from_ints(xs))) == xs
