"""NTT kernels vs Python-int DFT oracle (roots of unity, 2-adicity 28)."""
import random

import numpy as np
import pytest
import jax.numpy as jnp

from halo2_zkcert_tpu.ops import ntt as nttmod
from halo2_zkcert_tpu.ops.field import Fr
from halo2_zkcert_tpu.utils import refcrypto as rc

random.seed(7)


def naive_dft(coeffs, k):
    n = 1 << k
    w = rc.fr_root_of_unity(k)
    return [sum(coeffs[j] * pow(w, i * j, rc.FR) for j in range(n)) % rc.FR
            for i in range(n)]


def test_ntt_matches_naive_dft():
    k = 5
    n = 1 << k
    xs = [random.randrange(rc.FR) for _ in range(n)]
    a = Fr.from_ints(xs)
    got = list(Fr.to_ints(nttmod.ntt(a, k)))
    assert got == naive_dft(xs, k)


def test_intt_roundtrip():
    k = 8
    n = 1 << k
    xs = [random.randrange(rc.FR) for _ in range(n)]
    a = Fr.from_ints(xs)
    back = list(Fr.to_ints(nttmod.intt(nttmod.ntt(a, k), k)))
    assert back == xs


def test_convolution_theorem():
    """NTT(a) * NTT(b) pointwise == NTT(a * b as polynomials mod X^n - 1)."""
    k = 4
    n = 1 << k
    xs = [random.randrange(rc.FR) for _ in range(n)]
    ys = [random.randrange(rc.FR) for _ in range(n)]
    # cyclic convolution via Python ints
    conv = [0] * n
    for i in range(n):
        for j in range(n):
            conv[(i + j) % n] = (conv[(i + j) % n] + xs[i] * ys[j]) % rc.FR
    a, b = Fr.from_ints(xs), Fr.from_ints(ys)
    prod = Fr.mul(nttmod.ntt(a, k), nttmod.ntt(b, k))
    got = list(Fr.to_ints(nttmod.intt(prod, k)))
    assert got == conv


def test_coset_roundtrip_and_values():
    k = 4
    n = 1 << k
    g = 7  # Fr multiplicative generator (halo2curves GENERATOR)
    xs = [random.randrange(rc.FR) for _ in range(n)]
    a = Fr.from_ints(xs)
    vals = list(Fr.to_ints(nttmod.coset_ntt(a, k, g)))
    w = rc.fr_root_of_unity(k)
    want = [sum(xs[j] * pow(g * pow(w, i, rc.FR) % rc.FR, j, rc.FR)
                for j in range(n)) % rc.FR for i in range(n)]
    assert vals == want
    back = list(Fr.to_ints(nttmod.coset_intt(Fr.from_ints(vals), k, g)))
    assert back == xs


def test_ntt_multicolumn():
    """Batch axis: (n, C, L) transforms each column independently."""
    k, C = 4, 3
    n = 1 << k
    cols = [[random.randrange(rc.FR) for _ in range(n)] for _ in range(C)]
    a = jnp.stack([Fr.from_ints(c) for c in cols], axis=1)
    out = nttmod.ntt(a, k)
    for c in range(C):
        got = list(Fr.to_ints(out[:, c]))
        assert got == naive_dft(cols[c], k)


def test_ntt_mxu_matches_radix2():
    """The MXU four-step (ops/ntt_mxu) must agree with the radix-2 path
    mod p for every transform flavor, across base-case and recursive
    sizes (k=8,10 exercise two recursion levels)."""
    import numpy as np
    from halo2_zkcert_tpu.ops import limbs, ntt_mxu

    rng = np.random.default_rng(7)
    g = rc.FR_GENERATOR

    def ints(arr):
        a = np.asarray(arr)
        return [[limbs.limbs_to_int(a[i, j]) % rc.FR
                 for j in range(a.shape[1])] for i in range(a.shape[0])]

    for k in (5, 8, 10):
        n = 1 << k
        a = jnp.asarray(rng.integers(0, 256, size=(n, 2, limbs.NLIMBS),
                                     dtype=np.int32))
        for name, ref_fn, mxu_fn in (
                ("ntt", lambda x: nttmod._ntt_impl(
                    x, *nttmod._device_tables(k, False), k, False),
                 lambda x: ntt_mxu.ntt(x, k)),
                ("intt", lambda x: nttmod._ntt_impl(
                    x, *nttmod._device_tables(k, True), k, True),
                 lambda x: ntt_mxu.intt(x, k)),
        ):
            assert ints(ref_fn(a)) == ints(mxu_fn(a)), (name, k)
        ref = nttmod.scale_by_powers(a, g, n)
        ref = nttmod._ntt_impl(ref, *nttmod._device_tables(k, False), k,
                               False)
        assert ints(ref) == ints(ntt_mxu.coset_ntt(a, k, g)), ("coset", k)
        back = ntt_mxu.coset_intt(jnp.asarray(np.asarray(ref)), k, g)
        assert ints(back) == ints(a), ("coset roundtrip", k)


@pytest.mark.slow
def test_ntt_mxu_nested_recursion_matches_radix2():
    """ADVICE r3: production sizes (k=17, extended k~19-21) exercise NESTED
    four-step recursion (k2 > MAX_RADIX_LOG splits again) — cover k=15
    (two recursion levels: 15 -> 8 -> 1+7) including coset_intt's
    out_scale/tw2 fold under nesting, against the radix-2 oracle."""
    import numpy as np
    from halo2_zkcert_tpu.ops import limbs, ntt_mxu

    rng = np.random.default_rng(11)
    g = rc.FR_GENERATOR
    k = 15
    n = 1 << k
    assert k - ntt_mxu.MAX_RADIX_LOG > ntt_mxu.MAX_RADIX_LOG  # nested split
    a = jnp.asarray(rng.integers(0, 256, size=(n, 1, limbs.NLIMBS),
                                 dtype=np.int32))

    def ints(arr):
        x = np.asarray(arr)[:, 0]
        return [limbs.limbs_to_int(x[i]) % rc.FR for i in range(x.shape[0])]

    ref = nttmod._ntt_impl(a, *nttmod._device_tables(k, False), k, False)
    assert ints(ref) == ints(ntt_mxu.ntt(a, k))
    back = ntt_mxu.intt(jnp.asarray(np.asarray(ref)), k)
    assert ints(back) == ints(a)
    # coset round trip exercises in_scale fold (fwd) and out_scale/tw2 (inv)
    cos = ntt_mxu.coset_ntt(a, k, g)
    ref_cos = nttmod._ntt_impl(nttmod.scale_by_powers(a, g, n),
                               *nttmod._device_tables(k, False), k, False)
    assert ints(cos) == ints(ref_cos)
    assert ints(ntt_mxu.coset_intt(jnp.asarray(np.asarray(cos)), k, g)) \
        == ints(a)
