"""Unit tests for the batched/fetch-avoiding device ops."""
import numpy as np
import jax.numpy as jnp
import pytest

from halo2_zkcert_tpu.ops import frops, limbs, msm
from halo2_zkcert_tpu.ops.field import Fr
from halo2_zkcert_tpu.utils import refcrypto as rc


def test_poly_eval_many():
    polys = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]]
    xs = [11, 123456789]
    P = jnp.stack([Fr.from_ints(p) for p in polys])
    X = jnp.stack([Fr.from_ints([x])[0] for x in xs])
    got = [int(v) for v in Fr.to_ints(frops.poly_eval_many(P, X))]
    want = [sum(c * pow(x, i, rc.FR) for i, c in enumerate(p)) % rc.FR
            for p, x in zip(polys, xs)]
    assert got == want


def test_msm_many_matches_single():
    rng = np.random.default_rng(3)
    n = 32
    pts = []
    p = rc.g1_from_affine(rc.G1_GEN)
    for i in range(n):
        pts.append(rc.g1_to_affine(p))
        p = rc.g1_add(p, rc.g1_from_affine(rc.G1_GEN))
    arr = np.zeros((n, 2, limbs.NLIMBS), np.int32)
    for i, (x, y) in enumerate(pts):
        arr[i, 0] = limbs.int_to_limbs(x, limbs.NLIMBS)
        arr[i, 1] = limbs.int_to_limbs(y, limbs.NLIMBS)
    scal1 = [int(v) for v in rng.integers(1, 2**31, n)]
    scal2 = [int(v) for v in rng.integers(1, 2**31, n)]
    batch = jnp.stack([Fr.from_ints(scal1), Fr.from_ints(scal2)])
    got = np.asarray(msm.msm_many(jnp.asarray(arr), batch))
    for row, scal in zip(got, (scal1, scal2)):
        want = rc.g1_msm(pts, scal)
        x = limbs.limbs_to_int(row[0]) % rc.FQ
        y = limbs.limbs_to_int(row[1]) % rc.FQ
        assert (x, y) == want


@pytest.mark.parametrize("seed", [0, 1])
def test_lookup_permute_device_valid(seed):
    rng = np.random.default_rng(seed)
    n, usable = 64, 50
    table_vals = [int(v) for v in rng.integers(0, 16, usable)]
    # ensure full coverage of inputs: draw inputs from table values
    in_vals = [table_vals[int(i)] for i in rng.integers(0, usable, usable)]
    a = Fr.from_ints(in_vals + [999] * (n - usable))
    s = Fr.from_ints(table_vals + [777] * (n - usable))
    a_p, s_p, ok = frops.lookup_permute_device(a, s, usable)
    assert bool(ok)
    a_ints = [int(v) for v in Fr.to_ints(a_p)][:usable]
    s_ints = [int(v) for v in Fr.to_ints(s_p)][:usable]
    assert a_ints == sorted(in_vals)
    # permuted-lookup shape: first occurrences match; rest is leftover
    from collections import Counter
    for i in range(usable):
        if i == 0 or a_ints[i] != a_ints[i - 1]:
            assert s_ints[i] == a_ints[i]
    assert Counter(s_ints) == Counter(table_vals)


def test_lookup_permute_device_detects_missing():
    n, usable = 32, 20
    a = Fr.from_ints([5] * usable + [0] * (n - usable))
    s = Fr.from_ints([4] * usable + [0] * (n - usable))
    _, _, ok = frops.lookup_permute_device(a, s, usable)
    assert not bool(ok)
