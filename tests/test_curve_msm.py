"""Curve ops and MSM vs the Python-int oracle."""
import random

import numpy as np
import jax.numpy as jnp

from halo2_zkcert_tpu.ops import curve, msm, limbs
from halo2_zkcert_tpu.ops.field import Fq, Fr
from halo2_zkcert_tpu.utils import refcrypto as rc

random.seed(99)


def some_points(n):
    """n distinct small multiples of G (affine python ints)."""
    G = rc.g1_from_affine(rc.G1_GEN)
    return [rc.g1_to_affine(rc.g1_mul(G, k + 1)) for k in range(n)]


def dev_points(pts):
    return curve.points_to_device(pts)


def jac_equal_affine(P, want_affine):
    got = curve.to_affine(tuple(c[None] for c in P))[0]
    x = limbs.limbs_to_int(np.asarray(got[0]))
    y = limbs.limbs_to_int(np.asarray(got[1]))
    return (x, y) == want_affine


def test_add_double_generic():
    pts = some_points(4)
    P = curve.from_affine(dev_points(pts))
    p1 = tuple(c[0] for c in P)
    p2 = tuple(c[1] for c in P)
    s = curve.add(p1, p2)
    want = rc.g1_to_affine(rc.g1_add(rc.g1_from_affine(pts[0]), rc.g1_from_affine(pts[1])))
    assert jac_equal_affine(s, want)
    d = curve.double(p1)
    wantd = rc.g1_to_affine(rc.g1_double(rc.g1_from_affine(pts[0])))
    assert jac_equal_affine(d, wantd)


def test_add_edge_cases():
    pts = some_points(2)
    P = curve.from_affine(dev_points(pts))
    p1 = tuple(c[0] for c in P)
    inf = curve.identity(())
    # P + inf = P; inf + P = P
    assert jac_equal_affine(curve.add(p1, inf), pts[0])
    assert jac_equal_affine(curve.add(inf, p1), pts[0])
    # inf + inf = inf
    assert bool(curve.is_identity(curve.add(inf, inf)))
    # P + P = 2P (h==0 doubling path)
    want2p = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(pts[0]), 2))
    assert jac_equal_affine(curve.add(p1, p1), want2p)
    # P + (-P) = inf
    assert bool(curve.is_identity(curve.add(p1, curve.neg(p1))))


def test_scalar_mul():
    pts = some_points(1)
    P = curve.from_affine(dev_points(pts))
    p1 = tuple(c[0] for c in P)
    k = random.randrange(rc.FR)
    digits = jnp.asarray(limbs.int_to_limbs(k, 32))
    got = curve.scalar_mul(p1, digits)
    want = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(pts[0]), k))
    assert jac_equal_affine(got, want)


def test_batch_inv():
    xs = [random.randrange(1, rc.FQ) for _ in range(17)]
    a = Fq.from_ints(xs)
    got = list(Fq.to_ints(curve.batch_inv(a)))
    assert got == [pow(x, rc.FQ - 2, rc.FQ) for x in xs]


def test_msm_small():
    n = 64
    pts = some_points(n)
    scalars = [random.randrange(rc.FR) for _ in range(n)]
    got_aff = msm.msm(dev_points(pts), Fr.from_ints(scalars))
    want = rc.g1_msm(pts, scalars)
    x = limbs.limbs_to_int(np.asarray(got_aff[0]))
    y = limbs.limbs_to_int(np.asarray(got_aff[1]))
    assert (x, y) == want


def test_msm_edge_scalars():
    """Zero scalars, duplicate digits, identity points in the input.

    Padded to the same N=64 as test_msm_small so the (expensive, cached)
    MSM compile is shared between the two tests.
    """
    n = 64
    pts = some_points(n)
    pts[3] = (0, 0)  # identity point in the set
    scalars = [0, 1, 1, 12345, rc.FR - 1, 255, 256, 2 ** 64] + [0] * (n - 8)
    got_aff = msm.msm(dev_points(pts), Fr.from_ints(scalars))
    want = rc.g1_msm(pts, scalars)
    x = limbs.limbs_to_int(np.asarray(got_aff[0]))
    y = limbs.limbs_to_int(np.asarray(got_aff[1]))
    assert (x, y) == want
