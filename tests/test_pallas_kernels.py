"""Pallas fused limb/point kernels vs the Python oracle.

Runs the kernels in interpreter mode on CPU (H2T_PALLAS_INTERPRET) so the
exact in-kernel arithmetic — carry relaxation, fold reduction, RCB16
straight-line group law — is validated without TPU hardware.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from halo2_zkcert_tpu.ops import curve, limbs, pallas_limbs
from halo2_zkcert_tpu.ops.field import FQ, FR
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'



@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_limbs, "_INTERPRET", True)
    monkeypatch.setattr(limbs, "_pallas_env", "1")
    monkeypatch.setattr(curve, "_pallas_mode", "1")


def _rand_resident(rng, n, spec):
    """Adversarial resident-class values: limbs up to 511 (lazy), plus
    canonical edge cases (0, 1, p-1, all-255)."""
    arr = rng.integers(0, 512, size=(n, limbs.NLIMBS), dtype=np.int32)
    arr[:, 32] = rng.integers(0, 8, size=n)      # top limb small (resident)
    arr[0] = 0
    arr[1] = 0; arr[1, 0] = 1
    arr[2] = limbs.int_to_limbs(spec.modulus - 1, limbs.NLIMBS)
    arr[3, :32] = 255; arr[3, 32] = 0
    return arr


def _ints(arr):
    return [limbs.limbs_to_int(r) for r in np.asarray(arr)]


N = 256


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_fused_mul_add_sub(spec):
    rng = np.random.default_rng(7)
    a = _rand_resident(rng, N, spec)
    b = _rand_resident(rng, N, spec)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    p = spec.modulus
    for which, fn, ref in [
        ("mul", pallas_limbs.fused_mul, lambda x, y: x * y % p),
        ("add", pallas_limbs.fused_add, lambda x, y: (x + y) % p),
        ("sub", pallas_limbs.fused_sub, lambda x, y: (x - y) % p),
    ]:
        out = _ints(fn(aj, bj, p))
        ai, bi = _ints(a), _ints(b)
        for i in range(N):
            assert out[i] % p == ref(ai[i], bi[i]) % p, (which, i)
        # output must be in the resident class (reusable as kernel input)
        o = np.asarray(fn(aj, bj, p))
        assert o.min() >= 0 and o.max() <= 511, which


def test_limbs_dispatch_matches_xla():
    """limbs.mul/add/sub through the Pallas route == the XLA path."""
    rng = np.random.default_rng(8)
    a = jnp.asarray(_rand_resident(rng, N, FR))
    b = jnp.asarray(_rand_resident(rng, N, FR))
    for op in (limbs.mul, limbs.add, limbs.sub):
        fast = _ints(op(FR, a, b))
        import unittest.mock as mock
        with mock.patch.object(limbs, "_pallas_env", "0"):
            slow = _ints(op(FR, a, b))
        assert [x % rc.FR for x in fast] == [x % rc.FR for x in slow], op


def test_prove_verify_through_pallas_quotient():
    """Toy proof with every Pallas path forced on (interpret mode): fused
    field ops, fused point add/double, and the fused quotient kernel
    (plonk/quotient_pallas.py) — proof must verify; tampering must fail."""
    from tests.test_plonk_e2e import build_toy
    from halo2_zkcert_tpu.plonk import (create_proof, keygen, setup,
                                        verify_proof)
    from halo2_zkcert_tpu.transcript import PoseidonTranscript

    data, advice, instances = build_toy()
    params = setup(data.k)
    pk = keygen(params, data)
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    bad = bytearray(proof)
    bad[33] ^= 1
    try:
        ok = verify_proof(params, pk.vk, instances, bytes(bad),
                          PoseidonTranscript)
    except Exception:
        ok = False
    assert not ok


def _device_points(pts_affine):
    arr = np.zeros((len(pts_affine), 2, limbs.NLIMBS), np.int32)
    for i, (x, y) in enumerate(pts_affine):
        arr[i, 0] = limbs.int_to_limbs(x, limbs.NLIMBS)
        arr[i, 1] = limbs.int_to_limbs(y, limbs.NLIMBS)
    return curve.from_affine(jnp.asarray(arr))


def _host_affine(P):
    """Homogeneous device points -> affine int pairs (host math: the
    device batch-inverse would run 254 interpreted kernels here)."""
    X, Y, Z = (np.asarray(c) for c in P)
    out = []
    for i in range(X.shape[0]):
        z = limbs.limbs_to_int(Z[i]) % rc.FQ
        zi = rc.finv(z, rc.FQ) if z else 0
        out.append((limbs.limbs_to_int(X[i]) * zi % rc.FQ,
                    limbs.limbs_to_int(Y[i]) * zi % rc.FQ))
    return out


def test_fused_point_add_and_double():
    n = 192          # >= _PALLAS_MIN_BATCH so curve.add/double dispatch
    g = rc.g1_from_affine(rc.G1_GEN)
    pts = [rc.g1_to_affine(rc.g1_mul(g, i + 1)) for i in range(n)]
    P = _device_points(pts)

    S = _host_affine(curve.add(P, P))     # doubling through the add kernel
    D = _host_affine(curve.double(P))
    for i in range(0, n, 37):
        want = rc.g1_to_affine(rc.g1_mul(g, 2 * (i + 1)))
        assert S[i] == want, ("add", i)
        assert D[i] == want, ("double", i)

    # identity and inverse cases stay complete inside the kernel
    ident = curve.identity((n,))
    A = _host_affine(curve.add(P, ident))
    assert A[5] == pts[5]
    Zsum = curve.add(P, curve.neg(P))
    assert bool(np.asarray(curve.is_identity(Zsum)).all())
