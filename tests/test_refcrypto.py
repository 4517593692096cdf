"""Tests for the pure-Python ground-truth crypto oracle.

These pin down the BN254 parameters and primitives that every JAX kernel is
later tested against (reference: halo2curves axiom fork, Cargo.lock:1359 [dep]).
"""
import pytest

from halo2_zkcert_tpu.utils import refcrypto as rc


def test_moduli_bitlengths():
    assert rc.FQ.bit_length() == 254
    assert rc.FR.bit_length() == 254
    assert (rc.FR - 1) % (1 << 28) == 0  # 2-adicity 28


def test_g1_group_law():
    G = rc.g1_from_affine(rc.G1_GEN)
    assert rc.g1_is_on_curve_affine(rc.G1_GEN)
    acc = rc.G1_IDENTITY
    for _ in range(7):
        acc = rc.g1_add(acc, G)
    assert rc.g1_to_affine(acc) == rc.g1_to_affine(rc.g1_mul(G, 7))
    # group order
    assert rc.g1_to_affine(rc.g1_mul(G, rc.FR)) == (0, 0)
    # inverse
    s = rc.g1_add(rc.g1_mul(G, 5), rc.g1_neg(rc.g1_mul(G, 5)))
    assert rc.g1_is_identity(s)


def test_g1_msm_matches_sum():
    G = rc.g1_from_affine(rc.G1_GEN)
    pts = [rc.g1_to_affine(rc.g1_mul(G, k)) for k in (1, 2, 3, 4)]
    scalars = [10, 20, 30, 40]
    want = rc.g1_to_affine(rc.g1_mul(G, sum((k + 1) * s for k, s in enumerate(scalars))))
    assert rc.g1_msm(pts, scalars) == want


def test_g1_compress_roundtrip():
    G = rc.g1_from_affine(rc.G1_GEN)
    for k in (1, 2, 3, 0xDEADBEEF, rc.FR - 1):
        a = rc.g1_to_affine(rc.g1_mul(G, k))
        assert rc.g1_decompress(rc.g1_compress(a)) == a
    assert rc.g1_compress((0, 0)) == bytes(32)
    assert rc.g1_decompress(bytes(32)) == (0, 0)


def test_fr_roots_of_unity():
    for k in (0, 1, 5, 11):
        w = rc.fr_root_of_unity(k)
        assert pow(w, 1 << k, rc.FR) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), rc.FR) != 1


def test_keccak256_vectors():
    # Ethereum keccak-256 (NOT sha3-256) known answers
    assert rc.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert rc.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert rc.keccak256(b"x" * 200).hex() != rc.keccak256(b"x" * 199).hex()


@pytest.mark.slow
def test_pairing_bilinearity():
    G1 = rc.G1_GEN
    G2 = (rc.G2_GEN_X, rc.G2_GEN_Y)
    e1 = rc.pairing(G1, G2)
    P2 = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(G1), 2))
    Q3 = rc.g2_mul_affine(G2, 3)
    assert rc.pairing(P2, G2) == rc.f12_mul(e1, e1)
    assert rc.pairing(G1, Q3) == rc.f12_mul(rc.f12_mul(e1, e1), e1)
    assert e1 != rc.F12_ONE
    assert rc.f12_pow(e1, rc.FR) == rc.F12_ONE


@pytest.mark.slow
def test_pairing_check_kzg_shape():
    # e([a]G1, [b]G2) * e(-[ab]G1, G2) == 1  — the KZG verification form
    G1 = rc.g1_from_affine(rc.G1_GEN)
    G2 = (rc.G2_GEN_X, rc.G2_GEN_Y)
    a, b = 1234567, 7654321
    lhs = rc.g1_to_affine(rc.g1_mul(G1, a))
    bg2 = rc.g2_mul_affine(G2, b)
    rhs = rc.g1_to_affine(rc.g1_neg(rc.g1_mul(G1, a * b)))
    assert rc.pairing_check([(lhs, bg2), (rhs, G2)])
