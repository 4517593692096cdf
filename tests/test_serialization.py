"""Golden-vector serialization tests (CONVENTIONS.md rows 1-2).

Pins the byte-level encodings with explicit vectors and an INDEPENDENT
inline affine-EC oracle (chord/tangent + Fermat inversion — no refcrypto
group code), so a format regression can't hide behind self-consistency.
"""
import pytest

from halo2_zkcert_tpu.utils import refcrypto as rc

FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def test_moduli_golden():
    assert rc.FQ == FQ
    assert rc.FR == FR


def test_fe_bytes_golden():
    assert rc.fe_to_bytes_le(0) == b"\x00" * 32
    assert rc.fe_to_bytes_le(1) == b"\x01" + b"\x00" * 31
    v = 0x1234_5678_9ABC_DEF0
    b = rc.fe_to_bytes_le(v)
    assert b[:8] == bytes.fromhex("f0debc9a78563412")
    assert b[8:] == b"\x00" * 24
    assert rc.fe_from_bytes_le(b) == v
    top = rc.fe_to_bytes_le(FQ - 1)
    assert rc.fe_from_bytes_le(top) == FQ - 1
    assert len(top) == 32


def _ec_add_oracle(p, q):
    """Independent affine BN254 add (None = identity)."""
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2 and (y1 + y2) % FQ == 0:
        return None
    if p == q:
        lam = 3 * x1 * x1 * pow(2 * y1, FQ - 2, FQ) % FQ
    else:
        lam = (y2 - y1) * pow(x2 - x1, FQ - 2, FQ) % FQ
    x3 = (lam * lam - x1 - x2) % FQ
    return (x3, (lam * (x1 - x3) - y1) % FQ)


def _ec_mul_oracle(p, k):
    acc = None
    while k:
        if k & 1:
            acc = _ec_add_oracle(acc, p)
        p = _ec_add_oracle(p, p)
        k >>= 1
    return acc


def test_g1_small_multiples_golden():
    """2G and 3G from the independent oracle; refcrypto must agree."""
    g = rc.G1_GEN
    assert g == (1, 2)
    want2 = _ec_add_oracle(g, g)
    want3 = _ec_add_oracle(want2, g)
    got2 = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(g), 2))
    got3 = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(g), 3))
    assert got2 == want2
    assert got3 == want3
    # explicit vector: 2G (computable by hand from the tangent law)
    lam = 3 * pow(2 * 2, FQ - 2, FQ) % FQ
    assert want2[0] == (lam * lam - 2) % FQ


def test_g1_compress_roundtrip_and_rejection():
    for k in (1, 2, 7, 123456789):
        pt = _ec_mul_oracle(rc.G1_GEN, k)
        raw = rc.g1_compress(pt)
        assert len(raw) == 32
        assert rc.g1_decompress(raw) == pt
    # non-canonical x (>= FQ) must be rejected (round-1 finding)
    with pytest.raises(Exception):
        rc.g1_decompress(b"\xff" * 32)


def test_order_golden():
    """FR * G == identity via the independent oracle's doubling chain is
    infeasible; instead check r*G == O through refcrypto AND that the
    oracle agrees with refcrypto on a large scalar."""
    k = 0xDEADBEEF12345678
    want = _ec_mul_oracle(rc.G1_GEN, k)
    got = rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(rc.G1_GEN), k))
    assert got == want
    assert rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(rc.G1_GEN), rc.FR)) \
        == rc.G1_IDENTITY[:2] or rc.g1_to_affine(
            rc.g1_mul(rc.g1_from_affine(rc.G1_GEN), rc.FR)) == (0, 0)
