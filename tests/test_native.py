"""Native host runtime (native/hostmath.cpp) vs the pure-Python oracles.

The C++ library replaces the reference's native L1/transcript layers
(halo2curves Cargo.lock:1359, poseidon-rs Cargo.lock:2068 [dep]) for
host-side work; refcrypto stays the golden reference it is tested against.
"""
import numpy as np
import pytest

from halo2_zkcert_tpu import native
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native lib unavailable")

RNG = np.random.default_rng(11)


def _ints(n, bits=248):
    return [int.from_bytes(RNG.bytes(bits // 8), "little") for _ in range(n)]


def test_field_batches():
    a, b = _ints(32), _ints(32)
    assert native.f_mul_batch(native.FR_ID, a, b) == [
        (x * y) % rc.FR for x, y in zip(a, b)]
    assert native.f_mul_batch(native.FQ_ID, a, b) == [
        (x * y) % rc.FQ for x, y in zip(a, b)]
    inv = native.f_inv_batch(native.FR_ID, a[:8])
    assert all((g * x) % rc.FR == 1 for g, x in zip(inv, a))
    assert native.f_inv_batch(native.FR_ID, [0]) == [0]
    base = a[0] % rc.FR
    assert native.f_powers(native.FR_ID, base, 16) == [
        pow(base, i, rc.FR) for i in range(16)]


def test_g1_msm_matches_oracle():
    G1 = rc.g1_from_affine(rc.G1_GEN)
    pts = [rc.g1_to_affine(rc.g1_mul(G1, i + 1)) for i in range(16)]
    scal = [x % rc.FR for x in _ints(16)]
    assert native.g1_msm(pts, scal) == rc.g1_msm(pts, scal)
    # identity points and zero scalars
    assert native.g1_msm([(0, 0)] + pts, [7] + scal) == rc.g1_msm(pts, scal)
    assert native.g1_msm(pts, [0] * 16) == (0, 0)


def test_g1_fixed_base_and_srs():
    tau = 0xABCDEF987654321
    G1 = rc.g1_from_affine(rc.G1_GEN)
    got = native.g1_srs(rc.G1_GEN, tau, 8)
    want = [rc.g1_to_affine(rc.g1_mul(G1, pow(tau, i, rc.FR)))
            for i in range(8)]
    assert got == want
    scal = [x % rc.FR for x in _ints(8)] + [0, 1]
    got = native.g1_fixed_base_many(rc.G1_GEN, scal)
    want = [rc.g1_to_affine(rc.g1_mul(G1, s)) if s else (0, 0) for s in scal]
    assert got == want
    assert native.g1_sum(want[:8]) == rc.g1_msm(want[:8], [1] * 8)


def test_srs_setup_native_matches_host_oracle():
    from halo2_zkcert_tpu.plonk import kzg
    tau = 0x1357924680
    a = kzg._setup_host(4, tau)
    b = kzg._setup_native(4, tau)
    assert np.array_equal(np.asarray(a.g), np.asarray(b.g))
    assert np.array_equal(np.asarray(a.g_lagrange), np.asarray(b.g_lagrange))
    assert a.s_g2 == b.s_g2


def test_poseidon_matches_python():
    from halo2_zkcert_tpu.transcript import poseidon as pos
    state = [3, 1 << 200, rc.FR - 1]
    # bypass the dispatch to get the pure-Python reference
    p = rc.FR
    rcs, mds = pos.poseidon_constants(p)
    s = list(state)
    half = pos.R_F // 2
    for r in range(pos.R_F + pos.R_P):
        s = [(s[i] + rcs[r][i]) % p for i in range(pos.T)]
        if half <= r < half + pos.R_P:
            s[0] = pos._sbox(s[0], p)
        else:
            s = [pos._sbox(x, p) for x in s]
        s = [sum(mds[i][j] * s[j] for j in range(pos.T)) % p
             for i in range(pos.T)]
    assert native.poseidon_permute(state) == s


def test_keccak_matches_python():
    for data in (b"", b"a", b"abc" * 50, bytes(range(256)) * 2):
        assert native.keccak256(data) == rc.keccak256(data)
