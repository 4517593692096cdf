"""Fixed-base flat-Pippenger MSM (ops/msm_fb.py) vs the Python oracle.

8-bit windows keep the bucket arrays CPU-sized; the 16-bit hardware path
is the same code with wbits=16 (digit extraction covered below).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from halo2_zkcert_tpu.ops import limbs, msm_fb
from halo2_zkcert_tpu.ops.field import Fr
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'



def _base(n):
    g = rc.g1_from_affine(rc.G1_GEN)
    pts = [rc.g1_to_affine(rc.g1_mul(g, i + 1)) for i in range(n)]
    arr = np.zeros((n, 2, limbs.NLIMBS), np.int32)
    for i, (x, y) in enumerate(pts):
        arr[i, 0] = limbs.int_to_limbs(x, limbs.NLIMBS)
        arr[i, 1] = limbs.int_to_limbs(y, limbs.NLIMBS)
    return arr, pts


def _affine(P):
    x = limbs.limbs_to_int(np.asarray(P[0])) % rc.FQ
    y = limbs.limbs_to_int(np.asarray(P[1])) % rc.FQ
    z = limbs.limbs_to_int(np.asarray(P[2])) % rc.FQ
    zi = rc.finv(z, rc.FQ) if z else 0
    return (x * zi % rc.FQ, y * zi % rc.FQ)


def test_fixed_base_msm_matches_oracle():
    n = 8
    arr, pts = _base(n)
    rng = np.random.default_rng(3)
    scal_ints = [int(rng.integers(0, 1 << 62)) * rc.FR // (1 << 62)
                 for _ in range(n)]
    scal_ints[0] = 0                       # zero scalar contributes nothing
    scal_ints[1] = rc.FR - 1               # full-width digits
    fb = msm_fb.FixedBaseMsm(arr, wbits=8)
    out = fb(Fr.from_ints(scal_ints))
    want = rc.g1_msm(pts, scal_ints)
    assert _affine(out) == want


def test_digit16_extraction():
    vals = [0, 1, rc.FR - 1, 0x1234_5678_9ABC_DEF0]
    d = np.asarray(msm_fb._digits(Fr.from_ints(vals), 16))
    for i, v in enumerate(vals):
        for w in range(16):
            assert d[i, w] == (v >> (16 * w)) & 0xFFFF


def test_msm_many_columns():
    n = 8
    arr, pts = _base(n)
    fb = msm_fb.FixedBaseMsm(arr, wbits=8)
    cols_int = [[i + 1 for i in range(n)], [7 * i + 3 for i in range(n)]]
    cols = jnp.stack([Fr.from_ints(c) for c in cols_int])
    accs = fb.msm_many(cols)
    for m in range(2):
        want = rc.g1_msm(pts, cols_int[m])
        assert _affine((accs[m, 0], accs[m, 1], accs[m, 2])) == want


def test_msm_many_bounded():
    """Bounded-value commit path: small rows + full-width blinding tail."""
    n = 16
    blind_lo = 12
    arr, pts = _base(n)
    fb = msm_fb.FixedBaseMsm(arr, wbits=8)
    rng = np.random.default_rng(9)
    cols_int = []
    for _ in range(3):
        vals = [int(v) for v in rng.integers(0, 1 << 16, size=n)]
        for r in range(blind_lo, n):       # blinding rows: full scalars
            vals[r] = int(rng.integers(0, 1 << 62)) * rc.FR // (1 << 62)
        cols_int.append(vals)
    cols = jnp.stack([Fr.from_ints(c) for c in cols_int])
    accs = fb.msm_many_bounded(cols, value_bits=16, blind_lo=blind_lo)
    for m in range(3):
        want = rc.g1_msm(pts, cols_int[m])
        assert _affine((accs[m, 0], accs[m, 1], accs[m, 2])) == want


def test_msm_streamed_matches(monkeypatch):
    """Large-domain streaming path (chunked bucket accumulation) must match
    the oracle; forced on at tiny n via the pair-count threshold."""
    n = 16
    arr, pts = _base(n)
    fb = msm_fb.FixedBaseMsm(arr, wbits=8)
    monkeypatch.setattr(fb, "STREAM_PAIRS", 1, raising=False)
    monkeypatch.setattr(msm_fb, "CHUNK", (34 * n) // 2)   # 2 slices
    rng = np.random.default_rng(5)
    cols_int = [[int(v) * 0xFFFF9 % rc.FR for v in rng.integers(0, 1 << 62, size=n)]
                for _ in range(2)]
    cols = jnp.stack([Fr.from_ints(c) for c in cols_int])
    accs = fb.msm_many(cols)
    for m in range(2):
        want = rc.g1_msm(pts, cols_int[m])
        assert _affine((accs[m, 0], accs[m, 1], accs[m, 2])) == want
    # single-point entry too
    acc = fb(cols[0])
    assert _affine(acc) == rc.g1_msm(pts, cols_int[0])
