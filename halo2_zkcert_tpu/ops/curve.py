"""BN254 G1 group operations on limb arrays (batched, branchless).

TPU-first design notes:
* Points are homogeneous projective ``(X, Y, Z)`` tuples of
  ``(..., NLIMBS)`` Fq limb arrays; the identity is ``(0, 1, 0)``.
* ``add``/``double`` are the Renes-Costello-Batina COMPLETE formulas for
  j-invariant-0 curves (eprint 2015/1060, Algorithms 7 and 9, b3 = 9):
  12M / 6M straight-line programs with NO case analysis — every exceptional
  case (identity, doubling, inverse) falls out of the algebra.  The earlier
  complete-Jacobian version needed ~24M plus `is_zero` exact-carry scans
  and a 5-way select cascade per add; since `lax.associative_scan` (MSM
  bucket accumulation) executes adds O(N) times, the unconditional
  straight-line form is ~3x cheaper end to end.
* Reference semantics: halo2curves axiom fork G1 (Cargo.lock:1359 [dep]);
  we match the group law and serialization, not its 4x64 Montgomery layout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import refcrypto as rc
from . import limbs
from .field import FQ, Fq

NL = limbs.NLIMBS


def _f(op, *args):
    return op(FQ, *args)


def _mul(a, b):
    return limbs.mul(FQ, a, b)


def _sqr(a):
    return limbs.sqr(FQ, a)


def _add(a, b):
    return limbs.add(FQ, a, b)


def _sub(a, b):
    return limbs.sub(FQ, a, b)


def _small(a, k):
    return limbs.mul_small(FQ, a, k)


def _is_zero(a):
    return limbs.is_zero(FQ, a)


def identity(shape=()) -> tuple:
    """The point at infinity, broadcast to `shape`."""
    z = limbs.zeros_like_limbs(shape)
    o = z.at[..., 0].set(1)
    return (z, o, z)


def from_affine(xy: jnp.ndarray) -> tuple:
    """(..., 2, NLIMBS) affine (with (0,0) = identity) -> projective."""
    x, y = xy[..., 0, :], xy[..., 1, :]
    inf = _is_zero(x) & _is_zero(y)
    one = jnp.zeros_like(x).at[..., 0].set(1)
    z = jnp.where(inf[..., None], jnp.zeros_like(x), one)
    y = jnp.where(inf[..., None], one, y)
    return (x, y, z)


def is_identity(P) -> jnp.ndarray:
    return _is_zero(P[2])


def neg(P) -> tuple:
    X, Y, Z = P
    return (X, limbs.neg(FQ, Y), Z)


B3 = 9   # 3*b for y^2 = x^3 + 3


def double(P) -> tuple:
    """RCB16 Algorithm 9 (complete, a=0): 6M + 2 small.

    Large batches dispatch to the Pallas-fused kernel like `add`."""
    if (_pallas_wanted()
            and P[0].ndim >= 2
            and int(np.prod(P[0].shape[:-1])) >= _PALLAS_MIN_BATCH):
        from . import pallas_limbs
        shape = P[0].shape
        flat = lambda c: c.reshape(-1, shape[-1])
        out = pallas_limbs.fused_point_double(
            tuple(flat(c) for c in P), FQ.modulus)
        return tuple(c.reshape(shape) for c in out)
    X, Y, Z = P
    t0 = _sqr(Y)
    Z3 = _small(t0, 8)
    t1 = _mul(Y, Z)
    t2 = _small(_sqr(Z), B3)
    X3 = _mul(t2, Z3)
    Y3 = _add(t0, t2)
    Z3 = _mul(t1, Z3)
    t2 = _small(t2, 3)
    t0 = _sub(t0, t2)
    Y3 = _mul(t0, Y3)
    Y3 = _add(X3, Y3)
    t1 = _mul(X, Y)
    X3 = _small(_mul(t0, t1), 2)
    return (X3, Y3, Z3)


def _sel(cond, a, b):
    """Select full points: cond shape (...,) applied to each coordinate."""
    c = cond[..., None]
    return tuple(jnp.where(c, ai, bi) for ai, bi in zip(a, b))


import os as _os

# One (40, 512)-block kernel shape serves every batch via lane padding, so
# on TPU the group law is ALWAYS the fused kernel: small widths through
# Pallas keep scan/loop graphs tiny (the unrolled XLA add at width<1024
# dominated MSM compile times) and make eager per-level scans one dispatch
# per add instead of ~100 tiny ops.
_PALLAS_MIN_BATCH = 1
_pallas_mode = _os.environ.get("H2T_PALLAS", "auto")


def _pallas_wanted() -> bool:
    if _pallas_mode == "0":
        return False
    if _pallas_mode == "1":
        return True
    return jax.default_backend() == "tpu"


def add(P, Q) -> tuple:
    """RCB16 Algorithm 7 (complete, a=0): 12M + 2 small, no branches.

    Handles identity / doubling / inverse cases purely algebraically —
    associative over the whole group, safe for associative_scan.

    Large equal-shape batches dispatch to the Pallas-fused kernel
    (ops/pallas_limbs.py): one VMEM-resident program instead of ~12
    HBM-materialized muls (~8x measured on v5e).
    """
    if (_pallas_wanted()
            and P[0].shape == Q[0].shape and P[0].ndim >= 2
            and int(np.prod(P[0].shape[:-1])) >= _PALLAS_MIN_BATCH):
        from . import pallas_limbs
        shape = P[0].shape
        flat = lambda c: c.reshape(-1, shape[-1])
        out = pallas_limbs.fused_point_add(
            tuple(flat(c) for c in P), tuple(flat(c) for c in Q),
            FQ.modulus)
        return tuple(c.reshape(shape) for c in out)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t2 = _mul(Z1, Z2)
    t3 = _mul(_add(X1, Y1), _add(X2, Y2))
    t3 = _sub(t3, _add(t0, t1))                 # X1Y2 + X2Y1
    t4 = _mul(_add(Y1, Z1), _add(Y2, Z2))
    t4 = _sub(t4, _add(t1, t2))                 # Y1Z2 + Y2Z1
    X3 = _mul(_add(X1, Z1), _add(X2, Z2))
    Y3 = _sub(X3, _add(t0, t2))                 # X1Z2 + X2Z1
    t0 = _small(t0, 3)                          # 3 X1X2
    t2 = _small(t2, B3)                         # b3 Z1Z2
    Z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    Y3 = _small(Y3, B3)
    X3 = _sub(_mul(t3, t1), _mul(t4, Y3))
    Y3 = _add(_mul(t1, Z3), _mul(Y3, t0))
    Z3 = _add(_mul(Z3, t4), _mul(t0, t3))
    return (X3, Y3, Z3)


def add_mixed(P, Q_affine) -> tuple:
    """Mixed add: P projective, Q_affine = (x, y) with implicit Z=1.

    Q must NOT be the identity (MSM table points never are).  RCB16
    Algorithm 8 semantics: complete in P (identity/double/inverse safe).
    Dispatches to the fused Pallas kernel like `add`; the XLA fallback
    simply runs the full add with Z2 = 1.
    """
    if (_pallas_wanted()
            and P[0].shape == Q_affine[0].shape and P[0].ndim >= 2
            and int(np.prod(P[0].shape[:-1])) >= _PALLAS_MIN_BATCH):
        from . import pallas_limbs
        shape = P[0].shape
        flat = lambda c: c.reshape(-1, shape[-1])
        out = pallas_limbs.fused_point_add_mixed(
            tuple(flat(c) for c in P), tuple(flat(c) for c in Q_affine),
            FQ.modulus)
        return tuple(c.reshape(shape) for c in out)
    x, y = Q_affine
    one = jnp.zeros_like(x).at[..., 0].set(1)
    return add(P, (x, y, one))


def scalar_mul(P, scalar_digits: jnp.ndarray) -> tuple:
    """Batched double-and-add: scalar_digits (..., 32) canonical 8-bit limbs.

    256 fori_loop steps; used for SRS generation and verify-side math, not
    the proving hot path (that is `msm`).
    """
    nbits = 256

    def body(i, state):
        acc, base = state
        limb = scalar_digits[..., i // 8]
        bit = (limb >> (i % 8)) & 1
        acc = _sel(bit == 1, add(acc, base), acc)
        return acc, double(base)

    acc0 = identity(P[0].shape[:-1])
    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, P))
    return acc


def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over the leading axis: one Fermat inversion
    + prefix/suffix product scans. a: (N, NLIMBS) nonzero (0 -> garbage/0).

    Padded with 1s to a power-of-two length first — the grid scan at
    non-power-of-two row counts returned wrong prefixes on TPU (round-3
    regression; see frops.batch_inv / DEBUG_R3_VERIFY_REGRESSION.md)."""
    from . import scan as scanmod
    mul1 = lambda x, y: (limbs.mul(FQ, x[0], y[0]),)
    one1 = lambda: (jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1),)
    n = a.shape[0]
    n2 = 1 << (n - 1).bit_length()
    if n2 != n:
        pad = jnp.zeros((n2 - n, NL), jnp.int32).at[:, 0].set(1)
        a = jnp.concatenate([a, pad], axis=0)
    prefix = scanmod.prefix_scan(mul1, one1, (a,))[0]
    suffix = scanmod.suffix_scan(mul1, one1, (a,))[0]
    total_inv = limbs.inv(FQ, prefix[-1])
    one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
    pre = jnp.concatenate([one, prefix[:-1]], axis=0)
    suf = jnp.concatenate([suffix[1:], one], axis=0)
    out = _mul(_mul(pre, suf), jnp.broadcast_to(total_inv, a.shape))
    return out[:n]


def to_affine(P) -> jnp.ndarray:
    """Projective -> affine (..., 2, NLIMBS); identity -> (0, 0).

    Uses batched inversion over the leading axis when P is a batch.
    """
    X, Y, Z = P
    inf = _is_zero(Z)
    safe_z = jnp.where(inf[..., None], jnp.zeros_like(Z).at[..., 0].set(1), Z)
    flat = safe_z.reshape(-1, NL)
    zinv = batch_inv(flat).reshape(safe_z.shape)
    x = _mul(X, zinv)
    y = _mul(Y, zinv)
    x = jnp.where(inf[..., None], jnp.zeros_like(x), x)
    y = jnp.where(inf[..., None], jnp.zeros_like(y), y)
    return jnp.stack([limbs.canonical_pad(FQ, x), limbs.canonical_pad(FQ, y)], axis=-2)


# ---------------------------------------------------------------------------
# Host-side converters (numpy <-> python ints, via refcrypto conventions)
# ---------------------------------------------------------------------------

def points_to_device(pts_affine) -> jnp.ndarray:
    """List of (x, y) Python-int affine points -> (N, 2, NLIMBS) array."""
    arr = np.zeros((len(pts_affine), 2, NL), dtype=np.int32)
    for i, (x, y) in enumerate(pts_affine):
        arr[i, 0] = limbs.int_to_limbs(x, NL)
        arr[i, 1] = limbs.int_to_limbs(y, NL)
    return jnp.asarray(arr)


def points_from_device(arr) -> list:
    """(N, 2, W) limb array -> list of (x, y) Python-int affine points."""
    a = np.asarray(arr)
    out = []
    for i in range(a.shape[0]):
        x = limbs.limbs_to_int(a[i, 0]) % rc.FQ
        y = limbs.limbs_to_int(a[i, 1]) % rc.FQ
        out.append((x, y))
    return out
