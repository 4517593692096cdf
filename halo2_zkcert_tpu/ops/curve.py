"""BN254 G1 group operations on limb arrays (batched, branchless).

TPU-first design notes:
* Points are Jacobian ``(X, Y, Z)`` tuples of ``(..., NLIMBS)`` Fq limb
  arrays; the identity is ``Z == 0`` (stored as (0, 1, 0)).
* ``add`` is *complete*: identity / doubling / inverse cases are resolved
  with `jnp.where` selects, never Python branches — the same compiled kernel
  handles every case, which is what `lax.associative_scan` (MSM bucket
  accumulation) and `fori_loop` (scalar mul) require.
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
    """(..., 2, NLIMBS) affine (with (0,0) = identity) -> Jacobian tuple."""
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
    nY = limbs.neg(FQ, Y)
    # keep identity's Y=1 representation stable (any Y works when Z=0)
    return (X, nY, Z)


def double(P) -> tuple:
    """Jacobian doubling (a=0 curve): 2009-l style, complete for Z=0/Y=0."""
    X1, Y1, Z1 = P
    A = _sqr(X1)
    B = _sqr(Y1)
    C = _sqr(B)
    t = _sqr(_add(X1, B))
    D = _small(_sub(_sub(t, A), C), 2)
    E = _small(A, 3)
    F = _sqr(E)
    X3 = _sub(F, _small(D, 2))
    Y3 = _sub(_mul(E, _sub(D, X3)), _small(C, 8))
    Z3 = _small(_mul(Y1, Z1), 2)
    return (X3, Y3, Z3)


def _sel(cond, a, b):
    """Select full points: cond shape (...,) applied to each coordinate."""
    c = cond[..., None]
    return tuple(jnp.where(c, ai, bi) for ai, bi in zip(a, b))


def add(P, Q) -> tuple:
    """Complete Jacobian addition (branchless).

    Handles: P=inf, Q=inf, P=Q (double), P=-Q (infinity), generic.
    Associative over the whole group — safe for associative_scan.
    """
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    p_inf = _is_zero(Z1)
    q_inf = _is_zero(Z2)
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(_mul(Y1, Z2), Z2Z2)
    S2 = _mul(_mul(Y2, Z1), Z1Z1)
    H = _sub(U2, U1)
    R = _sub(S2, S1)
    h_zero = _is_zero(H)
    r_zero = _is_zero(R)
    # generic addition
    I = _sqr(_small(H, 2))
    J = _mul(H, I)
    rr = _small(R, 2)
    V = _mul(U1, I)
    X3 = _sub(_sub(_sqr(rr), J), _small(V, 2))
    Y3 = _sub(_mul(rr, _sub(V, X3)), _small(_mul(S1, J), 2))
    ZZ = _sub(_sub(_sqr(_add(Z1, Z2)), Z1Z1), Z2Z2)
    Z3 = _mul(ZZ, H)
    gen = (X3, Y3, Z3)
    dbl = double(P)
    inf = identity(Z1.shape[:-1])
    # selection cascade (last applied wins)
    out = gen
    out = _sel(h_zero & r_zero & ~p_inf & ~q_inf, dbl, out)
    out = _sel(h_zero & ~r_zero & ~p_inf & ~q_inf, inf, out)
    out = _sel(q_inf, P, out)
    out = _sel(p_inf, Q, out)
    return out


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
    + prefix/suffix product scans. a: (N, NLIMBS) nonzero (0 -> garbage/0)."""
    mulf = partial(limbs.mul, FQ)
    prefix = jax.lax.associative_scan(mulf, a, axis=0)
    suffix = jax.lax.associative_scan(mulf, a, axis=0, reverse=True)
    total_inv = limbs.inv(FQ, prefix[-1])
    n = a.shape[0]
    one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
    pre = jnp.concatenate([one, prefix[:-1]], axis=0)
    suf = jnp.concatenate([suffix[1:], one], axis=0)
    return mulf(mulf(pre, suf), jnp.broadcast_to(total_inv, a.shape))


def to_affine(P) -> jnp.ndarray:
    """Jacobian -> affine (..., 2, NLIMBS); identity -> (0, 0).

    Uses batched inversion over the leading axis when P is a batch.
    """
    X, Y, Z = P
    inf = _is_zero(Z)
    safe_z = jnp.where(inf[..., None], jnp.zeros_like(Z).at[..., 0].set(1), Z)
    flat = safe_z.reshape(-1, NL)
    zinv = batch_inv(flat).reshape(safe_z.shape)
    zinv2 = _sqr(zinv)
    x = _mul(X, zinv2)
    y = _mul(Y, _mul(zinv2, zinv))
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
