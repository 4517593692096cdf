"""Multi-scalar multiplication (Pippenger) on TPU.

Reference behavior: halo2_proofs `best_multiexp` (axiom fork [dep],
Cargo.lock:1320) — CPU Pippenger over rayon threads.  TPU-native redesign
(SURVEY.md §2c / §7 step 3):

* window size = 8 bits, matching the limb radix, so window digits are
  literally the canonical scalar limbs — no bit surgery;
* bucket accumulation has no scatter-add: per window we argsort point
  indices by digit and take an inclusive `lax.associative_scan` (group-law
  combine) over the sorted points; bucket sums are then differences of the
  scan at segment boundaries (located with `searchsorted`).  This is the
  sort-based segmented reduction from SURVEY.md §7 "hard part #4";
* windows are processed by a sequential `lax.map` (compile-once body) and
  combined with the standard suffix-sum + Horner double chain in
  `fori_loop`s so the traced graph stays small;
* multi-device sharding (points split across chips, partial buckets/windows
  psum-reduced over ICI) lives in `parallel/msm_sharded.py`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, limbs
from .field import FR

NL = limbs.NLIMBS
NWINDOWS = 32          # 256 bits / 8-bit windows
NBUCKETS = 256         # digit range; bucket 0 is discarded


def scalars_to_digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(N, W) Fr limb array -> (N, 32) canonical 8-bit window digits."""
    return limbs.canonical(FR, scalars)


# Below this point count, the inclusive prefix "scan" runs as a rolled
# sequential `lax.scan` (ONE add body to compile) instead of the unrolled
# `associative_scan` (log2(n) inlined levels).  Runtime is irrelevant at
# these sizes; what matters is that tiny-shape programs — the driver's
# multi-chip CPU dry run above all — compile in seconds, not tens of
# minutes on this 1-core host.
_SMALL_SCAN = 256


def _prefix_scan_points(psort, n: int):
    """Inclusive group-law prefix scan over the leading axis."""
    if n > _SMALL_SCAN:
        return jax.lax.associative_scan(curve.add, psort, axis=0)

    def body(carry, pt):
        new = curve.add(carry, pt)
        return new, new

    z = psort[0][0] * 0          # identity derived from data (vma typing)
    ident = (z, z.at[..., 0].set(1), z)
    _, prefix = jax.lax.scan(body, ident, psort)
    return prefix


def _window_buckets(points_jac, digits_w):
    """Bucket sums for one window.

    points_jac: (X, Y, Z) each (N, NL); digits_w: (N,) int32 in [0, 256).
    Returns bucket points (256, 3-tuple) where entry d = sum of points with
    digit d (d=0 entry is garbage/identity — discarded by caller).
    """
    n = digits_w.shape[0]
    order = jnp.argsort(digits_w)
    dsort = digits_w[order]
    psort = tuple(c[order] for c in points_jac)
    prefix = _prefix_scan_points(psort, n)
    # last occurrence of each digit value d
    ends = jnp.searchsorted(dsort, jnp.arange(NBUCKETS, dtype=dsort.dtype),
                            side="right") - 1          # (256,), -1 if none <= d
    present = ends > jnp.concatenate([jnp.asarray([-1]), ends[:-1]])
    safe = jnp.clip(ends, 0, n - 1)
    at_end = tuple(c[safe] for c in prefix)             # (256, NL) each
    prev = jnp.concatenate([jnp.asarray([-1]), ends[:-1]])
    has_prev = prev >= 0
    safe_prev = jnp.clip(prev, 0, n - 1)
    at_prev = tuple(c[safe_prev] for c in prefix)
    inf = curve.identity((NBUCKETS,))
    at_prev = curve._sel(has_prev, at_prev, inf)
    bucket = curve.add(at_end, curve.neg(at_prev))
    bucket = curve._sel(present, bucket, inf)
    return bucket


def _suffix_combine(buckets):
    """sum_d d * B_d via the running-suffix trick, vectorized over windows.

    buckets: tuple of (NWINDOWS, NBUCKETS, NL).  255 fori steps, each a
    (NWINDOWS,)-batched point add pair.
    """
    shape = (buckets[0].shape[0],)

    def body(i, state):
        running, acc = state
        d = NBUCKETS - 1 - i            # 255 down to 1
        b_d = tuple(c[:, d] for c in buckets)
        running = curve.add(running, b_d)
        acc = curve.add(acc, running)
        return running, acc

    # identity derived from the data so the carry inherits any shard_map
    # varying-axes type (a replicated literal init fails vma typing)
    zero = buckets[0][:, 0] * 0
    ident = (zero, zero.at[..., 0].set(1), zero)
    _, acc = jax.lax.fori_loop(0, NBUCKETS - 1, body, (ident, ident))
    return acc                           # (NWINDOWS,) points


def _horner_windows(window_sums):
    """acc = sum_w 256^w * W_w, from the top window down (8 doublings/step)."""

    def body(i, acc):
        w = NWINDOWS - 1 - i

        def dbl(_, a):
            return curve.double(a)

        acc = jax.lax.cond(i == 0, lambda a: a,
                           lambda a: jax.lax.fori_loop(0, 8, dbl, a), acc)
        w_pt = tuple(c[w] for c in window_sums)
        return curve.add(acc, w_pt)

    zero = window_sums[0][0] * 0
    ident = (zero, zero.at[..., 0].set(1), zero)
    return jax.lax.fori_loop(0, NWINDOWS, body, ident)


@jax.jit
def _msm_jacobian_one(points_affine: jnp.ndarray, scalars: jnp.ndarray):
    pts = curve.from_affine(points_affine)
    digits = scalars_to_digits(scalars)             # (N, 32)

    def per_window(dw):
        return _window_buckets(pts, dw)

    buckets = jax.lax.map(per_window, digits.T)     # (32, 256, NL) tuple
    window_sums = _suffix_combine(buckets)
    return _horner_windows(window_sums)


@jax.jit
def _jac_add(a, b):
    return curve.add(a, b)


# Per-program point-count cap: bounds a single program's bucket/window
# temporaries AND means one compiled shape serves every large MSM (compiles
# are minutes on this host).  2^16 measured stable + linear-throughput with
# the f32 kernels (the old int32 graphs crashed the worker above 2^14).
MSM_CHUNK = 1 << 16


def msm_jacobian(points_affine: jnp.ndarray, scalars: jnp.ndarray):
    """MSM: sum_i scalars[i] * points[i].

    points_affine: (N, 2, NL) ((0,0) rows = identity); scalars: (N, W) Fr.
    Returns a Jacobian point (tuple of (NL,) arrays).  Large inputs run as
    MSM_CHUNK-sized programs whose Jacobian partials are added on device;
    a tiny host fetch per chunk bounds in-flight device memory.
    """
    n = points_affine.shape[0]
    if n <= MSM_CHUNK:
        return _msm_jacobian_one(points_affine, scalars)
    # host fetches are only legal outside tracing (sharded/jitted callers
    # keep their shards <= MSM_CHUNK, so they take the one-shot path above)
    barrier = not isinstance(points_affine, jax.core.Tracer)
    acc = None
    for off in range(0, n, MSM_CHUNK):
        p = points_affine[off:off + MSM_CHUNK]
        s = scalars[off:off + MSM_CHUNK]
        if p.shape[0] < MSM_CHUNK:
            pad = MSM_CHUNK - p.shape[0]
            p = jnp.concatenate(
                [p, jnp.zeros((pad,) + p.shape[1:], p.dtype)], axis=0)
            s = jnp.concatenate(
                [s, jnp.zeros((pad,) + s.shape[1:], s.dtype)], axis=0)
        part = _msm_jacobian_one(p, s)
        acc = part if acc is None else _jac_add(acc, part)
        if barrier:
            np.asarray(acc[0][:1])  # host fetch: real in-flight barrier
    return acc


def msm(points_affine: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """MSM returning the affine (2, NL) result."""
    acc = msm_jacobian(points_affine, scalars)
    batched = tuple(c[None] for c in acc)
    return curve.to_affine(batched)[0]


@jax.jit
def msm_many(points_affine: jnp.ndarray, scalars_batch: jnp.ndarray) -> jnp.ndarray:
    """Batched MSM over one point set: scalars (m, N, W) -> (m, 2, NL) affine.

    Sequential `lax.map` over the batch (each MSM saturates the chip); one
    fused program so the caller pays a single dispatch/fetch round trip —
    on the remote-tunnel TPU each fetch costs ~25 ms, so per-column commits
    (reference: per-column `commit_lagrange` loop [dep]) are batched here.
    """
    pts = curve.from_affine(points_affine)

    def one(scalars):
        digits = scalars_to_digits(scalars)
        buckets = jax.lax.map(lambda dw: _window_buckets(pts, dw), digits.T)
        acc = _horner_windows(_suffix_combine(buckets))
        return curve.to_affine(tuple(c[None] for c in acc))[0]

    return jax.lax.map(one, scalars_batch)
