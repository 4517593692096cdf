"""Device-side polynomial / batched scalar ops over BN254 Fr limb arrays.

These are the O(n)-sized vector primitives the PLONK prover pipeline
(SURVEY.md §3.2) is assembled from, beyond NTT and MSM: prefix products
(grand-product Z polys), batched inversion, power tables, polynomial
evaluation and division by a linear factor.  All are pure jittable JAX on
the ``(n, NLIMBS)`` limb representation — no data-dependent control flow.

Reference behavior: halo2_proofs `parallelize`-based poly math (axiom fork
[dep] Cargo.lock:1320); here the parallel axis is the vector lane axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import refcrypto as rc
from . import limbs
from . import scan as scanmod
from .field import FR, Fr


def _one1():
    return (jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1),)


def _zero1():
    return (jnp.zeros((1, NL), jnp.int32),)


def _mul1(a, b):
    return (limbs.mul(FR, a[0], b[0]),)


# KS threshold for FIELD-element scans.  Hypothesis tested round 4: the
# log-depth Kogge-Stone sweep should beat the grid scan's sequential
# steps for cheap monoids — MEASURED OTHERWISE end-to-end at k=17 on the
# v5e (KS default cost ~+2 s per proof: its n*log2(n) full-width
# slice+concat traffic outweighs the saved dispatch latency).  Default
# stays at the generic grid threshold; the knob remains for re-testing on
# other topologies.
import os as _os
_FIELD_KS_MAX = int(_os.environ.get("H2T_FIELD_KS_MAX", 16384))


def _scan_mul(a):
    """Prefix scan under field mul (KS sweep at prover sizes; see
    ops/scan.py — associative_scan is a compile/HBM trap, and the grid
    scan's sequential depth is latency-bound for cheap monoids)."""
    return scanmod.prefix_scan(_mul1, _one1, (a,), ks_max=_FIELD_KS_MAX)[0]

NL = limbs.NLIMBS


def _mul(a, b):
    return limbs.mul(FR, a, b)


@jax.jit
def prefix_product(a: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product over axis 0: out[i] = prod_{j<=i} a[j]."""
    return _scan_mul(a)


@jax.jit
def prefix_product_batched(a: jnp.ndarray) -> jnp.ndarray:
    """(m, n, NL) -> independent inclusive prefix products along axis 1,
    all in ONE scan program (the per-step combine widens m-fold; the
    sequential step count does not grow)."""
    return scanmod.prefix_scan_batched(_mul1, _one1, (a,),
                                       ks_max=_FIELD_KS_MAX)[0]


@jax.jit
def affine_scan(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inclusive scan of the affine recurrence A[i] = m[i]*A[i-1] + b[i]
    with A[-1] = 0, over axis 0 (m, b: (n, NL) Fr limbs).

    The (m, b) pairs compose associatively:
    (m1,b1) then (m2,b2) = (m2*m1, m2*b1 + b2); identity (1, 0)."""

    def combine(l, r):
        ml, bl = l
        mr, br = r
        return (limbs.mul(FR, mr, ml),
                limbs.add(FR, limbs.mul(FR, mr, bl), br))

    def ident1():
        one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
        return (one, jnp.zeros((1, NL), jnp.int32))

    _, a_vals = scanmod.prefix_scan(combine, ident1, (m, b),
                                    ks_max=_FIELD_KS_MAX)
    return a_vals


@jax.jit
def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over axis 0 (one Fermat inversion total).

    a: (N, NL) with nonzero entries (zero entries produce garbage — caller
    guarantees nonzero, as halo2 does for permutation denominators).

    The input is padded with 1s to a power-of-two length: the grid scan
    with a NON-power-of-two row count (e.g. 3*2^17 from the shplonk zinv /
    grand-product batches) returned wrong prefixes ON TPU (round-3
    regression, docs/DEBUG_R3_VERIFY_REGRESSION.md); every power-of-two
    size is oracle-verified.  Padding with the multiplicative identity
    leaves every prefix/suffix on the real slice unchanged.
    """
    n = a.shape[0]
    n2 = 1 << (n - 1).bit_length()
    if n2 != n:
        pad = jnp.zeros((n2 - n, NL), jnp.int32).at[:, 0].set(1)
        a_p = jnp.concatenate([a, pad], axis=0)
    else:
        a_p = a
    prefix = _scan_mul(a_p)
    suffix = scanmod.suffix_scan(_mul1, _one1, (a_p,),
                                 ks_max=_FIELD_KS_MAX)[0]
    total_inv = limbs.inv(FR, prefix[-1])
    one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
    pre = jnp.concatenate([one, prefix[:-1]], axis=0)
    suf = jnp.concatenate([suffix[1:], one], axis=0)
    out = _mul(_mul(pre, suf), jnp.broadcast_to(total_inv, a_p.shape))
    return out[:n]


@partial(jax.jit, static_argnums=1)
def powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(NL,) element -> (n, NL) table [1, x, x^2, ..., x^(n-1)] via log-depth scan."""
    xs = jnp.broadcast_to(x[None], (n, NL))
    one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
    scan = _scan_mul(xs)                                  # x, x^2, ..., x^n
    return jnp.concatenate([one, scan[:-1]], axis=0)


@jax.jit
def tree_sum(a: jnp.ndarray) -> jnp.ndarray:
    """Sum over axis 0 mod r: (N, NL) -> (NL,).

    Chunked plain-int32 adds (limbs <= 511, so 4096-row chunks stay < 2^21)
    interleaved with partial reduction; log-depth over chunks.
    """
    x = a
    while x.shape[0] > 1:
        n = x.shape[0]
        c = min(n, 4096)
        pad = (-n) % c
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, NL), jnp.int32)], axis=0)
        x = x.reshape(-1, c, NL).sum(axis=1)
        x = limbs.partial_reduce(FR, x, rounds=3)
    return x[0]


@jax.jit
def poly_eval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] x^i.  coeffs (N, NL), x (NL,) -> (NL,)."""
    pw = powers(x, coeffs.shape[0])
    return tree_sum(_mul(coeffs, pw))


@jax.jit
def tree_sum_batched(a: jnp.ndarray) -> jnp.ndarray:
    """Batched sum mod r over axis 1: (q, n, NL) -> (q, NL)."""
    x = a
    while x.shape[1] > 1:
        n = x.shape[1]
        c = min(n, 4096)
        pad = (-n) % c
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(x.shape[0], -1, c, NL).sum(axis=2)
        x = limbs.partial_reduce(FR, x, rounds=3)
    return x[:, 0]


@jax.jit
def bary_weights(omega_pows: jnp.ndarray, xs: jnp.ndarray,
                 scales: jnp.ndarray) -> jnp.ndarray:
    """Barycentric evaluation weights over the domain H = {omega^i}.

    For each point x_j (not in H): w_j[i] = scale_j * omega^i / (x_j - omega^i)
    with scale_j = (x_j^n - 1)/n computed host-side.  Then p(x_j) =
    sum_i values[i] * w_j[i] — evaluation STRAIGHT FROM LAGRANGE VALUES,
    no coefficient conversion (reference evaluates coefficient polys
    [dep halo2_proofs]; the values are identical field elements).

    omega_pows (n, NL); xs, scales (p, NL) -> (p, n, NL).
    """
    p, n = xs.shape[0], omega_pows.shape[0]
    denom = limbs.sub(FR, jnp.broadcast_to(xs[:, None], (p, n, NL)),
                      omega_pows[None])
    dinv = batch_inv(denom.reshape(p * n, NL)).reshape(p, n, NL)
    return _mul(_mul(jnp.broadcast_to(omega_pows[None], (p, n, NL)), dinv),
                jnp.broadcast_to(scales[:, None], (p, n, NL)))


@jax.jit
def eval_lagrange_many(values: jnp.ndarray, weights: jnp.ndarray,
                       widx: jnp.ndarray) -> jnp.ndarray:
    """Batched barycentric evals: values (q, n, NL) Lagrange columns,
    weights (p, n, NL) from `bary_weights`, widx (q,) point index per
    column -> (q, NL) evaluations, one fused program."""
    w = weights[widx]                               # (q, n, NL)
    return tree_sum_batched(_mul(values, w))


@jax.jit
def poly_divide_linear(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Exact division of p(X) by (X - z): returns q with p = q*(X-z) (+rem).

    q_i = sum_{j > i} a_j z^(j-i-1); computed as a suffix sum of a_j z^j
    rescaled by z^-(i+1).  Requires z != 0 (true for all transcript points).
    Output has the same length as input; the top coefficient is 0.
    """
    n = coeffs.shape[0]
    pw = powers(z, n)                       # z^0 .. z^(n-1)
    s = _mul(coeffs, pw)                    # a_j z^j
    suffix = scanmod.suffix_scan(
        lambda x, y: (_mul_free_add(x[0], y[0]),), _zero1, (s,),
        ks_max=_FIELD_KS_MAX)[0]
    # suffix[i] = sum_{j >= i} a_j z^j (lazy limbs; reduce now)
    suffix = limbs.partial_reduce(FR, suffix, rounds=3)
    tail = jnp.concatenate([suffix[1:], jnp.zeros((1, NL), jnp.int32)], axis=0)
    inv_pw = batch_inv(_mul(pw, jnp.broadcast_to(z[None], (n, NL))))  # z^-(i+1)
    return _mul(tail, inv_pw)


def _mul_free_add(a, b):
    """Associative add with interleaved cheap reduction (for scans)."""
    return limbs.partial_reduce(FR, a + b, rounds=2)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limbs.add(FR, a, b)


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limbs.sub(FR, a, b)


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limbs.mul(FR, a, b)


def rotate(values: jnp.ndarray, rot: int) -> jnp.ndarray:
    """Lagrange-basis rotation: value at row i of the rotated poly is the
    original value at row i+rot (halo2 `Rotation` semantics)."""
    return jnp.roll(values, -rot, axis=0)


@jax.jit
def poly_eval_many(polys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Batched evaluation: polys (p, n, NL), xs (p, NL) -> (p, NL).

    One fused program + one tiny fetch for the whole transcript-eval round
    (remote-tunnel fetches cost ~25 ms each; ~50 per-eval fetches would
    dominate proof latency).  Sequential map keeps peak memory at one
    power table.
    """

    def one(args):
        coeffs, x = args
        return poly_eval(coeffs, x)

    return jax.lax.map(one, (polys, xs))


def _pack_key_u32(digits: jnp.ndarray) -> tuple:
    """(n, 32) canonical 8-bit digits -> 8 uint32 words, least-significant
    first (for multi-pass stable sorting)."""
    words = []
    for w in range(8):
        d = digits[:, 4 * w: 4 * w + 4].astype(jnp.uint32)
        words.append(d[:, 0] | (d[:, 1] << 8) | (d[:, 2] << 16) | (d[:, 3] << 24))
    return tuple(words)


def _canon_digits_chunked(vals: jnp.ndarray, chunk: int = 1 << 18):
    """Eager chunked canonical digits: limbs.canonical's compare-subtract
    rounds inside one big jit held multi-GB transients at 2^20 rows
    alongside a large circuit's residency (OOM); chunking eagerly bounds
    the live set."""
    n = vals.shape[0]
    if n <= chunk:
        return _canon_jit(vals)
    outs = []
    for off in range(0, n, chunk):
        outs.append(_canon_jit(vals[off:off + chunk]))
        import numpy as _np2
        _np2.asarray(outs[-1][:1, :1])
    return jnp.concatenate(outs, axis=0)


@jax.jit
def _canon_jit(vals):
    return limbs.canonical(FR, vals)


def lookup_permute_device(a: jnp.ndarray, s: jnp.ndarray, usable: int,
                          max_bits: int | None = None):
    """Device-side halo2 lookup permutation (no host fetch of the columns).

    a, s: (n, NL) compressed input/table value columns.  Rows >= usable are
    ignored (replaced by the caller's blinding afterwards).  Returns
    (a_perm, s_perm, ok): rows [0, usable) satisfy the halo2 permuted-lookup
    shape — a_perm sorted; s_perm matches a_perm at each first occurrence;
    the other s_perm rows are the leftover multiset of s in sorted order.
    `ok` is False iff some input value is missing from the table.

    256-bit sort: stable LSW-first u32 argsort passes; first-occurrence
    matching via vectorized lexicographic binary search into the sorted
    table keys.  `max_bits` (a circuit hint: every value < 2^max_bits)
    shrinks the key to ceil(max_bits/32) words — a 16-bit range lookup
    sorts on ONE word instead of eight.
    """
    da = _canon_digits_chunked(a)
    ds = _canon_digits_chunked(s)
    return _lookup_permute_core(a, s, da, ds, usable, max_bits)


@partial(jax.jit, static_argnums=(4, 5))
def _lookup_permute_core(a: jnp.ndarray, s: jnp.ndarray,
                         digits_a: jnp.ndarray, digits_s: jnp.ndarray,
                         usable: int, max_bits: int | None = None):
    import numpy as _np
    n = a.shape[0]
    mask = jnp.arange(n) < usable
    # number of u32 key words; capped so masked rows (0xFFFFFFFF) still
    # sort above every real value
    nw = 8 if max_bits is None else max(1, -(-min(max_bits, 231) // 32))

    def sort_perm(vals, digits):
        words = _pack_key_u32(digits)[:nw]
        # rows >= usable get the max key so they sort to the top
        words = tuple(jnp.where(mask, w, jnp.uint32(0xFFFFFFFF)) for w in words)
        perm = jnp.arange(n)
        for w in words:  # LSW-first stable passes
            perm = perm[jnp.argsort(w[perm], stable=True)]
        return perm, words

    pa, wa = sort_perm(a, digits_a)
    ps, ws = sort_perm(s, digits_s)
    a_sorted = a[pa]
    s_sorted = s[ps]
    ka = jnp.stack([w[pa] for w in wa], 1)              # (n, nw) sorted keys
    ks = jnp.stack([w[ps] for w in ws], 1)

    prev = jnp.concatenate([jnp.full((1, nw), 2**32 - 1, ka.dtype), ka[:-1]], 0)
    first = jnp.any(ka != prev, axis=1) & mask

    def less_than(i_s, q):
        """ks[i_s] < q lexicographically (last word most significant)."""
        row = ks[jnp.clip(i_s, 0, n - 1)]
        lt = jnp.zeros(q.shape[0], bool)
        decided = jnp.zeros(q.shape[0], bool)
        for wi in range(nw - 1, -1, -1):
            lt_w = row[:, wi] < q[:, wi]
            gt_w = row[:, wi] > q[:, wi]
            lt = jnp.where(~decided & lt_w, True, lt)
            decided = decided | lt_w | gt_w
        return lt

    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, n, jnp.int32)
    for _ in range(int(_np.ceil(_np.log2(n + 1))) + 1):
        mid = (lo + hi) // 2
        active = lo < hi
        go_right = less_than(mid, ka) & active
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    pos = jnp.minimum(lo, n - 1)
    found = jnp.all(ks[pos] == ka, axis=1) & (pos < usable)
    ok = jnp.all(~first | found)

    # consume one sorted-s row per first occurrence (positions are distinct)
    consumed = jnp.zeros(n, jnp.int32).at[pos].max(first.astype(jnp.int32))
    keep = (consumed == 0) & mask
    slots = jnp.nonzero(~first & mask, size=n, fill_value=n - 1)[0]
    lidx = jnp.nonzero(keep, size=n, fill_value=n - 1)[0]
    s_perm = jnp.zeros_like(s_sorted).at[slots].set(s_sorted[lidx], mode="drop")
    s_perm = jnp.where(first[:, None], a_sorted, s_perm)
    return a_sorted, s_perm, ok
