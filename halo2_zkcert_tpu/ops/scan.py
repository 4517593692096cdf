"""Grid prefix scan: the TPU-shaped inclusive scan for expensive monoids.

`jax.lax.associative_scan` unrolls an odd-even recursion whose strided
slice/interleave glue costs ~5x the combines' HBM traffic AND whose
many-level trace blows XLA compile times on big-field monoids (a 2^19
group-law scan sat in backend_compile_and_load for >10 minutes; the eager
variant paid per-level dispatch instead).

This formulation reshapes (n) -> (R, C=128) rows:
  1. one `fori_loop` adds column j-1 into column j — C-1 iterations, each
     ONE R-wide combine (Pallas kernel for field/point monoids);
  2. the R row totals are scanned recursively (2-3 levels total);
  3. exclusive row offsets broadcast back over rows.
Work ~2n combines, sequential depth ~C per level, HLO size O(1) in n.

Operates on TUPLES of (n, ...) arrays so field elements (one array) and
curve points (three coordinate arrays) share the implementation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_C = 64
_ROLLED = 64          # kept for API compat; KS replaces the rolled base
# Row totals (and any scan of <= _KS_MAX rows) use a Kogge-Stone sweep:
# log2(n) full-width combines instead of a sequential chain.  The scan's
# latency is dispatch-bound on TPU (each step is a couple of Pallas
# kernels), so trading work n -> n log n on the SMALL totals array for
# sequential depth n -> log n is a large end-to-end win: a 2^17 scan is
# 63 sequential level-1 steps + ~11 KS steps (vs ~290 with the old
# recursive-sequential totals), at <3% extra combine work.
_KS_MAX = 16384


def _ks_scan(combine, identity1, xs: tuple, axis: int = 0) -> tuple:
    """Inclusive Kogge-Stone scan along `axis`: ceil(log2 n) wide steps.

    Each step combines the array with itself shifted by 2^s, the gap
    filled with identity rows (combine(identity, x) == x for monoids).
    Earlier-first operand order, so non-commutative monoids are safe.
    """
    n = xs[0].shape[axis]
    ident = identity1()
    shift = 1
    while shift < n:
        pads = tuple(jnp.broadcast_to(
            i.reshape((1,) * (axis + 1) + i.shape[1:]),
            c.shape[:axis] + (shift,) + c.shape[axis + 1:])
            for c, i in zip(xs, ident))
        heads = tuple(jax.lax.slice_in_dim(c, 0, n - shift, axis=axis)
                      for c in xs)
        sh = tuple(jnp.concatenate([p, h], axis=axis)
                   for p, h in zip(pads, heads))
        xs = combine(sh, xs)
        shift *= 2
    return xs


def prefix_scan(combine, identity1, xs: tuple, base: int = _ROLLED,
                ks_max: int | None = None) -> tuple:
    """Inclusive prefix scan of the monoid `combine` over leading axis.

    combine: tuple -> tuple -> tuple (elementwise-batched monoid op);
    identity1: () -> tuple of (1, ...) identity rows (same trailing dims);
    xs: tuple of (n, ...) arrays, n a power of two.  Non-commutative
    monoids are supported (operands are always ordered earlier-first).
    Trace-friendly: safe to call inside jit; eager calls compile a couple
    of small fori programs per distinct shape.

    ks_max: size threshold below which the log-depth Kogge-Stone sweep is
    used instead of the grid scan.  The KS sweep does n*log2(n) combines
    in log2(n) WIDE steps — for CHEAP monoids (field mul) the scan is
    dispatch-latency-bound, so KS wins well past the default; expensive
    monoids (curve adds) keep the ~2n-work grid.  Callers pick per monoid.
    """
    n = xs[0].shape[0]
    if n <= (ks_max if ks_max is not None else _KS_MAX):
        return _ks_scan(combine, identity1, xs, axis=0)
    if n & (n - 1):
        # The grid formulation returned WRONG prefixes on TPU for
        # non-power-of-two n (round-3 regression, docs/
        # DEBUG_R3_VERIFY_REGRESSION.md).  Guard at the PRIMITIVE so every
        # caller is protected: pad with the monoid identity (prefixes over
        # the real slice are unchanged) and slice the result.
        n2 = 1 << (n - 1).bit_length()
        ident = identity1()
        xs = tuple(jnp.concatenate(
            [c, jnp.broadcast_to(i, (n2 - n,) + c.shape[1:])], axis=0)
            for c, i in zip(xs, ident))
        out = prefix_scan(combine, identity1, xs, base, ks_max=ks_max)
        return tuple(c[:n] for c in out)
    C = _C if n // _C >= base else max(2, n // base)
    assert n % C == 0, n
    R = n // C
    grid = tuple(c.reshape((R, C) + c.shape[1:]) for c in xs)

    def body(j, g):
        prev = tuple(jax.lax.dynamic_slice_in_dim(c, j - 1, 1, axis=1)[:, 0]
                     for c in g)
        cur = tuple(jax.lax.dynamic_slice_in_dim(c, j, 1, axis=1)[:, 0]
                    for c in g)
        s = combine(prev, cur)
        return tuple(jax.lax.dynamic_update_slice_in_dim(
            c, v[:, None], j, axis=1) for c, v in zip(g, s))

    grid = jax.lax.fori_loop(1, C, body, grid)
    totals = tuple(c[:, -1] for c in grid)
    tot_scan = prefix_scan(combine, identity1, totals, base)
    off = tuple(jnp.concatenate([i, t[:-1]], axis=0)
                for i, t in zip(identity1(), tot_scan))
    off_b = tuple(jnp.broadcast_to(o[:, None], c.shape)
                  for o, c in zip(off, grid))
    # offsets are the EARLIER operand: combine(prefix-so-far, local) —
    # required for non-commutative monoids (e.g. affine-recurrence pairs)
    out = combine(off_b, grid)
    return tuple(c.reshape((n,) + c.shape[2:]) for c in out)


def suffix_scan(combine, identity1, xs: tuple, base: int = _ROLLED,
                ks_max: int | None = None) -> tuple:
    """Inclusive reverse (suffix) scan via reversal."""
    rev = tuple(c[::-1] for c in xs)
    return tuple(c[::-1] for c in prefix_scan(combine, identity1, rev, base,
                                              ks_max=ks_max))


def prefix_scan_batched_local(combine, identity1, xs: tuple,
                              base: int = _ROLLED, combine_first=None):
    """Batched grid scan WITHOUT the final row-offset pass.

    Returns (local, offsets, C): `local` (B, n, ...) holds prefixes local
    to each C-sized row; `offsets` (B, R, ...) the EXCLUSIVE row offsets;
    the true prefix at flat index i is combine(offsets[i // C], local[i]).
    Callers that only read the prefix at few positions (segment-boundary
    extraction) apply offsets at those positions instead of paying a full
    n-wide combine.

    `combine_first`, if given, replaces `combine` in the LEVEL-1 pass,
    where the right operand is always an ORIGINAL input element — MSM
    bucket scans use a cheaper mixed add there (table points are affine)."""
    B, n = xs[0].shape[0], xs[0].shape[1]
    # NOTE: unlike prefix_scan/prefix_scan_batched this variant is NOT
    # power-of-two-guarded: its only callers (ops/msm_fb bucket scans) run
    # non-power-of-two chunk widths that are TPU-verified end-to-end (k=17
    # proofs verify; the round-3 miscompile reproduced only on the
    # full-offset-pass variants).
    if n <= _KS_MAX:
        pref = prefix_scan_batched(combine, identity1, xs, base)
        ident = tuple(jnp.broadcast_to(c[None], (B, 1) + c.shape[1:])
                      for c in identity1())
        return pref, ident, n
    C = _C if n // _C >= base else max(2, n // base)
    assert n % C == 0, n
    R = n // C
    grid = tuple(c.reshape((B, R, C) + c.shape[2:]) for c in xs)
    comb1 = combine_first or combine

    def body(j, g):
        prev = tuple(jax.lax.dynamic_slice_in_dim(c, j - 1, 1,
                                                  axis=2)[:, :, 0]
                     for c in g)
        cur = tuple(jax.lax.dynamic_slice_in_dim(c, j, 1, axis=2)[:, :, 0]
                    for c in g)
        s = comb1(prev, cur)
        return tuple(jax.lax.dynamic_update_slice_in_dim(
            c, v[:, :, None], j, axis=2) for c, v in zip(g, s))

    grid = jax.lax.fori_loop(1, C, body, grid)
    totals = tuple(c[:, :, -1] for c in grid)            # (B, R, ...)
    tot_scan = prefix_scan_batched(combine, identity1, totals, base)
    ident_b = tuple(jnp.broadcast_to(c[None], (B,) + c.shape)
                    for c in identity1())                # (B, 1, ...)
    off = tuple(jnp.concatenate([i, t[:, :-1]], axis=1)
                for i, t in zip(ident_b, tot_scan))
    local = tuple(c.reshape((B, n) + c.shape[3:]) for c in grid)
    return local, off, C


def prefix_scan_batched(combine, identity1, xs: tuple,
                        base: int = _ROLLED,
                        ks_max: int | None = None) -> tuple:
    """Batched inclusive prefix scan: xs tuple of (B, n, ...) arrays,
    scanned independently along axis 1 in ONE program — B sequential
    chunk scans collapse into one (the per-step combine width grows B-fold,
    the sequential step count does not)."""
    B, n = xs[0].shape[0], xs[0].shape[1]
    if n <= (ks_max if ks_max is not None else _KS_MAX):
        return _ks_scan(combine, identity1, xs, axis=1)
    if n & (n - 1):
        # same power-of-two guard as prefix_scan (TPU grid-scan miscompile)
        n2 = 1 << (n - 1).bit_length()
        ident = identity1()
        xs = tuple(jnp.concatenate(
            [c, jnp.broadcast_to(i[None], (B, n2 - n) + c.shape[2:])],
            axis=1) for c, i in zip(xs, ident))
        out = prefix_scan_batched(combine, identity1, xs, base,
                                  ks_max=ks_max)
        return tuple(c[:, :n] for c in out)
    C = _C if n // _C >= base else max(2, n // base)
    assert n % C == 0, n
    R = n // C
    grid = tuple(c.reshape((B, R, C) + c.shape[2:]) for c in xs)

    def body(j, g):
        prev = tuple(jax.lax.dynamic_slice_in_dim(c, j - 1, 1,
                                                  axis=2)[:, :, 0]
                     for c in g)
        cur = tuple(jax.lax.dynamic_slice_in_dim(c, j, 1, axis=2)[:, :, 0]
                    for c in g)
        s = combine(prev, cur)
        return tuple(jax.lax.dynamic_update_slice_in_dim(
            c, v[:, :, None], j, axis=2) for c, v in zip(g, s))

    grid = jax.lax.fori_loop(1, C, body, grid)
    totals = tuple(c[:, :, -1] for c in grid)            # (B, R, ...)
    tot_scan = prefix_scan_batched(combine, identity1, totals, base)
    ident_b = tuple(jnp.broadcast_to(c[None], (B,) + c.shape)
                    for c in identity1())                # (B, 1, ...)
    off = tuple(jnp.concatenate([i, t[:, :-1]], axis=1)
                for i, t in zip(ident_b, tot_scan))
    off_b = tuple(jnp.broadcast_to(o[:, :, None], c.shape)
                  for o, c in zip(off, grid))
    out = combine(off_b, grid)   # earlier operand first (non-commutative safe)
    return tuple(c.reshape((B, n) + c.shape[3:]) for c in out)
