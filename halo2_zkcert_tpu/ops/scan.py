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

_C = 128
_ROLLED = 64          # below this, a rolled lax.scan is cheaper


def prefix_scan(combine, identity1, xs: tuple, base: int = _ROLLED) -> tuple:
    """Inclusive prefix scan of the monoid `combine` over leading axis.

    combine: tuple -> tuple -> tuple (elementwise-batched monoid op);
    identity1: () -> tuple of (1, ...) identity rows (same trailing dims);
    xs: tuple of (n, ...) arrays, n a power of two.
    Trace-friendly: safe to call inside jit; eager calls compile a couple
    of small fori programs per distinct shape.
    """
    n = xs[0].shape[0]
    if n <= base:
        def body(carry, elem):
            new = combine(carry, elem)
            return new, new

        init = tuple(c[0] for c in identity1())
        _, pref = jax.lax.scan(body, init, xs)
        return pref
    assert n % _C == 0, n
    R = n // _C
    grid = tuple(c.reshape((R, _C) + c.shape[1:]) for c in xs)

    def body(j, g):
        prev = tuple(jax.lax.dynamic_slice_in_dim(c, j - 1, 1, axis=1)[:, 0]
                     for c in g)
        cur = tuple(jax.lax.dynamic_slice_in_dim(c, j, 1, axis=1)[:, 0]
                    for c in g)
        s = combine(prev, cur)
        return tuple(jax.lax.dynamic_update_slice_in_dim(
            c, v[:, None], j, axis=1) for c, v in zip(g, s))

    grid = jax.lax.fori_loop(1, _C, body, grid)
    totals = tuple(c[:, -1] for c in grid)
    tot_scan = prefix_scan(combine, identity1, totals, base)
    off = tuple(jnp.concatenate([i, t[:-1]], axis=0)
                for i, t in zip(identity1(), tot_scan))
    off_b = tuple(jnp.broadcast_to(o[:, None], c.shape)
                  for o, c in zip(off, grid))
    out = combine(grid, off_b)
    return tuple(c.reshape((n,) + c.shape[2:]) for c in out)


def suffix_scan(combine, identity1, xs: tuple, base: int = _ROLLED) -> tuple:
    """Inclusive reverse (suffix) scan via reversal."""
    rev = tuple(c[::-1] for c in xs)
    return tuple(c[::-1] for c in prefix_scan(combine, identity1, rev, base))
