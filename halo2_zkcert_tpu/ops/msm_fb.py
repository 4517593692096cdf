"""Fixed-base MSM: flattened Pippenger over precomputed window tables.

Reference behavior: every prover commitment is `best_multiexp` over the
FIXED SRS bases (halo2_proofs [dep] Cargo.lock:1320 — g / g_lagrange).
The variable-base design (ops/msm.py) pays for generality the commit path
does not need: per-window Horner doubling chains and a narrow 255-step
bucket-combine, both latency-bound on TPU.

TPU-first redesign exploiting fixed bases:

* one-time per SRS basis, build tables  T[w][i] = 2^(wbits * w) * G_i
  (16-bit windows on hardware) with batched Pallas doublings; tables are
  stored affine as uint8 canonical limbs (gather traffic /4);
* an MSM then has NO window structure at all: it is one flat bucket
  accumulation over the NWIN*N (digit, table-point) pairs — halving the
  scan work vs 8-bit windows and deleting the Horner doubling chain;
* bucket accumulation per chunk: argsort by digit, gather points, ONE wide
  inclusive `associative_scan` with the complete group law (Pallas-fused
  adds), segment-boundary differences -> 2^wbits bucket partials, added
  across chunks (wide batched adds);
* final  sum_d d * B_d  =  sum_{d>=1} S_d  where S is the reverse suffix
  scan of the buckets — one more wide scan plus a log-depth pairwise
  reduction tree.  No sequential narrow phase anywhere: every step is a
  wide batched op or log-depth.

Scalars with digit 0 land in bucket 0, which is discarded — so zero
padding rows (chunked callers) contribute nothing by construction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, limbs, msm

NL = limbs.NLIMBS

# flat (window, point) pairs processed per sort+scan program
CHUNK = 1 << 19


@partial(jax.jit, static_argnames=("wbits",))
def _digits(scalars: jnp.ndarray, wbits: int) -> jnp.ndarray:
    """(N, NL) Fr limbs -> (N, 256/wbits) int32 window digits."""
    d8 = msm.scalars_to_digits(scalars)                  # (N, 32) canonical
    if wbits == 8:
        return d8
    assert wbits == 16
    return d8[:, 0::2] + (d8[:, 1::2] << 8)


def build_tables(base_affine, wbits: int) -> jnp.ndarray:
    """(N, 2, NL) affine int32 -> (NWIN*N, 2, NL) uint8 window tables.

    T[w] = 2^(wbits*w) * base, computed with `wbits` batched complete
    doublings per window step (Pallas kernels on TPU) + one batched affine
    normalization each.
    """
    nwin = 256 // wbits
    n = base_affine.shape[0]
    tables = np.zeros((nwin, n, 2, NL), np.uint8)
    tables[0] = np.asarray(base_affine, dtype=np.int32).astype(np.uint8)
    P = curve.from_affine(jnp.asarray(base_affine, dtype=jnp.int32))

    @jax.jit
    def shift(P):
        for _ in range(wbits):
            P = curve.double(P)
        return P

    for w in range(1, nwin):
        P = shift(P)
        aff = np.asarray(curve.to_affine(P))             # canonical limbs
        tables[w] = aff.astype(np.uint8)
        P = curve.from_affine(jnp.asarray(aff))
    return jnp.asarray(tables.reshape(nwin * n, 2, NL))


@partial(jax.jit, static_argnames=("nchunks", "chunk", "wbits"))
def _bucket_partials(table_flat: jnp.ndarray, digits_flat: jnp.ndarray,
                     nchunks: int, chunk: int, wbits: int):
    """Accumulate all (digit, point) pairs into 2^wbits buckets.

    table_flat: (NWIN*N, 2, NL) uint8; digits_flat: (NWIN*N,) int32.
    Runs `nchunks` sort+scan rounds inside one jit (sequential, bounded
    memory); bucket partial sums are combined with wide adds.
    """
    nbuckets = 1 << wbits
    ident = curve.identity((nbuckets,))

    def one_chunk(c, buckets):
        dch = jax.lax.dynamic_slice_in_dim(digits_flat, c * chunk, chunk)
        order = jnp.argsort(dch)
        dsort = dch[order]
        pts_aff = jax.lax.dynamic_slice_in_dim(
            table_flat, c * chunk, chunk)[order].astype(jnp.int32)
        P = curve.from_affine(pts_aff)
        # rolled scan below the width threshold: the unrolled XLA add graphs
        # at small widths dominate compile time (see msm._SMALL_SCAN)
        prefix = msm._prefix_scan_points(P, chunk)
        ends = jnp.searchsorted(
            dsort, jnp.arange(nbuckets, dtype=dsort.dtype),
            side="right") - 1
        prev = jnp.concatenate([jnp.asarray([-1]), ends[:-1]])
        present = ends > prev
        at_end = tuple(c_[jnp.clip(ends, 0, chunk - 1)] for c_ in prefix)
        at_prev = tuple(c_[jnp.clip(prev, 0, chunk - 1)] for c_ in prefix)
        at_prev = curve._sel(prev >= 0, at_prev, ident)
        part = curve.add(at_end, curve.neg(at_prev))
        part = curve._sel(present, part, ident)
        return curve.add(buckets, part)

    return jax.lax.fori_loop(0, nchunks, one_chunk, ident)


@partial(jax.jit, static_argnames=("wbits",))
def _combine_buckets(buckets, wbits: int):
    """sum_{d=1}^{2^wbits - 1} d * B_d  via suffix scan + reduction tree."""
    rev = tuple(c[::-1] for c in buckets)
    suffix = tuple(c[::-1] for c in
                   msm._prefix_scan_points(rev, 1 << wbits))
    acc = tuple(c[1:] for c in suffix)                   # drop bucket 0
    m = (1 << wbits) - 1
    pad = (1 << wbits) - m                               # back to a power of 2
    ident = curve.identity((pad,))
    acc = tuple(jnp.concatenate([a, i], axis=0) for a, i in zip(acc, ident))
    width = 1 << wbits
    while width > 1:
        width //= 2
        acc = curve.add(tuple(c[:width] for c in acc),
                        tuple(c[width:] for c in acc))
    return tuple(c[0] for c in acc)


class FixedBaseMsm:
    """Per-basis precomputed tables + the flat-Pippenger evaluator."""

    def __init__(self, base_affine, wbits: int = 16):
        assert wbits in (8, 16)
        self.n = base_affine.shape[0]
        self.wbits = wbits
        self.nwin = 256 // wbits
        self.table_flat = build_tables(base_affine, wbits)

    def __call__(self, scalars: jnp.ndarray):
        """scalars (N, NL) Fr limbs -> homogeneous projective point
        (tuple of (NL,) arrays, curve.py conventions)."""
        assert scalars.shape[0] == self.n, (scalars.shape, self.n)
        digits = _digits(scalars, self.wbits)            # (N, NWIN)
        # pair j = w * N + i  <->  table_flat row (w * N + i)
        digits_flat = digits.T.reshape(-1)               # (NWIN*N,)
        total = digits_flat.shape[0]
        chunk = min(CHUNK, total)
        assert total % chunk == 0, (total, chunk)
        buckets = _bucket_partials(self.table_flat, digits_flat,
                                   total // chunk, chunk, self.wbits)
        return _combine_buckets(buckets, self.wbits)

    def msm_many(self, cols) -> jnp.ndarray:
        """(m, N, NL) -> (m, 3, NL) projective accumulators, sequential
        per column (each column saturates the chip)."""
        outs = []
        for i in range(cols.shape[0]):
            outs.append(jnp.stack(self(cols[i])))
            np.asarray(outs[-1][0, :1])   # host fetch: bound in-flight mem
        return jnp.stack(outs)
