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
* bucket accumulation per chunk: argsort by digit, gather points, one
  work-efficient odd-even prefix scan with the complete group law
  (Pallas-fused adds), segment-boundary differences -> 2^wbits bucket
  partials, added across chunks (wide batched adds);
* final  sum_d d * B_d  =  sum_{d>=1} S_d  where S is the reverse suffix
  scan of the buckets — one more scan plus a log-depth reduction tree.

Compile-time discipline (this host compiles XLA at ~1 core): the scans run
EAGERLY level by level — each level is one fused Pallas add at a power-of-2
width, a small program reused across chunks/columns/proofs and persisted in
the compile cache.  A single monolithic `associative_scan` jit at 2^19 sat
in `backend_compile_and_load` for >10 minutes; this formulation compiles in
seconds and pays only ~2 dispatches per level at runtime.

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

# flat (window, point) pairs processed per sort+scan round
CHUNK = 1 << 19


# Digit width: scalars are RESIDENT Fr values (< 2^259 < 2^272, any
# representative of the residue class).  Because G1 has prime order r,
# (v + k*r) * G == v * G — so the MSM needs NO mod-r canonicalization
# (the reference reduces because CPU Pippenger wants minimal windows
# [dep]; here the 6-round compare-subtract canonicalization cost more
# than the extra 2 windows).  Plain integer carrying (exact_digits) gives
# 34 base-256 digits; windows cover 272 bits.
_DIGIT_BYTES = 34


def _nwin(wbits: int) -> int:
    return _DIGIT_BYTES * 8 // wbits


@partial(jax.jit, static_argnames=("wbits",))
def _digits(scalars: jnp.ndarray, wbits: int) -> jnp.ndarray:
    """(N, NL) resident Fr limbs -> (N, 272/wbits) int32 window digits."""
    from .field import FR as FRS
    d8 = limbs.exact_digits(FRS, scalars)                # (N, 34) bytes
    if wbits == 8:
        return d8
    assert wbits == 16
    return d8[:, 0::2] + (d8[:, 1::2] << 8)


def build_tables(base_affine, wbits: int) -> jnp.ndarray:
    """(N, 2, NL) affine int32 -> (NWIN*N, 2, NL) uint8 window tables.

    T[w] = 2^(wbits*w) * base: `wbits` batched complete doublings per
    window step (Pallas kernels on TPU), windows kept projective, ONE
    batched affine normalization per chunk — per-window `to_affine` paid
    an eager 2^17-wide inversion scan 15 times (~14 s each).  Base points
    are processed in 2^17-point chunks: at k>=20 all NWIN windows of the
    whole basis held projective at once (~7 GB+) OOMed 16 GB HBM.
    Window count covers 272-bit (uncanonicalized resident) scalars."""
    nwin = _nwin(wbits)
    n = base_affine.shape[0]
    CH = min(n, 1 << 16)
    assert n % CH == 0, (n, CH)

    @jax.jit
    def shift(P):
        for _ in range(wbits):
            P = curve.double(P)
        return P

    base_np = np.asarray(base_affine)
    out = np.zeros((nwin, n, 2, NL), dtype=np.uint8)
    for off in range(0, n, CH):
        P = curve.from_affine(jnp.asarray(base_np[off:off + CH],
                                          dtype=jnp.int32))
        windows = [P]
        for w in range(1, nwin):
            P = shift(P)
            windows.append(P)
        stacked = tuple(jnp.concatenate([wv[c] for wv in windows], axis=0)
                        for c in range(3))
        aff = np.asarray(curve.to_affine(stacked))       # canonical limbs
        out[:, off:off + CH] = aff.reshape(nwin, CH, 2, NL).astype(np.uint8)
    return jnp.asarray(out.reshape(nwin * n, 2, NL))


def load_or_build_tables(base_affine, wbits: int,
                         cache_path: str | None) -> jnp.ndarray:
    """Disk-cached table build (files live next to the SRS cache, mirroring
    the reference's PARAMS_DIR artifact pattern, SURVEY.md §5)."""
    import os
    if cache_path and os.path.exists(cache_path):
        return jnp.asarray(np.load(cache_path))
    t = build_tables(base_affine, wbits)
    if cache_path:
        np.save(cache_path, np.asarray(t))
    return t


def scan_points(P):
    """Inclusive prefix scan under the group law (grid scan, ops/scan.py:
    one Pallas add per fori step, tiny HLO — the monolithic
    `associative_scan` compiled >10 min at 2^19 and the eager odd-even
    variant paid 5x the adds' HBM traffic in strided glue)."""
    from . import scan as scanmod
    return scanmod.prefix_scan(curve.add, lambda: curve.identity((1,)), P)


def _extract_buckets(prefix, dsort, wbits: int):
    """Segment-boundary differences of the sorted prefix -> bucket sums."""
    nbuckets = 1 << wbits
    n = dsort.shape[0]
    ident = curve.identity((nbuckets,))
    ends = jnp.searchsorted(
        dsort, jnp.arange(nbuckets, dtype=dsort.dtype), side="right") - 1
    prev = jnp.concatenate([jnp.asarray([-1]), ends[:-1]])
    present = ends > prev
    at_end = tuple(c[jnp.clip(ends, 0, n - 1)] for c in prefix)
    at_prev = tuple(c[jnp.clip(prev, 0, n - 1)] for c in prefix)
    at_prev = curve._sel(prev >= 0, at_prev, ident)
    part = curve.add(at_end, curve.neg(at_prev))
    return curve._sel(present, part, ident)


@partial(jax.jit, static_argnames=("chunk", "wbits"))
def _chunk_buckets(table_flat, digits_flat, off, chunk: int, wbits: int):
    """One sort+scan+extract round over `chunk` flat pairs (one program)."""
    dch = jax.lax.dynamic_slice_in_dim(digits_flat, off, chunk)
    order = jnp.argsort(dch)
    pts = table_flat[off + order].astype(jnp.int32)
    # table points are never the identity: skip from_affine's is_zero
    # exact-carry pass over the whole chunk
    x, y = pts[..., 0, :], pts[..., 1, :]
    one = jnp.zeros_like(x).at[..., 0].set(1)
    prefix = scan_points((x, y, one))
    return _extract_buckets(prefix, dch[order], wbits)


def _scan_local(pts_sorted):
    """Level-1 local scan of sorted affine points: (R_, chunk, 2, NL) ->
    (local, off, C) with the prefix_scan_batched_local contract.

    On TPU the level-1 pass runs as ONE fused Pallas kernel
    (pallas_limbs.fused_scan_madd): each row tile's C points sit in VMEM
    and the running accumulator never round-trips HBM — vs ~C sequential
    add dispatches with per-step slice glue.  Only the small row-totals
    scan still uses the generic grid machinery."""
    from . import scan as scanmod
    from .curve import _pallas_wanted
    from .field import FQ
    R_, chunk = pts_sorted.shape[0], pts_sorted.shape[1]
    from .pallas_limbs import SCAN_C
    if not (_pallas_wanted() and chunk % SCAN_C == 0
            and chunk // SCAN_C >= 2):
        x, y = pts_sorted[..., 0, :], pts_sorted[..., 1, :]
        one = jnp.zeros_like(x).at[..., 0].set(1)
        return scanmod.prefix_scan_batched_local(
            curve.add, lambda: curve.identity((1,)), (x, y, one),
            combine_first=lambda p, c: curve.add_mixed(p, (c[0], c[1])))
    from . import pallas_limbs
    C = SCAN_C
    R = chunk // C
    xa = pts_sorted[..., 0, :].reshape(R_ * R, C, NL)
    ya = pts_sorted[..., 1, :].reshape(R_ * R, C, NL)
    X, Y, Z = pallas_limbs.fused_scan_madd(xa, ya, FQ.modulus)
    local = tuple(c.reshape(R_, chunk, NL) for c in (X, Y, Z))
    totals = tuple(c.reshape(R_, R, C, NL)[:, :, -1] for c in local)
    tot_scan = scanmod.prefix_scan_batched(
        curve.add, lambda: curve.identity((1,)), totals)
    ident_b = tuple(jnp.broadcast_to(c[None], (R_,) + c.shape)
                    for c in curve.identity((1,)))
    off = tuple(jnp.concatenate([i, t[:, :-1]], axis=1)
                for i, t in zip(ident_b, tot_scan))
    return local, off, C


def _extract_buckets_batched(local, off, C, dsort, wbits: int):
    """Vectorized segment-boundary extraction + cross-chunk reduction.

    local (R_, chunk, NL)x3 / off (R_, nrows, NL)x3 from
    `prefix_scan_batched_local`; dsort (R_, chunk) sorted digits.  Returns
    (R_, 2^wbits, NL)x3 bucket partials — the caller reshapes/reduces the
    leading axis.  Replaces the per-chunk Python loop (R_ separate
    subgraphs with sequential partial adds) with ONE batched graph: a
    vmapped searchsorted, two batched boundary gathers, and batched
    selects; measured at ~3x on the extraction stage (it was ~40% of a
    2-col commit)."""
    R_, chunk = dsort.shape
    nbuckets = 1 << wbits
    keys = jnp.arange(nbuckets, dtype=dsort.dtype)
    ends = jax.vmap(
        lambda ds: jnp.searchsorted(ds, keys, side="right"))(dsort) - 1
    prev = jnp.concatenate(
        [jnp.full((R_, 1), -1, ends.dtype), ends[:, :-1]], axis=1)
    present = ends > prev                                 # (R_, nb)

    # gathers are per-ROW latency-bound (~36 ns/row on v5e regardless of
    # width): fuse the three coordinate planes into ONE row per gather
    cat_local = jnp.concatenate(local, axis=-1)           # (R_, chunk, 3NL)
    cat_off = jnp.concatenate(off, axis=-1)

    def prefix_at(idx):
        safe = jnp.clip(idx, 0, chunk - 1)[..., None]     # (R_, nb, 1)
        lc = jnp.take_along_axis(cat_local, safe, axis=1)
        oc = jnp.take_along_axis(cat_off, safe // C, axis=1)
        l = tuple(lc[..., i * NL:(i + 1) * NL] for i in range(3))
        o = tuple(oc[..., i * NL:(i + 1) * NL] for i in range(3))
        return curve.add(o, l)

    ident = curve.identity((R_, nbuckets))
    at_end = prefix_at(ends)
    at_prev = curve._sel(prev >= 0, prefix_at(prev), ident)
    part = curve.add(at_end, curve.neg(at_prev))
    return curve._sel(present, part, ident)


def _tree_reduce_chunks(part, G: int, Bc: int):
    """(G*Bc, nb, NL)x3 partials -> (G, nb, NL)x3 via log-depth adds."""
    acc = tuple(c.reshape(G, Bc, *c.shape[1:]) for c in part)
    m = Bc
    while m > 1:
        half = m // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half:2 * half] for c in acc)
        s = curve.add(lo, hi)
        if m % 2:
            s = tuple(jnp.concatenate([a, c[:, -1:]], axis=1)
                      for a, c in zip(s, acc))
        acc = s
        m = half + (m % 2)
    return tuple(c[:, 0] for c in acc)


@partial(jax.jit, static_argnames=("wbits",))
def _buckets_all(table_flat, digits_flat, wbits: int):
    """ALL chunks in one program: batched sort + ONE batched prefix scan
    (B sequential chunk scans collapse into one — the scan's fori step
    count dominated commit latency) + batched extraction + log-tree
    cross-chunk reduction."""
    from . import scan as scanmod
    total = digits_flat.shape[0]
    B = max(total // CHUNK, 1)
    chunk = total // B
    d = digits_flat.reshape(B, chunk)
    order = jnp.argsort(d, axis=1)                       # (B, chunk)
    rows = jnp.arange(total, dtype=jnp.int32).reshape(B, chunk)
    pts = table_flat[jnp.take_along_axis(rows, order, axis=1)] \
        .astype(jnp.int32)                               # (B, chunk, 2, NL)
    dsort = jnp.take_along_axis(d, order, axis=1)
    # table points are never the identity (SRS powers of tau), so
    # from_affine's is_zero scan is skipped throughout (_scan_local)
    local, off, C = _scan_local(pts)
    part = _extract_buckets_batched(local, off, C, dsort, wbits)
    return tuple(c[0] for c in _tree_reduce_chunks(part, 1, B))


@partial(jax.jit, static_argnames=("wbits",))
def _combine_buckets(buckets, wbits: int):
    """sum_{d=1}^{2^wbits-1} d * B_d  =  sum_{d>=1} suffix_d."""
    rev = tuple(c[::-1] for c in buckets)
    suffix = tuple(c[::-1] for c in scan_points(rev))
    acc = tuple(c[1:] for c in suffix)                   # drop bucket 0
    ident = curve.identity((1,))
    acc = tuple(jnp.concatenate([a, i], axis=0) for a, i in zip(acc, ident))
    width = 1 << wbits
    while width > 1:
        width //= 2
        acc = curve.add(tuple(c[:width] for c in acc),
                        tuple(c[width:] for c in acc))
    return tuple(c[0] for c in acc)


@jax.jit
def _add_buckets(a, b):
    return curve.add(a, b)


# Columns per batched commit program: the sort/scan/extract fixed costs
# amortize across G columns (zero-padded groups keep ONE compiled shape).
# G=2 keeps the gather+scan working set ~5 GB on 16 GB HBM.
GROUP = 2
# Bounded-value columns carry ~NWIN-times less data, so a bigger group fits.
GROUP_SMALL = 4


@partial(jax.jit, static_argnames=("wbits",))
def _buckets_cols(table_flat, digits_cols, rows_cols, wbits: int):
    """Per-column bucket sums for a GROUP of columns in one program.

    digits_cols: (G, T) window digits per column; rows_cols (G, T) or
    (1, T) the table index each flat pair multiplies (broadcast over G for
    the standard window-major layout).  Returns tuple of (G, 2^wbits, NL)
    bucket arrays."""
    from . import scan as scanmod
    G, total = digits_cols.shape
    Bc = max(total // CHUNK, 1)
    chunk = total // Bc
    d = digits_cols.reshape(G * Bc, chunk)
    order = jnp.argsort(d, axis=1)
    rows = jnp.broadcast_to(rows_cols, (G, total)).reshape(G * Bc, chunk)
    pts = table_flat[jnp.take_along_axis(rows, order, axis=1)] \
        .astype(jnp.int32)
    dsort = jnp.take_along_axis(d, order, axis=1)
    local, off, C = _scan_local(pts)
    part = _extract_buckets_batched(local, off, C, dsort, wbits)
    return _tree_reduce_chunks(part, G, Bc)              # (G, nb, NL) each


@partial(jax.jit, static_argnames=("wbits",))
def _combine_buckets_cols(buckets, wbits: int):
    """Batched sum_d d*B_d per column: (G, 2^wbits, NL) -> (G, 3, NL)."""
    from . import scan as scanmod
    rev = tuple(c[:, ::-1] for c in buckets)
    suffix = tuple(c[:, ::-1] for c in scanmod.prefix_scan_batched(
        curve.add, lambda: curve.identity((1,)), rev))
    G = buckets[0].shape[0]
    acc = tuple(c[:, 1:] for c in suffix)                # drop bucket 0
    ident = curve.identity((G, 1))
    acc = tuple(jnp.concatenate([a, i], axis=1) for a, i in zip(acc, ident))
    width = 1 << wbits
    while width > 1:
        width //= 2
        acc = curve.add(tuple(c[:, :width] for c in acc),
                        tuple(c[:, width:] for c in acc))
    return jnp.stack([c[:, 0] for c in acc], axis=1)     # (G, 3, NL)


class FixedBaseMsm:
    """Per-basis precomputed tables + the flat-Pippenger evaluator."""

    def __init__(self, base_affine, wbits: int = 16,
                 cache_path: str | None = None):
        assert wbits in (8, 16)
        self.n = base_affine.shape[0]
        self.wbits = wbits
        self.nwin = _nwin(wbits)
        self.table_flat = load_or_build_tables(base_affine, wbits,
                                               cache_path)

    def __call__(self, scalars: jnp.ndarray):
        """scalars (N, NL) Fr limbs -> homogeneous projective point
        (tuple of (NL,) arrays, curve.py conventions)."""
        assert scalars.shape[0] == self.n, (scalars.shape, self.n)
        if self.nwin * self.n > self.STREAM_PAIRS:
            res = self._msm_many_streamed(scalars[None])
            return tuple(res[0, c] for c in range(3))
        digits = _digits(scalars, self.wbits)            # (N, NWIN)
        assert digits.shape[1] * self.n == self.table_flat.shape[0], \
            "window tables do not match digit count (stale cache?)"
        digits_flat = digits.T.reshape(-1)               # (NWIN*N,)
        buckets = _buckets_all(self.table_flat, digits_flat, self.wbits)
        return _combine_buckets(buckets, self.wbits)

    def _rows_full(self) -> jnp.ndarray:
        """(1, NWIN*N) window-major table indices for full-width scalars."""
        return (jnp.arange(self.nwin * self.n, dtype=jnp.int32))[None]

    # Above this many flat (window, point) pairs per column, the all-chunks
    # batch program's gather working set exceeds HBM (k=17 is 2.2M pairs
    # ~1.2 GB live; k>=19 aggregation domains would blow past 16 GB), so
    # big columns stream CHUNK-sized slices through one compiled program.
    STREAM_PAIRS = 1 << 23

    def msm_many(self, cols, group: int = GROUP) -> jnp.ndarray:
        """(m, N, NL) -> (m, 3, NL) projective accumulators, processed in
        `group`-sized column batches (zero-padded -> one compiled shape; the
        sort/scan fixed costs amortize across the group)."""
        if self.nwin * self.n > self.STREAM_PAIRS:
            return self._msm_many_streamed(cols)
        m = cols.shape[0]
        outs = []
        base = 0
        rows = self._rows_full()
        while base < m:
            g = min(group, m - base)
            if g < group:
                # remainder: the single-column program — zero-padding a
                # group would pay a full phantom column of scan work
                outs.append(jnp.stack(self(cols[base]))[None])
                np.asarray(outs[-1][0, 0, :1])
                base += 1
                continue
            grp = cols[base:base + group]
            d = _digits(grp.reshape(group * self.n, NL), self.wbits)
            d = d.reshape(group, self.n, self.nwin) \
                .transpose(0, 2, 1).reshape(group, -1)   # window-major
            buckets = _buckets_cols(self.table_flat, d, rows, self.wbits)
            res = _combine_buckets_cols(buckets, self.wbits)  # (G, 3, NL)
            outs.append(res)
            np.asarray(outs[-1][0, 0, :1])  # host fetch: bound in-flight
            base += group
        return jnp.concatenate(outs, axis=0)

    def _msm_many_streamed(self, cols) -> jnp.ndarray:
        """Large-domain commit path: per column, slice the flat pair stream
        into CHUNK-sized rounds through ONE compiled sort+scan program
        (`_chunk_buckets`, dynamic offset), accumulating bucket partials —
        live memory stays O(chunk + 2^wbits) regardless of n.  The chunk
        halves at 2^20+ bases: big circuits run these commits next to
        10+ GB of resident columns."""
        m = cols.shape[0]
        chunk = CHUNK // 2 if self.n >= (1 << 20) else CHUNK
        outs = []
        for j in range(m):
            digits = _digits(cols[j], self.wbits)
            digits_flat = digits.T.reshape(-1)
            total = digits_flat.shape[0]
            assert total % chunk == 0, (total, chunk)
            buckets = None
            for off in range(0, total, chunk):
                part = _chunk_buckets(self.table_flat, digits_flat,
                                      off, chunk, self.wbits)
                buckets = part if buckets is None \
                    else _add_buckets(buckets, part)
                np.asarray(buckets[0][:1, :1])   # bound in-flight memory
            acc = _combine_buckets(buckets, self.wbits)
            outs.append(jnp.stack(acc)[None])
        return jnp.concatenate(outs, axis=0)

    def _small_layout(self, value_windows: int, blind_lo: int):
        """Static (rows, pad) layout for bounded-value columns: every row
        contributes its low `value_windows` windows; rows >= blind_lo
        (the blinding tail) additionally contribute the remaining windows.
        Padding pairs point at table row 0 with digit 0 (bucket 0 is
        discarded, so they are free)."""
        n, nwin = self.n, self.nwin
        tail = n - blind_lo
        main = [w * n + np.arange(n, dtype=np.int64)
                for w in range(value_windows)]
        blind = [w * n + np.arange(blind_lo, n, dtype=np.int64)
                 for w in range(value_windows, nwin)]
        rows = np.concatenate(main + blind)
        total = rows.shape[0]
        padded = -(-total // 128) * 128
        rows = np.pad(rows, (0, padded - total))
        return jnp.asarray(rows, jnp.int32)[None], total

    def msm_many_bounded(self, cols, value_bits: int,
                         blind_lo: int) -> jnp.ndarray:
        """(m, N, NL) -> (m, 3, NL) for columns whose rows < blind_lo are
        < 2^value_bits (witness columns with known small ranges: range-
        checked tapes, lookup tables, byte/bit columns).  Only
        ceil(value_bits/wbits) windows of bucket work per row instead of
        NWIN — e.g. 17x less scan work for a 16-bit column at wbits=16.
        Blinding rows (>= blind_lo) keep full windows."""
        vw = max(1, -(-value_bits // self.wbits))
        if vw >= self.nwin:
            return self.msm_many(cols)
        m = cols.shape[0]
        rows, total = self._small_layout(vw, blind_lo)
        padded = rows.shape[1]
        outs = []
        # balanced groups: a single bounded column used to be padded to a
        # 4-wide program (3 phantom columns of scan work); group counts
        # are per-circuit constants so the shapes stay stable.  At 2^20+
        # rows the grouped program's gather+scan transients (~4 GB) OOM
        # next to a big circuit's residency — single-column programs there.
        gs = 1 if self.n >= (1 << 20) else GROUP_SMALL
        n_prog = -(-m // gs)
        per = -(-m // n_prog)
        for base in range(0, m, per):
            g = min(per, m - base)
            grp = cols[base:base + g]
            if g < per:
                grp = jnp.concatenate(
                    [grp, jnp.zeros((per - g,) + grp.shape[1:],
                                    grp.dtype)], axis=0)
            d = _digits(grp.reshape(per * self.n, NL), self.wbits)
            d = d.reshape(per, self.n, self.nwin)
            dmain = d[:, :, :vw].transpose(0, 2, 1) \
                .reshape(per, vw * self.n)
            dblind = d[:, blind_lo:, vw:].transpose(0, 2, 1) \
                .reshape(per, -1)
            dflat = jnp.concatenate([dmain, dblind], axis=1)
            dflat = jnp.pad(dflat, ((0, 0), (0, padded - total)))
            buckets = _buckets_cols(self.table_flat, dflat, rows, self.wbits)
            res = _combine_buckets_cols(buckets, self.wbits)
            outs.append(res[:g])
            np.asarray(outs[-1][0, 0, :1])  # bound in-flight memory
        return jnp.concatenate(outs, axis=0)
