"""MXU-native NTT: four-step decomposition with int8 limb-plane matmuls.

The radix-2 NTT (ops/ntt.py) is VPU-bound: k stages of full-width field
muls (~17 muls + 34 add/subs per element at k=17).  TPUs put their FLOPs
in the MXU — so here the transform is re-expressed as MATRIX MULTIPLICATION
against constant DFT matrices (Bailey four-step), recursively:

    X[n2*k1 + k2] = sum_{j1} W1[j1,k1] * w^{j1*k2} * sum_{j2} x[j1 + n1*j2]
                    * W2[j2,k2]

* Each base-case DFT_r (r <= 128) is ONE s8 x s8 -> s32 MXU matmul.  Field
  elements are expanded into BALANCED base-256 limb planes (digits in
  [-128, 127], int8-exact); the constant matrix side additionally folds the
  limb-pair convolution into its rows:

      lhs[(l, k), (l2, j)] = balanced_limb[l - l2] ( W[k, j] )

  so ONE matmul contracts over BOTH the DFT sum (j) and the limb
  convolution — its int32 output rows are already the 66 product limbs
  of each output element.  |lhs|,|rhs| <= 128 so every partial product is
  <= 2^14 and the s32 accumulation is exact (sums <= 34*128*2^14 < 2^27).

* The balanced expansion of the DATA side is free: exact digits d in
  [0,255] become d - 128, and the constant offset 128*(1,...,1) is
  corrected by a precomputed per-row constant (128 * lhs row sums) — no
  recoding scan on device.

* Twiddles between levels are ordinary field muls (Pallas-fused on TPU);
  coset scales (g^j on input, g^-t on output) and the iNTT 1/n factor fold
  into the CONSTANT matrices and twiddles, so coset_ntt / coset_intt cost
  exactly the same as plain transforms.

* All constant tables (DFT matrices, correction rows, twiddles) are passed
  to the jitted program as ARGUMENTS via a record/replay tape — baking
  tens of MB of constants into the HLO explodes compile times on this
  1-core host (same policy as ops/ntt.py's twiddles).

Reference behavior: halo2_proofs `best_fft` semantics (axiom fork [dep]
Cargo.lock:1320) — same DFT, different factorization; only values and
commitments reach the transcript, so internal ordering is free.

Exactness: every step is integer-exact (s32 matmul accumulation, int32
carries, f32 folds below 2^24); tests/test_ntt.py asserts bit-equality vs
the radix-2 path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import refcrypto as rc
from . import limbs
from .field import FR

NL = limbs.NLIMBS          # 33 resident limbs
L2 = NL + 1                # 34 exact-digit planes of a resident value
L1 = 33                    # balanced-digit planes of a canonical value < p
LOUT = L1 + L2 - 1         # 66 product-limb planes
MAX_RADIX_LOG = 7          # base-case DFT size (contraction 34*128 = 4352)


def _balanced_digits(v: int, width: int) -> np.ndarray:
    """Canonical value -> balanced base-256 digits in [-128, 127]."""
    out = np.zeros(width, dtype=np.int64)
    for i in range(width):
        d = v & 0xFF
        v >>= 8
        if d > 127:
            d -= 256
            v += 1
        out[i] = d
    assert v == 0, "balanced recode overflow"
    return out


@lru_cache(maxsize=8)
def _offset_digits(width: int) -> np.ndarray:
    """Multiple of FR with `width` base-256 digits all in [2^28, 1.8e9]:
    added to the signed s32 product limbs so carry extraction sees
    nonnegative values (combined limbs are >= -34*128*2^14*128 > -2^28)."""
    p = FR.modulus
    lo, hi = 1 << 28, int(1.8e9)
    target_lo = sum(lo << (8 * i) for i in range(width))
    k = -(-target_lo // p) + 1
    v = p * k
    digits = np.zeros(width, dtype=np.int64)
    rem = v
    for i in range(width - 1, -1, -1):
        base = 1 << (8 * i)
        lo_rest = sum(lo << (8 * j) for j in range(i))
        hi_rest = sum(hi << (8 * j) for j in range(i))
        d = max(lo, min(hi, (rem - lo_rest) // base))
        while d * base + hi_rest < rem:
            d += 1
        digits[i] = d
        rem -= d * base
        assert lo <= d <= hi, (i, d)
    assert rem == 0
    return digits


@lru_cache(maxsize=96)
def _dft_consts(r_log: int, w: int, in_scale: int, out_scale: int,
                const: int):
    """Host-side constants for one base-case DFT_r (numpy):

    (lhs (LOUT*r, L2*r) int8, corr (LOUT, r) int32) with
      W[k, j] = const * out_scale^k * w^(j*k) * in_scale^j  mod p
      lhs[(l, k), (l2, j)] = bal(W[k, j])[l - l2]
      corr[l, k] = offset[l] + 128 * sum_cols lhs[(l, k), :]
    """
    r = 1 << r_log
    p = FR.modulus
    w_pows = [1] * r
    for j in range(1, r):
        w_pows[j] = w_pows[j - 1] * w % p
    in_pows = [1] * r
    for j in range(1, r):
        in_pows[j] = in_pows[j - 1] * in_scale % p
    bal = np.zeros((L1, r, r), dtype=np.int8)
    out_acc = const % p
    for k in range(r):
        wk = 1
        step = w_pows[k]
        for j in range(r):
            bal[:, k, j] = _balanced_digits(out_acc * wk % p
                                            * in_pows[j] % p, L1)
            wk = wk * step % p
        out_acc = out_acc * out_scale % p
    # conv-folded lhs: rows (l, k), cols (l2, j)
    lhs = np.zeros((LOUT, r, L2, r), dtype=np.int8)
    for l2 in range(L2):
        lhs[l2:l2 + L1, :, l2, :] = bal
    lhs = lhs.reshape(LOUT * r, L2 * r)
    row_sums = lhs.astype(np.int64).sum(axis=1).reshape(LOUT, r)
    corr = _offset_digits(LOUT)[:, None] + 128 * row_sums
    assert corr.min() >= 0 and corr.max() < 2**31, (corr.min(), corr.max())
    return lhs, corr.astype(np.int32)


@lru_cache(maxsize=96)
def _twiddle_table(n2: int, n1: int, w: int, scale: int) -> np.ndarray:
    """tw[k2, j1] = w^(j1*k2) * scale^j1 as resident limbs (n2, n1, NL)."""
    p = FR.modulus
    sp = [1] * n1
    for j1 in range(1, n1):
        sp[j1] = sp[j1 - 1] * scale % p
    vals = []
    for k2 in range(n2):
        base = pow(w, k2, p)
        acc = 1
        for j1 in range(n1):
            vals.append(acc * sp[j1] % p)
            acc = acc * base % p
    return limbs.ints_to_limbs(vals, NL).reshape(n2, n1, NL)


class _Tape:
    """Record/replay of constant tables so they reach the jitted program
    as arguments (one flat tuple), not baked HLO constants."""

    def __init__(self, replay=None):
        self.record: list = []
        self._replay = iter(replay) if replay is not None else None

    def dft(self, r_log, w, in_scale, out_scale, const):
        if self._replay is not None:
            return next(self._replay), next(self._replay)
        lhs, corr = _dft_consts(r_log, w, in_scale, out_scale, const)
        self.record += [lhs, corr]
        return lhs, corr

    def twiddle(self, n2, n1, w, scale):
        if self._replay is not None:
            return next(self._replay)
        t = _twiddle_table(n2, n1, w, scale)
        self.record.append(t)
        return t


def _dft_base(x: jnp.ndarray, r_log: int, consts) -> jnp.ndarray:
    """One MXU DFT_r over axis 0: x (r, ..., NL) resident -> same."""
    r = 1 << r_log
    lhs, corr = consts
    shape = x.shape
    m = int(np.prod(shape[1:-1])) if len(shape) > 2 else 1
    digits = limbs.exact_digits(FR, x)                    # (r, ..., L2)
    b = (digits.reshape(r, m, L2) - 128).astype(jnp.int8)
    rhs = jnp.transpose(b, (2, 0, 1)).reshape(L2 * r, m)  # (l2, j) rows
    out = jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # (LOUT*r, m)
    out = out.reshape(LOUT, r, m) + corr[:, :, None]
    planes = jnp.transpose(out, (1, 2, 0))                # (r, m, LOUT)
    res = limbs.partial_reduce(FR, planes)                # (r, m, NL)
    return res.reshape(shape)


def _transform(x: jnp.ndarray, k: int, w: int, in_scale: int,
               out_scale: int, const: int, tape: _Tape) -> jnp.ndarray:
    """X[t] = const * out_scale^t * sum_j x[j] w^(j t) in_scale^j, axis 0."""
    p = FR.modulus
    if k <= MAX_RADIX_LOG:
        return _dft_base(x, k, tape.dft(k, w % p, in_scale % p,
                                        out_scale % p, const % p))
    k1 = MAX_RADIX_LOG
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    rest = x.shape[1:]
    # j = j1 + n1*j2  ->  [j2, j1] grid
    xg = x.reshape((n2, n1) + rest)
    # step 1: DFT_{n2} over j2 (axis 0), input scale in_scale^{n1}
    y = _transform(xg, k2, pow(w, n1, p), pow(in_scale, n1, p), 1, 1, tape)
    # step 2: twiddle w^{j1 k2} * in_scale^{j1}  (k2 is now axis 0); the
    # out_scale^{k2} part of out_scale^t (t = n2 k1 + k2) rides along
    tw_w = w if out_scale % p == 1 else None
    if tw_w is None:
        tw = tape.twiddle(n2, n1, w, in_scale)
        # fold out_scale^{k2}: multiply row k2 by out_scale^{k2}
        # (handled host-side by a combined table)
        tw2 = tape.twiddle(1, n2, 1, out_scale)           # (1, n2, NL)
    else:
        tw = tape.twiddle(n2, n1, w, in_scale)
        tw2 = None
    tw = jnp.asarray(tw).reshape((n2, n1) + (1,) * (len(rest) - 1) + (NL,))
    y = limbs.mul(FR, y, tw)
    # step 3: DFT_{n1} over j1
    yt = jnp.swapaxes(y, 0, 1)                            # (n1, n2, ...)
    if tw2 is not None:
        yt = limbs.mul(
            FR, yt,
            jnp.asarray(tw2).reshape((1, n2) + (1,) * (len(rest) - 1)
                                     + (NL,)))
    z = _dft_base(yt, k1, tape.dft(k1, pow(w, n2, p), 1,
                                   pow(out_scale, n2, p), const % p))
    return z.reshape((1 << k,) + rest)


# ---------------------------------------------------------------------------
# public API (mirrors ops/ntt.py)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _transform_jit(x, k: int, w: int, in_scale: int, out_scale: int,
                   const: int, tables):
    return _transform(x, k, w, in_scale, out_scale, const,
                      _Tape(replay=tables))


@lru_cache(maxsize=64)
def _tables_for(k: int, w: int, in_scale: int, out_scale: int, const: int):
    """Record the flat table tuple for one transform signature (device)."""
    tape = _Tape()
    dummy = jnp.zeros((1 << k, 1, NL), jnp.int32)
    _shape_only_transform(dummy.shape, k, w, in_scale, out_scale, const,
                          tape)
    return tuple(jnp.asarray(t) for t in tape.record)


def _shape_only_transform(shape, k, w, in_scale, out_scale, const, tape):
    """Walk the recursion purely for its table-request sequence."""
    p = FR.modulus
    if k <= MAX_RADIX_LOG:
        tape.dft(k, w % p, in_scale % p, out_scale % p, const % p)
        return
    k1 = MAX_RADIX_LOG
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    _shape_only_transform(None, k2, pow(w, n1, p), pow(in_scale, n1, p),
                          1, 1, tape)
    tape.twiddle(n2, n1, w, in_scale)
    if out_scale % p != 1:
        tape.twiddle(1, n2, 1, out_scale)
    tape.dft(k1, pow(w, n2, p), 1, pow(out_scale, n2, p), const % p)


def _run(a: jnp.ndarray, k: int, w: int, in_scale: int, out_scale: int,
         const: int) -> jnp.ndarray:
    tables = _tables_for(k, w, in_scale, out_scale, const)
    return _transform_jit(a, k, w, in_scale, out_scale, const, tables)


def ntt(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Forward NTT over axis 0 of (2^k, ..., NL)."""
    return _run(a, k, rc.fr_root_of_unity(k), 1, 1, 1)


def intt(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse NTT (includes 1/N) — N^-1 folds into the top-level matrix."""
    p = rc.FR
    w_inv = pow(rc.fr_root_of_unity(k), p - 2, p)
    n_inv = pow(1 << k, p - 2, p)
    return _run(a, k, w_inv, 1, 1, n_inv)


def coset_ntt(a: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """Values of the poly `a` on the coset g*H: the g^j input scale folds
    into the constant matrices/twiddles (zero extra passes)."""
    return _run(a, k, rc.fr_root_of_unity(k), g % rc.FR, 1, 1)


def coset_intt(a: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """Coefficients from values on g*H: output scale g^-t, folded in."""
    p = rc.FR
    w_inv = pow(rc.fr_root_of_unity(k), p - 2, p)
    return _run(a, k, w_inv, 1, pow(g % p, p - 2, p),
                pow(1 << k, p - 2, p))
